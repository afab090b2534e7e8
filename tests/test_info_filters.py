"""--extract-if-info / --exclude-if-info / --require-info /
--require-no-info (ref CmpExpr parsing 2.0/plink2_cmdline.cc:3869,
LoadPvar INFO filter 2.0/plink2_pvar.cc:742-1075).

Numeric expressions diff byte-identically against the oracle.  STRING
equality is unit-tested against the documented contract instead: the
reference build never initializes InfoExpr.args.s.slen
(InfoFilterSecondPass, plink2_pvar.cc:902 sets str_value but not slen),
so its string comparisons read uninitialized memory and never match."""

import os
import shutil
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("infof")
    subprocess.run(
        [ORACLE, "--dummy", "30", "60", "0.05", "--seed", "2", "--out", "b"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(1)
    lines = (d / "b.pvar").read_text().splitlines()
    out = ['##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
           '##INFO=<ID=VT,Number=1,Type=String,Description="t">',
           '##INFO=<ID=PRX,Number=0,Type=Flag,Description="f">',
           lines[0] + "\tINFO"]
    for l in lines[1:]:
        parts = []
        if rng.random() < 0.8:
            parts.append(f"DP={int(rng.integers(0, 2000))}")
        if rng.random() < 0.7:
            parts.append("VT=" + ("SNP" if rng.random() < 0.5 else "INDEL"))
        if rng.random() < 0.3:
            parts.append("PRX")
        out.append(l + "\t" + (";".join(parts) if parts else "."))
    (d / "bi.pvar").write_text("\n".join(out) + "\n")
    shutil.copy(d / "b.pgen", d / "bi.pgen")
    shutil.copy(d / "b.psam", d / "bi.psam")
    return d


def _run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args + ["--silent"]) == 0
    finally:
        os.chdir(old)


@pytest.mark.parametrize("flag,expr,tag", [
    ("--extract-if-info", "DP>=1000", "ge"),
    ("--extract-if-info", "100<DP<1500", "chain"),
    ("--extract-if-info", "(DP<200)||(DP>1800)", "or"),
    ("--extract-if-info", "DP!=100", "ne"),
    ("--exclude-if-info", "DP>500", "xgt"),
])
def test_numeric_exprs_vs_oracle(panel, flag, expr, tag):
    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "bi", flag, expr, "--write-snplist",
         "--out", f"o{tag}"],
        cwd=d, check=True, capture_output=True,
    )
    _run_tpu(["--pfile", "bi", flag, expr, "--write-snplist",
              "--out", f"t{tag}"], str(d))
    assert (d / f"o{tag}.snplist").read_text() == \
        (d / f"t{tag}.snplist").read_text()


@pytest.mark.parametrize("flag,keys,tag", [
    ("--require-info", ["DP"], "rq"),
    ("--require-no-info", ["PRX"], "rn"),
    ("--require-info", ["DP", "VT"], "rq2"),
])
def test_require_info_vs_oracle(panel, flag, keys, tag):
    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "bi", flag] + keys
        + ["--write-snplist", "--out", f"o{tag}"],
        cwd=d, check=True, capture_output=True,
    )
    _run_tpu(["--pfile", "bi", flag] + keys
             + ["--write-snplist", "--out", f"t{tag}"], str(d))
    assert (d / f"o{tag}.snplist").read_text() == \
        (d / f"t{tag}.snplist").read_text()


def test_string_and_flag_semantics():
    """Documented contract (2.0/plink2_help.cc:1939-1945): string
    equality, empty-string ';', missing-key false-unless-!=."""
    from plink_tpu.utils.infoexpr import InfoExpr

    e = InfoExpr("(VT==SNP)&&(999<DP<99999)")
    assert e.eval("VT=SNP;DP=1000")
    assert not e.eval("VT=INDEL;DP=1000")
    assert not e.eval("VT=SNP;DP=10")
    assert not e.eval("DP=1000")          # missing key -> false
    assert InfoExpr("VT!=SNP").eval("DP=5")   # missing + != -> true
    assert InfoExpr("VT!=SNP").eval("VT=INDEL")
    assert not InfoExpr("VT!=SNP").eval("VT=SNP")
    assert InfoExpr("VT==;").eval("VT=")      # ';' = empty string
    assert InfoExpr("DP==5").eval("DP=5.0")   # numeric equality
    assert not InfoExpr("DP<10").eval("DP=abc")  # unparseable -> false

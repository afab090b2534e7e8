"""--fast-epistasis differential tests: byte-diffed against plink 1.9
(epistasis_report, 1.9/plink_ld.c:9374-10420)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE2 = os.environ.get(
    "PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(ORACLE19) and os.path.exists(ORACLE2)),
    reason="plink 1.9 oracle not built",
)


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True,
                   capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def epi_panel(tmp_path_factory):
    """160 samples x 120 markers over two chromosomes with realistic
    position spacing (for case-only --gap) and 5% missingness."""
    d = tmp_path_factory.mktemp("epi")
    subprocess.run(
        [ORACLE2, "--dummy", "160", "120", "0.05", "--seed", "91",
         "--out", "pp"], cwd=d, check=True, capture_output=True)
    subprocess.run(
        [ORACLE2, "--pfile", "pp", "--make-bed", "--out", "pb"],
        cwd=d, check=True, capture_output=True)
    # rewrite .bim: half chr1 / half chr2, 150kb spacing so a 500kb
    # case-only gap excludes nearby pairs but not distant ones
    lines = (d / "pb.bim").read_text().splitlines()
    out = []
    for i, ln in enumerate(lines):
        f = ln.split("\t")
        f[0] = "1" if i < 60 else "2"
        f[3] = str(100000 + (i % 60) * 150000)
        out.append("\t".join(f))
    (d / "pb.bim").write_text("\n".join(out) + "\n")
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.mark.parametrize("mods", [[], ["boost"], ["joint-effects"],
                                  ["no-ueki"], ["nop"]])
def test_fast_epistasis_modes(epi_panel, mods):
    d = epi_panel
    tag = "_".join(mods) or "def"
    run19(["--bfile", "pb", "--fast-epistasis"] + mods
          + ["--allow-no-sex", "--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--fast-epistasis"] + mods
            + ["--allow-no-sex", "--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.epi.cc", f"t_{tag}.epi.cc")
    _cmp(d, f"o_{tag}.epi.cc.summary", f"t_{tag}.epi.cc.summary")


def test_fast_epistasis_case_only_gap(epi_panel):
    d = epi_panel
    run19(["--bfile", "pb", "--fast-epistasis", "case-only", "--gap",
           "500", "--allow-no-sex", "--out", "o_co"], str(d))
    run_tpu(["--bfile", "pb", "--fast-epistasis", "case-only", "--gap",
             "500", "--allow-no-sex", "--out", "t_co", "--silent"],
            str(d))
    _cmp(d, "o_co.epi.co", "t_co.epi.co")
    _cmp(d, "o_co.epi.co.summary", "t_co.epi.co.summary")


def test_fast_epistasis_thresholds(epi_panel):
    d = epi_panel
    args = ["--fast-epistasis", "--epi1", "0.5", "--epi2", "0.05",
            "--allow-no-sex"]
    run19(["--bfile", "pb"] + args + ["--out", "o_thr"], str(d))
    run_tpu(["--bfile", "pb"] + args + ["--out", "t_thr", "--silent"],
            str(d))
    _cmp(d, "o_thr.epi.cc", "t_thr.epi.cc")
    _cmp(d, "o_thr.epi.cc.summary", "t_thr.epi.cc.summary")


def test_fast_epistasis_je_cellmin(epi_panel):
    d = epi_panel
    args = ["--fast-epistasis", "joint-effects", "--je-cellmin", "2",
            "--allow-no-sex"]
    run19(["--bfile", "pb"] + args + ["--out", "o_jc"], str(d))
    run_tpu(["--bfile", "pb"] + args + ["--out", "t_jc", "--silent"],
            str(d))
    _cmp(d, "o_jc.epi.cc", "t_jc.epi.cc")
    _cmp(d, "o_jc.epi.cc.summary", "t_jc.epi.cc.summary")


@pytest.fixture(scope="module")
def qt_pheno(epi_panel):
    d = epi_panel
    rng = np.random.default_rng(5)
    fam = [ln.split() for ln in (d / "pb.fam").read_text().splitlines()]
    body = "".join(f"{r[0]} {r[1]} {rng.normal(0, 1):.6f}\n" for r in fam)
    (d / "qt_t.phe").write_text("#FID IID PHENO1\n" + body)
    (d / "qt_o.phe").write_text("FID IID PHENO1\n" + body)
    return d


def test_epistasis_qt_linear(qt_pheno):
    d = qt_pheno
    run19(["--bfile", "pb", "--pheno", "qt_o.phe", "--epistasis",
           "--epi1", "0.5", "--allow-no-sex", "--out", "oq"], str(d))
    run_tpu(["--bfile", "pb", "--pheno", "qt_t.phe", "--epistasis",
             "--epi1", "0.5", "--allow-no-sex", "--out", "tq",
             "--silent"], str(d))
    _cmp(d, "oq.epi.qt", "tq.epi.qt")
    _cmp(d, "oq.epi.qt.summary", "tq.epi.qt.summary")


def test_epistasis_cc_logistic(epi_panel):
    d = epi_panel
    run19(["--bfile", "pb", "--epistasis", "--epi1", "0.5",
           "--allow-no-sex", "--out", "ocl"], str(d))
    run_tpu(["--bfile", "pb", "--epistasis", "--epi1", "0.5",
             "--allow-no-sex", "--out", "tcl", "--silent"], str(d))
    _cmp(d, "ocl.epi.cc", "tcl.epi.cc")
    _cmp(d, "ocl.epi.cc.summary", "tcl.epi.cc.summary")


@pytest.fixture(scope="module")
def set_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("episet")
    subprocess.run([ORACLE19, "--dummy", "100", "60", "0.02", "--seed",
                    "3", "--make-bed", "--out", "e"], cwd=d, check=True,
                   capture_output=True)
    lines = (d / "e.bim").read_text().splitlines()
    out = []
    for k, ln in enumerate(lines):
        t = ln.split("\t")
        t[3] = str(1000 + k * 1000)
        out.append("\t".join(t))
    (d / "e.bim").write_text("\n".join(out) + "\n")
    subprocess.run([ORACLE19, "--dummy", "100", "60", "0.02",
                    "scalar-pheno", "--seed", "3", "--make-bed", "--out",
                    "q"], cwd=d, check=True, capture_output=True)
    (d / "q.bim").write_text((d / "e.bim").read_text())
    (d / "sets.txt").write_text("1 6000 20000 SETA\n1 31000 45000 SETB\n")
    (d / "setsA.txt").write_text("1 6000 20000 SETA\n")
    return d


SET_CASES = [
    (["--bfile", "e", "--fast-epistasis", "set-by-set", "--make-set",
      "setsA.txt", "--epi1", "0.5"], "fe_s1"),
    (["--bfile", "e", "--fast-epistasis", "set-by-set", "--make-set",
      "sets.txt", "--epi1", "0.5"], "fe_s2"),
    (["--bfile", "e", "--fast-epistasis", "set-by-all", "--make-set",
      "setsA.txt", "--epi1", "0.5"], "fe_sa"),
    (["--bfile", "e", "--fast-epistasis", "boost", "set-by-set",
      "--make-set", "sets.txt"], "fe_boost"),
    (["--bfile", "e", "--epistasis", "set-by-set", "--make-set",
      "sets.txt", "--epi1", "0.9"], "re_s2"),
    (["--bfile", "e", "--epistasis", "set-by-all", "--make-set",
      "setsA.txt", "--epi1", "0.9"], "re_sa"),
    (["--bfile", "q", "--epistasis", "set-by-set", "--make-set",
      "sets.txt", "--epi1", "0.9"], "re_qt"),
]


@pytest.mark.parametrize("args,tag", SET_CASES, ids=[c[1] for c in SET_CASES])
def test_epistasis_sets(set_panel, args, tag):
    """set-by-set / set-by-all pair restriction (epistasis_report,
    1.9/plink_ld.c:9478-9533; row-side-only tallies :8763)."""
    import glob

    from plink_tpu.cli import main

    d = set_panel
    subprocess.run([ORACLE19] + args + ["--allow-no-sex", "--out",
                   f"o_{tag}"], cwd=d, check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(args + ["--allow-no-sex", "--out", f"t_{tag}",
                            "--silent"]) == 0
    finally:
        os.chdir(old)
    ofiles = sorted(glob.glob(str(d / f"o_{tag}.epi*")))
    assert ofiles
    for of in ofiles:
        tf = of.replace(f"o_{tag}", f"t_{tag}", 1)
        assert open(of, "rb").read() == open(tf, "rb").read(), \
            os.path.basename(of)

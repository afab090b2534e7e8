"""--adjust-file and --gwas-ssf differential tests.

--gwas-ssf output is byte-identical.  --adjust-file matches at 2e-6
except the GC column (1e-5): the reference's p->chisq inverse only
iterates to 24-bit precision (gamma_p_inv_imp2,
2.0/include/plink2_stats.cc:831) while ours is full f64."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("adjssf")
    subprocess.run(
        [ORACLE, "--dummy", "200", "150", "0.03", "acgt", "--seed", "77",
         "--out", "gac"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(1)
    ids = [l.split()[0] for l in (d / "gac.psam").read_text().splitlines()[1:]]
    with open(d / "gac.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.4f}\n")
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--glm", "hide-covar", "--covar",
         "gac.cov", "--out", "res"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def test_gwas_ssf(panel):
    from plink_tpu.cli import main

    d = panel
    src = "res.PHENO1.glm.logistic.hybrid"
    subprocess.run(
        [ORACLE, "--gwas-ssf", f"file={src}", "--out", "o_s"],
        cwd=d, check=True, capture_output=True,
    )
    ref = (d / f"{src}.ssf.tsv").read_text()
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--gwas-ssf", f"file={src}", "--out", "t_s",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"{src}.ssf.tsv").read_text() == ref


def test_adjust_file(panel):
    from plink_tpu.cli import main

    d = panel
    src = "res.PHENO1.glm.logistic.hybrid"
    subprocess.run(
        [ORACLE, "--adjust-file", src, "test=ADD", "--out", "o_a"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--adjust-file", src, "test=ADD", "--out", "t_a",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    la = (d / "o_a.adjusted").read_text().splitlines()
    lb = (d / "t_a.adjusted").read_text().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    gc_col = la[0].split("\t").index("GC")
    for a, b in zip(la[1:], lb[1:]):
        ta, tb = a.split("\t"), b.split("\t")
        for ci, (x, y) in enumerate(zip(ta, tb)):
            if x == y:
                continue
            fx, fy = float(x), float(y)
            tol = 1e-5 if ci == gc_col else 2e-6
            assert abs(fx - fy) / max(abs(fx), 1e-300) < tol, (a, b)


@pytest.mark.parametrize("mods", [
    ["gc"],
    ["log10"],
    ["cols=chrom,pos,ref,alt,unadj,gc,qq,bonf,holm,sidakss,sidaksd,fdrbh,fdrby"],
    ["cols=+qq,+pos"],
    ["gc", "log10"],
], ids=lambda m: "+".join(m))
def test_adjust_file_modifiers(panel, mods):
    """--adjust-file gc/log10/cols= (ref 2.0/plink2_adjust.cc:389-391,
    :506-509)."""
    from plink_tpu.cli import main

    d = panel
    src = "res.PHENO1.glm.logistic.hybrid"
    tag = "m" + str(abs(hash(tuple(mods))) % 10000)
    subprocess.run(
        [ORACLE, "--adjust-file", src, "test=ADD"] + mods
        + ["--out", f"o_{tag}"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--adjust-file", src, "test=ADD"] + mods
                    + ["--out", f"t_{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    la = (d / f"o_{tag}.adjusted").read_text().splitlines()
    lb = (d / f"t_{tag}.adjusted").read_text().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    hdr = la[0].lstrip("#").split("\t")
    # GC-derived columns inherit the reference's 24-bit p->chisq inverse
    loose = {"GC"} | ({"BONF", "HOLM", "SIDAK_SS", "SIDAK_SD", "FDR_BH",
                       "FDR_BY"} if "gc" in mods else set())
    for a, b in zip(la[1:], lb[1:]):
        ta, tb = a.split("\t"), b.split("\t")
        for ci, (x, y) in enumerate(zip(ta, tb)):
            if x == y:
                continue
            fx, fy = float(x), float(y)
            base_name = hdr[ci].replace("NEG_LOG10_", "")
            # gc-derived columns inherit the oracle's 24-bit p->chisq
            # inverse; sidak amplifies it for near-zero -log10 values
            tol = 5e-5 if base_name in loose else 2e-6
            assert abs(fx - fy) / max(abs(fx), 1e-300) < tol, (hdr[ci], a, b)

"""--condition / --condition-list differential tests (GlmCondition,
2.0/plink2_glm.cc:1260): condition dosage covariates precede --covar
columns, dominant/recessive recodings, self-row collinearity."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def _compare_glm(path_a, path_b, tol=1e-3):
    la = open(path_a).read().splitlines()
    lb = open(path_b).read().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    for a, b in zip(la[1:], lb[1:]):
        for x, y in zip(a.split("\t"), b.split("\t")):
            if x == y:
                continue
            fx, fy = float(x), float(y)
            sape = abs(fx - fy) / max((abs(fx) + abs(fy)) / 2, 1e-300)
            assert min(sape, abs(fx - fy)) < tol, f"{x} vs {y} in\n{a}\n{b}"


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("cond")
    subprocess.run(
        [ORACLE, "--dummy", "300", "400", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--dummy", "300", "400", "0.04", "--seed", "13", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(4)
    ids = [l.split("\t")[0] for l in (d / "gq.psam").read_text().splitlines()[1:]]
    with open(d / "g.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    (d / "clist.txt").write_text("snp5\nsnp100\nsnp250\n")
    return d


@pytest.mark.parametrize(
    "flags,suffix",
    [
        (["--pfile", "gq", "--glm", "--condition", "snp5", "--covar", "g.cov"],
         "PHENO1.glm.linear"),
        (["--pfile", "gq", "--glm", "--condition-list", "clist.txt",
          "--covar", "g.cov"], "PHENO1.glm.linear"),
        (["--pfile", "gq", "--glm", "allow-no-covars", "--condition", "snp5",
          "dominant"], "PHENO1.glm.linear"),
        (["--pfile", "gq", "--glm", "allow-no-covars", "--condition", "snp5",
          "recessive"], "PHENO1.glm.linear"),
        (["--pfile", "gp", "--glm", "--condition", "snp5", "--covar",
          "g.cov"], "PHENO1.glm.logistic.hybrid"),
    ],
)
def test_condition(panel, flags, suffix):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE] + flags + ["--out", "o_c"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_c", "--silent"]) == 0
    finally:
        os.chdir(old)
    _compare_glm(d / f"o_c.{suffix}", d / f"t_c.{suffix}")

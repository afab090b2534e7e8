"""--variant-score differential tests (Vscore,
2.0/plink2_matrix_calc.cc:9274): byte-identical .vscore vs the oracle,
including forced mean-imputation of missing genotypes, --vscore-col-nums,
and sample-filter interaction."""

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
    d = tmp_path_factory.mktemp("vscore")
    subprocess.run(
        [ORACLE, "--dummy", "300", "400", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(9)
    ids = [l.split("\t")[0] for l in (d / "gq.psam").read_text().splitlines()[1:]]
    with open(d / "vs.txt", "w") as f:
        f.write("#IID\tW1\tW2\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\t{rng.random():.6f}\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--variant-score", "vs.txt"],
        ["--variant-score", "vs.txt", "--vscore-col-nums", "3"],
        ["--keep-if", "PHENO1 > 0", "--variant-score", "vs.txt"],
        ["--maf", "0.2", "--variant-score", "vs.txt"],
    ],
)
def test_vscore(panel, flags):
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_v"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_v", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_v.vscore").read_text() == (d / "t_v.vscore").read_text()

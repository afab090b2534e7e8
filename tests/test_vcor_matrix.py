"""vcor matrix-mode differential tests (VcorMatrixThread,
2.0/plink2_ld.cc:9522): square/square0/triangle text matrices and .vars
companions byte-identical to the oracle for phased and unphased r/r^2."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("vcormat")
    subprocess.run(
        [ORACLE, "--dummy", "200", "40", "0.03", "--seed", "13", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize(
    "flag,shape",
    [
        ("--r2-unphased", "square"),
        ("--r-unphased", "square"),
        ("--r2-phased", "square"),
        ("--r-phased", "square"),
        ("--r2-unphased", "triangle"),
        ("--r2-unphased", "square0"),
    ],
)
def test_vcor_matrix(panel, flag, shape):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gp", flag, shape]
    subprocess.run([ORACLE] + flags + ["--out", "o_m"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_m", "--silent"]) == 0
    finally:
        os.chdir(old)
    kind = "phased" if "-phased" in flag else "unphased"
    suf = "vcor2" if flag.startswith("--r2") else "vcor1"
    base = f"{kind}.{suf}"
    assert (d / f"o_m.{base}").read_text() == (d / f"t_m.{base}").read_text()
    assert (d / f"o_m.{base}.vars").read_text() == (
        d / f"t_m.{base}.vars"
    ).read_text()

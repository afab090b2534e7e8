"""compound-genotypes / phylip / ind-major-bed / eig / eigt export and
--eigfile import differential tests: all byte-identical vs the oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("expmore")
    subprocess.run(
        [ORACLE, "--dummy", "90", "70", "0.05", "acgt", "--seed", "23",
         "--out", "gac"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize(
    "fmt,sufs",
    [
        ("compound-genotypes", ["ped", "map"]),
        ("phylip", ["phy"]),
        ("ind-major-bed", ["bed", "bim", "fam"]),
        ("eig", ["geno", "ind", "snp"]),
        ("eigt", ["geno", "ind", "snp"]),
    ],
)
def test_export_formats(panel, fmt, sufs):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--export", fmt, "--out", "o_e"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gac", "--export", fmt, "--out", "t_e",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    for s in sufs:
        assert (d / f"o_e.{s}").read_bytes() == (d / f"t_e.{s}").read_bytes(), s


def test_eig_import(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--export", "eig", "--out", "src_e"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--eigfile", "src_e", "--freq", "--missing", "--out", "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--eigfile", "src_e", "--freq", "--missing", "--out",
                     "t_i", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_i.afreq").read_text() == (d / "t_i.afreq").read_text()
    assert (d / "o_i.vmiss").read_text() == (d / "t_i.vmiss").read_text()

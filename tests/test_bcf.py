"""BCF 2.2 import/export cross-validation (BcfGenoToPgenThread /
Exportf BCF branch): importing oracle BCF matches the oracle's own import,
and the oracle re-imports our BGZF-wrapped BCF export with identical
frequencies and missingness."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("bcf")
    subprocess.run(
        [ORACLE, "--dummy", "90", "70", "0.05", "acgt", "--seed", "23",
         "--out", "gac"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--export", "bcf", "--out", "ob"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def test_bcf_import(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--bcf", "ob.bcf", "--freq", "--missing", "--out", "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--bcf", "ob.bcf", "--freq", "--missing", "--out",
                     "t_i", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_i.afreq").read_text() == (d / "t_i.afreq").read_text()
    assert (d / "o_i.vmiss").read_text() == (d / "t_i.vmiss").read_text()


def test_bcf_export_roundtrip(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gac", "--export", "bcf", "--out", "t_e",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run(
        [ORACLE, "--bcf", "t_e.bcf", "--freq", "--out", "o_r"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--freq", "--out", "g_f"],
        cwd=d, check=True, capture_output=True,
    )
    a = [l.split("\t") for l in (d / "g_f.afreq").read_text().splitlines()[1:]]
    b = [l.split("\t") for l in (d / "o_r.afreq").read_text().splitlines()[1:]]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x[1] == y[1] and x[-2:] == y[-2:]

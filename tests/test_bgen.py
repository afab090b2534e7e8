"""BGEN 1.2/1.3 import/export tests (Bgen13GenoToPgenThread /
ExportBgen13, 2.0/plink2_import.cc:12074, 2.0/plink2_export.cc:1943):
importing oracle-written BGEN matches the oracle's own import
byte-for-byte (afreq/vmiss), and oracle re-imports our BGEN exports with
identical frequencies."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("bgen")
    subprocess.run(
        [ORACLE, "--dummy", "90", "70", "0.05", "scalar-pheno", "--seed",
         "23", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    for ver in ("1.2", "1.3"):
        subprocess.run(
            [ORACLE, "--pfile", "gq", "--export", f"bgen-{ver}", "--out",
             f"ob{ver.replace('.', '')}"],
            cwd=d, check=True, capture_output=True,
        )
    return d


@pytest.mark.parametrize("ver", ["1.2", "1.3"])
def test_bgen_import(panel, ver):
    from plink_tpu.cli import main

    d = panel
    f = f"ob{ver.replace('.', '')}.bgen"
    subprocess.run(
        [ORACLE, "--bgen", f, "ref-last", "--freq", "--missing", "--out",
         "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--bgen", f, "ref-last", "--freq", "--missing",
                     "--out", "t_i", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_i.afreq").read_text() == (d / "t_i.afreq").read_text()
    assert (d / "o_i.vmiss").read_text() == (d / "t_i.vmiss").read_text()


@pytest.mark.parametrize("ver", ["1.2", "1.3"])
def test_bgen_export_roundtrip(panel, ver):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gq", "--export", f"bgen-{ver}", "--out",
                     "t_e", "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run(
        [ORACLE, "--bgen", "t_e.bgen", "ref-last", "--freq", "--out", "o_r"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "gq", "--freq", "--out", "g_f"],
        cwd=d, check=True, capture_output=True,
    )
    a = [l.split("\t") for l in (d / "g_f.afreq").read_text().splitlines()[1:]]
    b = [l.split("\t") for l in (d / "o_r.afreq").read_text().splitlines()[1:]]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x[1] == y[1] and x[-2:] == y[-2:]

"""Oxford .gen/.sample export + import and A-transpose export differential
tests (ExportOxGen / OxGenToPgen / DosageTransposeThread in
2.0/plink2_export.cc, plink2_import.cc): byte-identical files and
re-import freq parity vs the plink2 oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("oxford")
    subprocess.run(
        [ORACLE, "--dummy", "120", "80", "0.05", "scalar-pheno", "--seed",
         "21", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _run_both(d, flags, stem_o, stem_t):
    from plink_tpu.cli import main

    subprocess.run([ORACLE] + flags + ["--out", stem_o], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", stem_t, "--silent"]) == 0
    finally:
        os.chdir(old)


def test_export_oxford(panel):
    d = panel
    _run_both(d, ["--pfile", "gq", "--export", "oxford"], "o_ox", "t_ox")
    assert (d / "o_ox.gen").read_text() == (d / "t_ox.gen").read_text()
    assert (d / "o_ox.sample").read_text() == (d / "t_ox.sample").read_text()


def test_import_gen(panel):
    d = panel
    _run_both(d, ["--pfile", "gq", "--export", "oxford"], "o_ox", "t_ox")
    _run_both(
        d,
        ["--gen", "o_ox.gen", "ref-last", "--sample", "o_ox.sample",
         "--freq", "--missing"],
        "o_gi", "t_gi",
    )
    assert (d / "o_gi.afreq").read_text() == (d / "t_gi.afreq").read_text()
    assert (d / "o_gi.vmiss").read_text() == (d / "t_gi.vmiss").read_text()


def test_export_traw(panel):
    d = panel
    _run_both(d, ["--pfile", "gq", "--export", "A-transpose"], "o_tr", "t_tr")
    assert (d / "o_tr.traw").read_text() == (d / "t_tr.traw").read_text()


def test_import_tped(panel):
    d = panel
    _run_both(d, ["--pfile", "gq", "--export", "tped"], "o_tp", "t_tp")
    _run_both(
        d,
        ["--tped", "o_tp.tped", "--tfam", "o_tp.tfam", "--freq", "--missing"],
        "o_ti", "t_ti",
    )
    assert (d / "o_ti.afreq").read_text() == (d / "t_ti.afreq").read_text()
    assert (d / "o_ti.vmiss").read_text() == (d / "t_ti.vmiss").read_text()

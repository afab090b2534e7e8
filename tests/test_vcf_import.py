"""--vcf import tests: round-trip through our exporter and differential
parity with the plink2 oracle's converter."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def test_vcf_export_import_identity(tmp_path, geno_factory):
    from plink_tpu.cli import main
    from plink_tpu.io.vcf import read_vcf
    from test_pairwise import _write_fileset

    codes = geno_factory(40, 25, missing_rate=0.1)
    _write_fileset(tmp_path / "d", codes)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "d", "--export", "vcf", "--out", "e"]) == 0
        vi, si, codes2, _ma = read_vcf(str(tmp_path / "e.vcf"))
    finally:
        os.chdir(old)
    assert codes2.shape == codes.shape
    assert (codes2 == codes).all()
    assert si.sample_ct == 25
    assert vi.variant_ct == 40


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
def test_vcf_import_differential(tmp_path):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "80", "120", "0.05", "acgt", "--seed", "3",
         "--out", "vp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "vp", "--export", "vcf", "--out", "vx"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    flags = ["--vcf", "vx.vcf", "--freq", "--missing", "--make-pgen"]
    subprocess.run(
        [ORACLE] + flags + ["--out", "ov"], cwd=tmp_path, check=True,
        capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "tv"]) == 0
    finally:
        os.chdir(old)
    for ext in ("afreq", "vmiss", "smiss", "pvar", "psam"):
        assert (tmp_path / f"ov.{ext}").read_bytes() == (
            tmp_path / f"tv.{ext}"
        ).read_bytes(), ext
    # .pgen bytes may differ (codec choice freedom); decoded content must not
    from plink_tpu.io.pgen_read import PgenReader

    a = PgenReader(str(tmp_path / "ov.pgen"), sample_ct=80)
    b = PgenReader(str(tmp_path / "tv.pgen"), sample_ct=80)
    assert (a.read_packed(0, 120) == b.read_packed(0, 120)).all()

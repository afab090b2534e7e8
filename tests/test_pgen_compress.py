"""pgen_compress standalone (ref: 2.0/pgen_compress.cc) and --dummy
dosage-freq=/phase-freq= modifiers (GenerateDummy,
2.0/plink2_import.cc:16326; RNG stream differs so dosage panels are
statistically, not byte-wise, reproduced)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def test_pgen_compress_roundtrip(tmp_path):
    from plink_tpu.io.pgen_read import PgenReader
    from plink_tpu.pgen_compress import main as pcmain

    subprocess.run(
        [ORACLE, "--dummy", "40", "50", "0.05", "--seed", "4", "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "d", "--make-bed", "--out", "db"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert pcmain(["db.bed", "c1.pgen", "40"]) == 0
        assert pcmain(["-u", "c1.pgen", "c1.bed"]) == 0
    finally:
        os.chdir(old)
    assert (tmp_path / "db.bed").read_bytes() == \
        (tmp_path / "c1.bed").read_bytes()
    a = PgenReader(str(tmp_path / "d.pgen"))
    b = PgenReader(str(tmp_path / "c1.pgen"))
    assert np.array_equal(a.read_packed(0, a.variant_ct),
                          b.read_packed(0, b.variant_ct))


def test_dummy_dosage_phase(tmp_path):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--dummy", "50", "40", "0.02", "dosage-freq=0.6",
                     "phase-freq=0.7", "--seed", "7", "--out", "dp",
                     "--silent"]) == 0
        assert main(["--pfile", "dp", "--freq", "--out", "f", "--silent"]) == 0
    finally:
        os.chdir(old)
    # the oracle validates and reads our dosage+phase pgen identically
    r = subprocess.run([ORACLE, "--pfile", "dp", "--validate"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0
    subprocess.run([ORACLE, "--pfile", "dp", "--freq", "--out", "of"],
                   cwd=tmp_path, check=True, capture_output=True)
    assert (tmp_path / "f.afreq").read_text() == \
        (tmp_path / "of.afreq").read_text()
    # dosages actually present
    from plink_tpu.dataset import load_dataset

    ds = load_dataset(str(tmp_path / "dp"))
    assert ds.has_dosage

"""Dosage-track support differential tests: pgen dosage decode (list/
dense/bitarray vrtypes), dosage-aware --freq, VCF DS export with
PrintDosageDecimal round-trip-shortest formatting, --read-freq, and
dosage-aware --score with ddosagetoa sum rendering."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("dosage")
    subprocess.run(
        [ORACLE, "--dummy", "40", "30", "0.02", "dosage-freq=0.6", "--seed",
         "5", "--out", "gd"],
        cwd=d, check=True, capture_output=True,
    )
    pvar = (d / "gd.pvar").read_text().splitlines()
    with open(d / "sc.txt", "w") as f:
        for k, ln in enumerate(pvar[1:16]):
            t = ln.split("\t")
            f.write(f"{t[2]} {t[4]} {k * 0.1}\n")
    return d


def test_dosage_freq(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--pfile", "gd", "--freq", "--missing", "--out",
                    "o_f"], cwd=d, check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gd", "--freq", "--missing", "--out", "t_f",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_f.afreq").read_text() == (d / "t_f.afreq").read_text()
    assert (d / "o_f.vmiss").read_text() == (d / "t_f.vmiss").read_text()


def test_dosage_vcf_ds_export(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--pfile", "gd", "--export", "vcf",
                    "vcf-dosage=DS", "--out", "o_v"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gd", "--export", "vcf", "vcf-dosage=DS",
                     "--out", "t_v", "--silent"]) == 0
    finally:
        os.chdir(old)
    oo = [l for l in (d / "o_v.vcf").read_text().splitlines()
          if not l.startswith("##")]
    tt = [l for l in (d / "t_v.vcf").read_text().splitlines()
          if not l.startswith("##")]
    assert oo == tt


def test_dosage_score(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--pfile", "gd", "--freq", "--out", "fr"],
                   cwd=d, check=True, capture_output=True)
    flags = ["--pfile", "gd", "--score", "sc.txt", "--read-freq", "fr.afreq"]
    subprocess.run([ORACLE] + flags + ["--out", "o_s"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_s", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_s.sscore").read_text() == (d / "t_s.sscore").read_text()

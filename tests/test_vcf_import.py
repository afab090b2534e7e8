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


MA_PHASED_VCF = """##fileformat=VCFv4.3
##contig=<ID=1,length=100000>
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\ts4\ts5\ts6
1\t100\tv1\tA\tC\t.\t.\t.\tGT\t0|1\t1|0\t0/1\t1|1\t0|0\t./.
1\t200\tv2\tG\tC,T\t.\t.\t.\tGT\t1|2\t2|1\t0|2\t2|2\t0/1\t1/2
1\t300\tv3\tT\tA,C,G\t.\t.\t.\tGT\t2|3\t0|3\t3|1\t3/3\t1|1\t0|0
1\t400\tv4\tC\tG\t.\t.\t.\tGT\t0/0\t0/1\t1/1\t0|1\t1|0\t0/0
1\t500\tv5\tA\tAT,ATT\t.\t.\t.\tGT\t0|1\t1/2\t2|0\t1|2\t2|1\t0/2
"""


def test_vcf_phased_multiallelic_roundtrip(tmp_path):
    """Phased multiallelic import -> .pgen bytes == plink2's; export vcf
    body matches; subsetting --make-pgen rewrite preserves the combined
    aux1+phase record (het universe incl. aux1b patches, GetAux1bHetIncr
    2.0/include/pgenlib_read.cc:7728)."""
    import subprocess

    from plink_tpu.cli import main

    d = tmp_path
    (d / "m.vcf").write_text(MA_PHASED_VCF)
    subprocess.run([ORACLE, "--vcf", str(d / "m.vcf"), "--make-pgen",
                    "--out", str(d / "o")], check=True, capture_output=True)
    assert main(["--vcf", str(d / "m.vcf"), "--make-pgen",
                 "--out", str(d / "t"), "--silent"]) == 0
    for e in (".pgen", ".pvar", ".psam"):
        assert (d / f"o{e}").read_bytes() == (d / f"t{e}").read_bytes(), e
    # export roundtrip
    subprocess.run([ORACLE, "--pfile", str(d / "o"), "--export", "vcf",
                    "--out", str(d / "oe")], check=True, capture_output=True)
    assert main(["--pfile", str(d / "t"), "--export", "vcf",
                 "--out", str(d / "te"), "--silent"]) == 0
    body = lambda p: "\n".join(
        ln for ln in p.read_text().splitlines() if not ln.startswith("##"))
    assert body(d / "oe.vcf") == body(d / "te.vcf")
    # sample-subset rewrite
    (d / "rm.txt").write_text("s2\ts2\n")
    subprocess.run([ORACLE, "--pfile", str(d / "o"), "--remove",
                    str(d / "rm.txt"), "--make-pgen", "--out", str(d / "os")],
                   check=True, capture_output=True)
    assert main(["--pfile", str(d / "t"), "--remove", str(d / "rm.txt"),
                 "--make-pgen", "--out", str(d / "ts"), "--silent"]) == 0
    assert (d / "os.pgen").read_bytes() == (d / "ts.pgen").read_bytes()


def test_bcf_phased_multiallelic(tmp_path):
    """--bcf with phased hardcalls + multiallelic patches + haploid
    END_OF_VECTOR padding: .pgen/.pvar byte-identical vs plink2's own
    BCF import (BcfGenoToPgenThread, 2.0/plink2_import.cc:7217)."""
    import subprocess

    from plink_tpu.cli import main

    d = tmp_path
    (d / "m.vcf").write_text(MA_PHASED_VCF + "1\t600\tv6\tT\tC\t.\t.\t.\t"
                             "GT\t1\t0\t1|1\t0|1\t./.\t1\n")
    subprocess.run([ORACLE, "--vcf", str(d / "m.vcf"), "--export", "bcf",
                    "--out", str(d / "mb")], check=True,
                   capture_output=True)
    subprocess.run([ORACLE, "--bcf", str(d / "mb.bcf"), "--make-pgen",
                    "--out", str(d / "ob")], check=True,
                   capture_output=True)
    assert main(["--bcf", str(d / "mb.bcf"), "--make-pgen",
                 "--out", str(d / "tb"), "--silent"]) == 0
    for e in (".pgen", ".pvar", ".psam"):
        assert (d / f"ob{e}").read_bytes() == (d / f"tb{e}").read_bytes(), e

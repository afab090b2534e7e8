"""Multiallelic end-to-end: VCF import -> .pgen aux track 1 -> freq /
geno-counts / export vcf / make-pgen, byte-diffed against the plink2
oracle on the same multiallelic VCF (VcfToPgen multiallelic path,
2.0/plink2_import.cc:2768; patch-set spec pgen_spec.tex:469-541)."""

import os
import random
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def run_oracle(args, cwd):
    subprocess.run([ORACLE] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def ma_vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("ma")
    random.seed(17)
    n = 60
    lines = [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
        "##contig=<ID=1,length=100000>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"s{i}" for i in range(n)),
    ]
    specs = [
        (100, "A", "C"), (200, "A", "C,G"), (300, "T", "A,C,G"),
        (400, "G", "C"), (500, "C", "A,G,T,TT"), (600, "A", "C,G"),
        (700, "T", "TA,TAA,TAAA,TAAAA,TAAAAA"),
    ]
    for pos, ref, alt in specs:
        nalt = len(alt.split(","))
        gts = []
        for _ in range(n):
            if random.random() < 0.05:
                gts.append("./.")
            else:
                a = random.choices(range(nalt + 1),
                                   weights=[6] + [2] * nalt)[0]
                b = random.choices(range(nalt + 1),
                                   weights=[6] + [2] * nalt)[0]
                gts.append(f"{min(a, b)}/{max(a, b)}")
        lines.append(
            f"1\t{pos}\tv{pos}\t{ref}\t{alt}\t.\tPASS\t.\tGT\t"
            + "\t".join(gts)
        )
    (d / "ma.vcf").write_text("\n".join(lines) + "\n")
    run_oracle(["--vcf", "ma.vcf", "--make-pgen", "--out", "omap"], str(d))
    run_tpu(["--vcf", "ma.vcf", "--make-pgen", "--out", "tmap", "--silent"],
            str(d))
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def test_ma_freq_gcount(ma_vcf):
    d = ma_vcf
    run_oracle(["--pfile", "omap", "--freq", "--geno-counts",
                "--out", "of"], str(d))
    run_tpu(["--pfile", "tmap", "--freq", "--geno-counts", "--out", "tf",
             "--silent"], str(d))
    _cmp(d, "of.afreq", "tf.afreq")
    _cmp(d, "of.gcount", "tf.gcount")


def test_ma_export_vcf_roundtrip(ma_vcf):
    d = ma_vcf
    run_oracle(["--pfile", "omap", "--export", "vcf", "--out", "ove"],
               str(d))
    run_tpu(["--pfile", "tmap", "--export", "vcf", "--out", "tve",
             "--silent"], str(d))
    o = [l for l in (d / "ove.vcf").read_text().splitlines()
         if not l.startswith("##")]
    t = [l for l in (d / "tve.vcf").read_text().splitlines()
         if not l.startswith("##")]
    assert o == t


def test_ma_make_pgen_subset(ma_vcf):
    """make-pgen with sample/variant filters carries patches through."""
    d = ma_vcf
    # subset samples via --keep of every other sample
    with open(d / "tmap.psam") as f:
        f.readline()
        iids = [l.split("\t")[0] for l in f]
    with open(d / "keep.txt", "w") as f:
        for i in iids[::2]:
            f.write(i + "\n")
    args = ["--pfile", "tmap", "--keep", "keep.txt", "--make-pgen",
            "--out", "tsub", "--silent"]
    run_tpu(args, str(d))
    run_oracle(["--pfile", "omap", "--keep", "keep.txt", "--make-pgen",
                "--out", "osub"], str(d))
    run_tpu(["--pfile", "tsub", "--freq", "--out", "tsf", "--silent"],
            str(d))
    run_oracle(["--pfile", "osub", "--freq", "--out", "osf"], str(d))
    _cmp(d, "osf.afreq", "tsf.afreq")


def test_ma_reader_matches_vcf_truth(ma_vcf):
    d = ma_vcf
    from plink_tpu.dataset import load_dataset

    truth = {}
    for l in (d / "ma.vcf").read_text().splitlines():
        if l.startswith("#"):
            continue
        t = l.split("\t")
        truth[int(t[1])] = [
            tuple(sorted((-1, -1) if g == "./." else
                         tuple(int(x) for x in g.split("/"))))
            for g in t[9:]
        ]
    for stem in ("omap", "tmap"):
        ds = load_dataset(str(d / stem))
        for v in range(ds.raw_variant_ct):
            got = ds.allele_codes(v)
            want = truth[int(ds.vi.pos[v])]
            for i in range(ds.raw_sample_ct):
                assert tuple(sorted(got[i])) == want[i], (stem, v, i)


def test_zst_outputs_and_bgz_export(ma_vcf):
    """'zs' report modifiers and --export vcf bgz (content parity with the
    oracle; our BGZF blocks differ byte-wise from libdeflate's but carry
    the standard EOF marker)."""
    d = ma_vcf
    import gzip

    import zstandard

    run_oracle(["--pfile", "omap", "--freq", "zs", "--out", "oz"], str(d))
    run_tpu(["--pfile", "tmap", "--freq", "zs", "--out", "tz", "--silent"],
            str(d))
    dctx = zstandard.ZstdDecompressor()
    a = dctx.decompress((d / "oz.afreq.zst").read_bytes(),
                        max_output_size=1 << 26)
    b = dctx.decompress((d / "tz.afreq.zst").read_bytes(),
                        max_output_size=1 << 26)
    assert a == b
    run_oracle(["--pfile", "omap", "--export", "vcf", "bgz", "--out", "ob"],
               str(d))
    run_tpu(["--pfile", "tmap", "--export", "vcf", "bgz", "--out", "tb",
             "--silent"], str(d))
    oa = [l for l in gzip.open(d / "ob.vcf.gz", "rt")
          if not l.startswith("##")]
    tb = [l for l in gzip.open(d / "tb.vcf.gz", "rt")
          if not l.startswith("##")]
    assert oa == tb
    raw = (d / "tb.vcf.gz").read_bytes()
    assert raw.endswith(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))

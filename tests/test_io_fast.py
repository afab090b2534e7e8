"""mt-BGZF reader, decompress-ahead streams, native VCF GT parser, and
native pgen row encoder: correctness vs the pure-Python reference paths."""

import gzip
import os
import subprocess

import numpy as np
import pytest

from plink_tpu.io.compress import BgzfWriter, open_text_auto, _is_bgzf

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def test_bgzf_roundtrip_multiblock(tmp_path):
    data = "".join(f"row{i}\t" + "ACGT" * 40 + "\n" for i in range(100000))
    p = str(tmp_path / "t.gz")
    with BgzfWriter(p) as w:
        w.write(data)
    assert _is_bgzf(p)
    with open_text_auto(p) as f:
        assert f.read() == data
    # line iteration hits the BufferedReader readinto path
    with open_text_auto(p) as f:
        assert sum(1 for _ in f) == 100000


def test_plain_gzip_readahead(tmp_path):
    data = "".join(f"{i}\n" for i in range(50000))
    p = str(tmp_path / "t2.gz")
    with gzip.open(p, "wt") as f:
        f.write(data)
    assert not _is_bgzf(p)
    with open_text_auto(p) as f:
        assert f.read() == data


def test_zstd_readahead(tmp_path):
    import zstandard

    data = "".join(f"{i}\tx\n" for i in range(50000))
    p = str(tmp_path / "t3.zst")
    with open(p, "wb") as f:
        f.write(zstandard.ZstdCompressor().compress(data.encode()))
    with open_text_auto(p) as f:
        assert f.read() == data


def test_native_pgen_encoder_byte_identity(tmp_path):
    """The native batch encoder must produce byte-identical .pgen output to
    the Python reference writer (which is differential-tested vs plink2)."""
    from plink_tpu.io.pgen_write import PgenWriter
    from plink_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    for V, N in ((200, 19), (150, 300), (100, 70000)):
        mafs = rng.uniform(0, 0.5, (V, 1))
        g = ((rng.random((V, N)) < mafs).astype(np.uint8)
             + (rng.random((V, N)) < mafs).astype(np.uint8))
        g[rng.random((V, N)) < 0.04] = 3
        g[0, :] = 0
        g[1, :] = 2
        pa = str(tmp_path / f"a{V}x{N}.pgen")
        pb = str(tmp_path / f"b{V}x{N}.pgen")
        w = PgenWriter(pa, N, V)
        w.append_codes(g)  # batch -> native
        w.close()
        w = PgenWriter(pb, N, V)
        for row in g:
            w._append_one(row)  # pure Python reference
        w.close()
        assert open(pa, "rb").read() == open(pb, "rb").read()


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_vcf_bgzf_import_matches_plain(tmp_path):
    """.vcf.gz (BGZF, via the mt reader + native GT parser) must import
    identically to the uncompressed .vcf (Python scalar path comparison is
    implicit: both go through read_vcf)."""
    from plink_tpu.cli import main

    d = tmp_path
    subprocess.run(
        [ORACLE, "--dummy", "120", "500", "0.03", "--seed", "3",
         "--out", "gp"], cwd=d, check=True, capture_output=True)
    subprocess.run(
        [ORACLE, "--pfile", "gp", "--export", "vcf", "--out", "pv"],
        cwd=d, check=True, capture_output=True)
    subprocess.run(
        [ORACLE, "--pfile", "gp", "--export", "vcf", "bgz", "--out", "bv"],
        cwd=d, check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--vcf", "pv.vcf", "--make-pgen", "--out", "tp",
                     "--silent"]) == 0
        assert main(["--vcf", "bv.vcf.gz", "--make-pgen", "--out", "tb",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    for ext in (".pgen", ".pvar", ".psam"):
        assert (d / ("tp" + ext)).read_bytes() == \
            (d / ("tb" + ext)).read_bytes()


def test_native_gt_parser_vs_scalar(tmp_path):
    """Exercise GT corner shapes through read_vcf and compare against the
    scalar parser's output (phase included)."""
    from plink_tpu.io.vcf import read_vcf, _parse_gt

    fields = ["0/0", "0/1", "1/1", "./.", ".", "0", "1", "0|1", "1|0",
              "1|1", "0/0:12:3", "./1", "1/.", "0/2", "2/2", "1/1/1",
              "0|1:7"]
    n = len(fields)
    lines = ["##fileformat=VCFv4.3",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"s{i}" for i in range(n))]
    # 30 variants cycling the field list with different rotations
    for v in range(30):
        rot = fields[v % n:] + fields[:v % n]
        lines.append(f"1\t{100+v}\tv{v}\tA\tC\t.\t.\t.\tGT\t"
                     + "\t".join(rot))
    p = str(tmp_path / "odd.vcf")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    vi, si, codes, phase_rows, ma = read_vcf(p, with_phase=True)
    assert not ma
    for v in range(30):
        rot = fields[v % n:] + fields[:v % n]
        expect = np.array([_parse_gt(g, 2) for g in rot], np.uint8)
        np.testing.assert_array_equal(codes[v], expect)
        pp, pi = phase_rows[v]
        for s, g in enumerate(rot):
            gt = g.split(":", 1)[0]
            want_p = ("|" in gt and gt.split("|")[0] in ("0", "1")
                      and gt.split("|")[1] in ("0", "1")
                      and gt.split("|")[0] != gt.split("|")[1])
            assert pp[s] == want_p, (v, s, g)
            if want_p:
                assert pi[s] == (gt.split("|")[0] == "1")

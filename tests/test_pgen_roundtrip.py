"""pgen codec round-trip tests, modeled on the reference's property-test
strategy (2.0/Python/tests/test_pgenlib.py:9-55): random genotype matrices
including all-ALT / all-missing / constant edge variants, written and read
back with exact concordance required."""

import numpy as np
import pytest

from plink_tpu.io import PgenReader, PgenWriter, write_bed, write_pgen_simple
from plink_tpu.io import pack
from plink_tpu.io.varint import (
    decode_difflist,
    decode_varint,
    decode_varints,
    encode_difflist,
    encode_varint,
    encode_varints,
)


def test_varint_roundtrip(rng):
    vals = np.concatenate(
        [
            np.array([0, 1, 127, 128, 300, 16383, 16384, 2**21 - 1, 2**28, 2**32 - 1]),
            rng.integers(0, 2**31, size=500),
        ]
    ).astype(np.uint64)
    buf = b"".join(encode_varint(int(v)) for v in vals)
    assert encode_varints(vals) == buf
    arr = np.frombuffer(buf, dtype=np.uint8)
    decoded, end = decode_varints(arr, len(vals))
    assert end == len(buf)
    np.testing.assert_array_equal(decoded, vals.astype(np.uint32))
    # scalar path agrees
    v0, off = decode_varint(arr, 0)
    assert v0 == vals[0]


@pytest.mark.parametrize("L", [0, 1, 5, 63, 64, 65, 200, 1000])
@pytest.mark.parametrize("N", [100, 70000])
def test_difflist_roundtrip(rng, L, N):
    if L > N:
        pytest.skip("more entries than samples")
    sids = np.sort(rng.choice(N, size=L, replace=False)).astype(np.uint32)
    gvals = rng.integers(0, 4, size=L).astype(np.uint8)
    blob = encode_difflist(sids, gvals, N)
    arr = np.frombuffer(blob, dtype=np.uint8)
    got_sids, got_gvals, end = decode_difflist(arr, 0, N, True)
    assert end == len(blob)
    np.testing.assert_array_equal(got_sids, sids)
    np.testing.assert_array_equal(got_gvals, gvals)


def test_pack_unpack(rng):
    codes = rng.integers(0, 4, size=(7, 1001)).astype(np.uint8)
    packed = pack.pack2(codes)
    assert packed.shape == (7, 251)
    np.testing.assert_array_equal(pack.unpack2(packed, 1001), codes)


def test_count_categories(rng):
    codes = rng.integers(0, 4, size=(11, 999)).astype(np.uint8)
    packed = pack.pack2(codes)
    counts = pack.count_categories_packed(packed, 999)
    for cat in range(4):
        np.testing.assert_array_equal(counts[:, cat], (codes == cat).sum(axis=1))


def _edge_matrix(rng, V, N):
    codes = rng.integers(0, 4, size=(V, N)).astype(np.uint8)
    codes[0] = 0  # all hom-ref -> difflist type 4, L=0
    codes[1] = 2  # all hom-alt -> type 6
    codes[2] = 3  # all missing -> type 7
    codes[3] = codes[4]  # identical adjacent -> LD candidate
    # mostly-homref sparse variant -> difflist
    sparse = np.zeros(N, dtype=np.uint8)
    sparse[rng.choice(N, size=max(1, N // 50), replace=False)] = rng.integers(1, 4, size=max(1, N // 50))
    codes[5] = sparse
    # two-category variant -> 1-bit representation
    codes[6] = rng.integers(0, 2, size=N)
    return codes


@pytest.mark.parametrize("N", [17, 253, 1000, 10007])
def test_pgen_write_read_roundtrip(rng, N):
    V = 40
    codes = _edge_matrix(rng, V, N)
    path = "/tmp/test_rt.pgen"
    with PgenWriter(path, N, V) as w:
        w.append_codes(codes)
    with PgenReader(path) as r:
        assert r.variant_ct == V and r.sample_ct == N
        got = r.read_codes(0, V)
        np.testing.assert_array_equal(got, codes)
        # random-access block reads agree too (LD chain resolution)
        got2 = r.read_codes(3, 4)
        np.testing.assert_array_equal(got2, codes[3:7])
        # representations actually vary
        mains = set((r.header.vrtypes & 7).tolist())
        assert 0 in mains and len(mains) >= 3


def test_pgen_compression_used(rng):
    # Low-MAF panel should compress far below dense size.
    N, V = 4000, 100
    codes = np.zeros((V, N), dtype=np.uint8)
    for v in range(V):
        idx = rng.choice(N, size=20, replace=False)
        codes[v, idx] = rng.integers(1, 3, size=20)
    path = "/tmp/test_sparse.pgen"
    with PgenWriter(path, N, V) as w:
        w.append_codes(codes)
    import os

    dense_size = V * ((N + 3) // 4)
    assert os.path.getsize(path) < dense_size // 3
    with PgenReader(path) as r:
        np.testing.assert_array_equal(r.read_codes(0, V), codes)


def test_bed_roundtrip(rng):
    N, V = 501, 23
    codes = rng.integers(0, 4, size=(V, N)).astype(np.uint8)
    packed = pack.pack2(codes)
    path = "/tmp/test_rt.bed"
    write_bed(path, packed)
    with PgenReader(path, sample_ct=N) as r:
        assert r.variant_ct == V
        np.testing.assert_array_equal(r.read_codes(0, V), codes)


def test_mode02_roundtrip(rng):
    N, V = 77, 13
    codes = rng.integers(0, 4, size=(V, N)).astype(np.uint8)
    path = "/tmp/test_rt02.pgen"
    write_pgen_simple(path, pack.pack2(codes), N)
    with PgenReader(path) as r:
        np.testing.assert_array_equal(r.read_codes(0, V), codes)


def test_reference_bed_fixture():
    """Decode a real .bed from the reference test data and sanity-check."""
    import os

    bed = "/root/reference/1.9/tests/dummy1/dummy1.bed"
    fam = "/root/reference/1.9/tests/dummy1/dummy1.fam"
    bim = "/root/reference/1.9/tests/dummy1/dummy1.bim"
    if not os.path.exists(bed):
        pytest.skip("reference fixture not present")
    n_samples = sum(1 for _ in open(fam))
    n_variants = sum(1 for _ in open(bim))
    with PgenReader(bed, sample_ct=n_samples) as r:
        assert r.variant_ct == n_variants
        codes = r.read_codes(0, n_variants)
        assert codes.shape == (n_variants, n_samples)
        assert codes.max() <= 3


def test_encoder_matches_plink2_small_panel(tmp_path):
    """Representation choice follows PwcAppendBiallelicGenovecMain's
    threshold rule (2.0/include/pgenlib_write.cc:915), so .pgen bytes
    match plink2 even on small panels where the byte-cost-optimal choice
    would differ; also checks the native batch encoder stays bit-identical
    to the Python scalar path."""
    import os
    import subprocess

    import numpy as np

    oracle = os.environ.get("PLINK2_ORACLE",
                            "/tmp/oracle/2.0/build_dynamic/plink2")
    if not os.path.exists(oracle):
        import pytest as _p

        _p.skip("no plink2 oracle")
    d = tmp_path
    subprocess.run([oracle, "--dummy", "40", "50", "0.05", "--seed", "77",
                    "--out", str(d / "sp")], check=True,
                   capture_output=True)
    subprocess.run([oracle, "--pfile", str(d / "sp"), "--export", "vcf",
                    "--out", str(d / "spv")], check=True,
                   capture_output=True)
    subprocess.run([oracle, "--vcf", str(d / "spv.vcf"), "--make-pgen",
                    "--out", str(d / "osp")], check=True,
                   capture_output=True)
    from plink_tpu.cli import main

    assert main(["--vcf", str(d / "spv.vcf"), "--make-pgen",
                 "--out", str(d / "tsp"), "--silent"]) == 0
    assert (d / "osp.pgen").read_bytes() == (d / "tsp.pgen").read_bytes()

    from plink_tpu.io.pgen_write import PgenWriter

    rng = np.random.default_rng(1)
    for N in (13, 150, 513):
        codes = rng.choice(4, size=(40, N),
                           p=[0.5, 0.2, 0.25, 0.05]).astype(np.uint8)
        fa, fb = str(d / f"a{N}.pgen"), str(d / f"b{N}.pgen")
        with PgenWriter(fa, N, 40) as w:
            w.append_codes(codes)          # native batch path
        with PgenWriter(fb, N, 40) as w:
            for r in codes:
                w._append_one(r)           # Python scalar path
        assert open(fa, "rb").read() == open(fb, "rb").read(), N

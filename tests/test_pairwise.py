"""KING / GRM / PCA kernel tests: numpy references + multi-tile coverage +
differential checks against the plink2 oracle when present (mirrors the
reference's tolerance-compare strategy, 2.0/Tests/TEST_PHASED_VCF/
pca_compare.py)."""

import os
import subprocess

import numpy as np
import pytest

from conftest import random_codes

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def _king_reference(codes):
    """Brute-force KING accumulators. codes [V, N] uint8 pgen encoding."""
    V, N = codes.shape
    het = codes == 1
    hom = (codes == 0) | (codes == 2)
    valid = codes != 3
    ibs0 = np.zeros((N, N), dtype=np.int64)
    hethet = het.T.astype(np.int64) @ het.astype(np.int64)
    nsnp = valid.T.astype(np.int64) @ valid.astype(np.int64)
    het_r_hom_c = het.T.astype(np.int64) @ hom.astype(np.int64)
    homref = codes == 0
    homalt = codes == 2
    ibs0 = (
        homref.T.astype(np.int64) @ homalt.astype(np.int64)
        + homalt.T.astype(np.int64) @ homref.astype(np.int64)
    )
    return ibs0, hethet, het_r_hom_c, nsnp


def _pack(codes):
    from plink_tpu.ops.pairwise import _pack_np

    n = codes.shape[1]
    return _pack_np(codes, -(-n // 4) * 4)


class FakeDS:
    """Minimal Dataset stand-in for PackedDevice."""

    def __init__(self, codes):
        self.codes = codes
        self.raw_variant_ct, _ = codes.shape
        self.raw_sample_ct = codes.shape[1]
        self.sample_mask = np.ones(self.raw_sample_ct, dtype=bool)

    def iter_packed_blocks(self, block_size):
        for v0 in range(0, self.raw_variant_ct, block_size):
            yield v0, _pack(self.codes[v0 : v0 + block_size])


@pytest.mark.parametrize("tile,vb", [(16, 8), (64, 32)])
def test_king_gram_tiled_matches_reference(geno_factory, tile, vb):
    from plink_tpu.ops.pairwise import (
        PackedDevice,
        iter_lower_tiles,
        king_counts_from_gram,
        king_gram_tile,
    )

    codes = geno_factory(37, 50, missing_rate=0.15)
    vmask = np.ones(37, dtype=bool)
    vmask[5:9] = False  # exercise variant exclusion
    ds = FakeDS(codes)
    pd = PackedDevice(ds, vmask, vb=vb, tile=tile)
    n = pd.n
    ibs0 = np.zeros((n, n), np.int64)
    hethet = np.zeros((n, n), np.int64)
    hrc = np.zeros((n, n), np.int64)
    nsnp = np.zeros((n, n), np.int64)
    s = pd.tile
    for r0, c0 in iter_lower_tiles(pd.npad, s):
        g = np.asarray(king_gram_tile(pd.packed, pd.vmask, r0, c0, s, s))
        c = king_counts_from_gram(g, s, s)
        rm, cm = min(r0 + s, n), min(c0 + s, n)
        ibs0[r0:rm, c0:cm] = c["ibs0"][: rm - r0, : cm - c0]
        hethet[r0:rm, c0:cm] = c["hethet"][: rm - r0, : cm - c0]
        hrc[r0:rm, c0:cm] = c["het_r_hom_c"][: rm - r0, : cm - c0]
        nsnp[r0:rm, c0:cm] = c["nsnp"][: rm - r0, : cm - c0]
    ref = _king_reference(codes[vmask])
    tril = np.tril_indices(n, -1)
    assert (ibs0[tril] == ref[0].T[tril]).all()
    assert (hethet[tril] == ref[1].T[tril]).all()
    # het_r_hom_c[i, j] = het of row sample i x hom of col sample j
    assert (hrc[tril] == ref[2][tril]).all()
    assert (nsnp[tril] == ref[3].T[tril]).all()


def test_grm_tile_matches_numpy(geno_factory):
    from plink_tpu.ops.pairwise import (
        PackedDevice,
        grm_coefs,
        grm_tile,
        iter_lower_tiles,
    )
    import jax.numpy as jnp

    codes = geno_factory(64, 30, missing_rate=0.1)
    V, N = codes.shape
    vmask = np.ones(V, dtype=bool)
    valid = codes != 3
    x = np.where(valid, codes, 0).astype(np.float64)
    p = x.sum(1) / (2 * valid.sum(1))
    coefs = grm_coefs(p, np.zeros(V, bool), vmask)
    ds = FakeDS(codes)
    pd = PackedDevice(ds, vmask, vb=16, tile=16)
    cpad = np.zeros((pd.nblocks * pd.vb, 3), np.float32)
    cpad[:V] = coefs
    coef_dev = jnp.asarray(cpad.reshape(pd.nblocks, pd.vb, 3))
    n = pd.n
    acc = np.zeros((n, n))
    nm = np.zeros((n, n), np.int64)
    for r0, c0 in iter_lower_tiles(pd.npad, pd.tile):
        a, m = grm_tile(pd.packed, coef_dev, pd.vmask, r0, c0, pd.tile, pd.tile)
        rm, cm = min(r0 + pd.tile, n), min(c0 + pd.tile, n)
        acc[r0:rm, c0:cm] = np.asarray(a)[: rm - r0, : cm - c0]
        nm[r0:rm, c0:cm] = np.asarray(m)[: rm - r0, : cm - c0]
    # numpy reference: normed dosage with missing->0; near-zero-variance
    # variants zero-fill like the reference (ExpandCenteredVarmaj)
    var = 2 * p * (1 - p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_sd = np.where(var > 2.0 ** -44, 1.0 / np.sqrt(var), 0.0)
    inv_sd = np.nan_to_num(inv_sd)
    z = np.where(valid, (x - 2 * p[:, None]) * inv_sd[:, None], 0.0)
    z = np.nan_to_num(z)
    ref_acc = z.T @ z
    ref_nm = valid.T.astype(np.int64) @ valid.astype(np.int64)
    tril = np.tril_indices(n)
    assert (nm[tril] == ref_nm[tril]).all()
    np.testing.assert_allclose(acc[tril], ref_acc[tril], rtol=0, atol=2e-4)


def test_pca_exact_matches_numpy(tmp_path, geno_factory):
    from plink_tpu.cli import main

    codes = geno_factory(200, 40, missing_rate=0.05)
    _write_fileset(tmp_path / "d", codes)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "d", "--pca", "4", "--out", "e"]) == 0
        assert main(["--pfile", "d", "--make-rel", "square", "--out", "e"]) == 0
    finally:
        os.chdir(old)
    rel = np.loadtxt(tmp_path / "e.rel")
    w, v = np.linalg.eigh(rel)
    ref_vals = w[::-1][:4]
    ref_vecs = v[:, ::-1][:, :4]
    got_vals = np.loadtxt(tmp_path / "e.eigenval")
    got = np.genfromtxt(tmp_path / "e.eigenvec", skip_header=1, usecols=(1, 2, 3, 4))
    np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-4)
    for k in range(4):
        dot = abs(np.dot(got[:, k], ref_vecs[:, k]))
        assert dot > 0.999, f"PC{k + 1} subspace mismatch ({dot})"


def test_pca_approx_close_to_exact(tmp_path, rng):
    from plink_tpu.cli import main

    # structured panel (3 subpopulations) so the top PCs are well-separated;
    # the randomized range finder needs spectral decay (the reference
    # recommends approx only >5000 samples, plink2_matrix_calc.cc:5699)
    V, N = 400, 90
    base = rng.uniform(0.1, 0.9, size=(V, 1))
    shift = rng.normal(0, 0.25, size=(V, 3))
    group = np.repeat([0, 1, 2], N // 3)
    freq = np.clip(base + shift[:, group], 0.02, 0.98)
    codes = (
        (rng.random((V, N)) < freq).astype(np.uint8)
        + (rng.random((V, N)) < freq).astype(np.uint8)
    )
    _write_fileset(tmp_path / "d", codes)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "d", "--pca", "3", "--seed", "5", "--out", "ex"]) == 0
        assert main(
            ["--pfile", "d", "--pca", "3", "approx", "--seed", "5", "--out", "ap"]
        ) == 0
    finally:
        os.chdir(old)
    ev_e = np.loadtxt(tmp_path / "ex.eigenval")
    ev_a = np.loadtxt(tmp_path / "ap.eigenval")
    # 3 groups -> 2 structure PCs recovered tightly; PC3 sits in the noise
    # bulk where randomized projection is only approximate
    np.testing.assert_allclose(ev_a[:2], ev_e[:2], rtol=5e-3)
    np.testing.assert_allclose(ev_a[2], ev_e[2], rtol=0.15)
    ve = np.genfromtxt(tmp_path / "ex.eigenvec", skip_header=1, usecols=(1, 2, 3))
    va = np.genfromtxt(tmp_path / "ap.eigenvec", skip_header=1, usecols=(1, 2, 3))
    for k in range(2):
        assert abs(np.dot(ve[:, k], va[:, k])) > 0.99


def _write_fileset(prefix, codes):
    from plink_tpu.io.pgen_write import PgenWriter
    from plink_tpu.io.psam import PhenoCol, SampleInfo, write_psam
    from plink_tpu.io.pvar import VariantInfo, write_pvar

    prefix = str(prefix)
    V, N = codes.shape
    with PgenWriter(prefix + ".pgen", N, V) as w:
        w.append_codes(codes)
    vi = VariantInfo(
        chrom=np.ones(V, dtype=np.int16),
        pos=np.arange(1, V + 1, dtype=np.int32),
        vid=np.array([f"v{i}" for i in range(V)], dtype=object),
        ref=np.full(V, "A", dtype=object),
        alt=np.full(V, "C", dtype=object),
    )
    write_pvar(prefix + ".pvar", vi)
    si = SampleInfo(
        fid=np.full(N, "0", dtype=object),
        iid=np.array([f"s{i}" for i in range(N)], dtype=object),
        sid=None,
        pat=None,
        mat=None,
        sex=np.array([1 + (i % 2) for i in range(N)], dtype=np.int8),
        phenos={},
        has_fid=False,
    )
    write_psam(prefix + ".psam", si)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
class TestKingGrmDifferential:
    @pytest.fixture(scope="class")
    def panel(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("kingdiff")
        subprocess.run(
            [ORACLE, "--dummy", "120", "800", "0.07", "--seed", "99", "--out", "pp"],
            cwd=d, check=True, capture_output=True,
        )
        return d

    def _run_both(self, d, flags, stem_o, stem_t):
        from plink_tpu.cli import main

        subprocess.run(
            [ORACLE] + flags + ["--out", stem_o], cwd=d, check=True,
            capture_output=True,
        )
        old = os.getcwd()
        os.chdir(d)
        try:
            assert main(flags + ["--out", stem_t]) == 0
        finally:
            os.chdir(old)

    def test_king_table_and_matrix(self, panel):
        d = panel
        self._run_both(d, ["--pfile", "pp", "--make-king-table"], "ok", "tk")
        assert (d / "ok.kin0").read_bytes() == (d / "tk.kin0").read_bytes()
        self._run_both(d, ["--pfile", "pp", "--make-king"], "okm", "tkm")
        assert (d / "okm.king").read_bytes() == (d / "tkm.king").read_bytes()
        assert (d / "okm.king.id").read_bytes() == (d / "tkm.king.id").read_bytes()

    def test_king_cutoff(self, panel):
        d = panel
        self._run_both(d, ["--pfile", "pp", "--king-cutoff", "0.05"], "oc", "tc")
        for ext in ("king.cutoff.in.id", "king.cutoff.out.id"):
            assert (d / f"oc.{ext}").read_bytes() == (d / f"tc.{ext}").read_bytes()

    def test_grm_bin(self, panel):
        d = panel
        self._run_both(d, ["--pfile", "pp", "--make-grm-bin"], "og", "tg")
        a = np.fromfile(d / "og.grm.bin", dtype=np.float32)
        b = np.fromfile(d / "tg.grm.bin", dtype=np.float32)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)
        an = np.fromfile(d / "og.grm.N.bin", dtype=np.float32)
        bn = np.fromfile(d / "tg.grm.N.bin", dtype=np.float32)
        assert (an == bn).all()
        assert (d / "og.grm.id").read_bytes() == (d / "tg.grm.id").read_bytes()


def test_grm_parallel_pieces(tmp_path):
    """--parallel k n --make-grm-bin: ParallelBounds(start=0) row pieces
    with .<k> suffixes whose concatenation equals the full triangle
    (ref CalcGrm, 2.0/plink2_matrix_calc.cc:4597,4952-4981); piece sizes
    verified byte-identical to plink2's on the same panel."""
    import os

    from plink_tpu.cli import main

    pfx = str(tmp_path / "g")
    assert main(["--dummy", "151", "300", "0.03", "--seed", "9",
                 "--out", pfx, "--silent"]) == 0
    assert main(["--pfile", pfx, "--make-grm-bin", "--out", pfx + "f",
                 "--silent"]) == 0
    for k in (1, 2, 3):
        assert main(["--pfile", pfx, "--make-grm-bin", "--parallel",
                     str(k), "3", "--out", pfx + "p", "--silent"]) == 0
    for ext in (".grm.bin", ".grm.N.bin"):
        full = open(pfx + "f" + ext, "rb").read()
        cat = b"".join(open(f"{pfx}p{ext}.{k}", "rb").read()
                       for k in (1, 2, 3))
        assert full == cat, ext
    assert os.path.exists(pfx + "p.grm.id")

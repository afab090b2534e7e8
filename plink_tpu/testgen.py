"""Synthetic panels with PLANTED population structure.

The --dummy generator (commands/dummy.py; ref GenerateDummy,
2.0/plink2_import.cc:16326) draws i.i.d. variants, so its GRM spectrum is
a pure Marchenko-Pastur bulk: the top-k principal components are not
identifiable, and comparing two randomized PCA implementations
per-component on such a panel is meaningless (any rotation of the bulk
subspace is an equally good answer).

make_structured_panel() plants k latent axes of geometrically decaying
strength: per-sample scores u ~ N(0, I), per-variant loadings scaled so
axis j contributes allele-frequency shifts of s.d. scale_j.  The resulting
GRM spectrum has k separated spikes above the bulk edge, every spike has a
multiplicative eigengap, and two independent randomized SVD
implementations (ours and plink2's, ref CalcPca approx,
2.0/plink2_matrix_calc.cc:5697) recover the SAME top-k components up to
sign -- making per-component |correlation| a sound parity check.  Used by
bench.py's pca_100k config.
"""

from __future__ import annotations

import numpy as np


def make_structured_panel(
    prefix: str,
    sample_ct: int,
    variant_ct: int,
    k: int = 10,
    seed: int = 7,
    scale_top: float = 0.032,
    decay: float = 0.84,
    miss_rate: float = 0.0,
) -> None:
    """Write <prefix>.pgen/.pvar/.psam with k planted structure axes.

    Eigenvalue of planted axis j (in plink2 .eigenval units, i.e. of
    Z^T Z / M) is approximately 4 * N * scale_j^2 / E[2p(1-p)]; with the
    defaults at N=100k the spikes run ~1000 down to ~30 against a bulk
    edge of (1 + sqrt(N/M))^2 ~ 8, with ~1.5x gaps between consecutive
    spikes.
    """
    from .io.pgen_write import PgenWriter
    from .io.psam import PhenoCol, SampleInfo, write_psam
    from .io.pvar import VariantInfo, write_pvar

    N, M = sample_ct, variant_ct
    rng = np.random.default_rng(seed)
    scales = scale_top * decay ** np.arange(k)
    u = rng.standard_normal((N, k)).astype(np.float32)  # sample scores
    base = rng.uniform(0.1, 0.5, size=M).astype(np.float32)

    vi = VariantInfo(
        chrom=np.ones(M, dtype=np.int16),
        pos=np.arange(1, M + 1, dtype=np.int32),
        vid=np.array([f"snp{i}" for i in range(M)], dtype=object),
        ref=np.full(M, "B", dtype=object),
        alt=np.full(M, "A", dtype=object),
    )
    iid = np.array([f"per{i}" for i in range(N)], dtype=object)
    phenos = {
        "PHENO1": PhenoCol(
            "PHENO1", "cc", rng.integers(0, 2, size=N).astype(np.float64),
            np.ones(N, dtype=bool),
        )
    }
    si = SampleInfo(
        fid=np.full(N, "0", dtype=object), iid=iid, sid=None, pat=None,
        mat=None, sex=rng.integers(1, 3, size=N).astype(np.int8),
        phenos=phenos, has_fid=False,
    )

    block = max(64, min(2048, (1 << 27) // max(N, 1)))
    with PgenWriter(prefix + ".pgen", N, M) as w:
        for v0 in range(0, M, block):
            vct = min(block, M - v0)
            wl = rng.standard_normal((vct, k)).astype(np.float32) \
                * scales[None, :].astype(np.float32)
            p = base[v0 : v0 + vct, None] + wl @ u.T  # [vct, N]
            np.clip(p, 0.01, 0.99, out=p)
            codes = (
                (rng.random((vct, N), dtype=np.float32) < p).astype(np.uint8)
                + (rng.random((vct, N), dtype=np.float32) < p).astype(np.uint8)
            )
            if miss_rate > 0.0:
                codes[rng.random((vct, N), dtype=np.float32) < miss_rate] = 3
            w.append_codes(codes)
    write_pvar(prefix + ".pvar", vi)
    write_psam(prefix + ".psam", si)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("prefix")
    ap.add_argument("sample_ct", type=int)
    ap.add_argument("variant_ct", type=int)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--miss-rate", type=float, default=0.0)
    a = ap.parse_args(argv)
    make_structured_panel(a.prefix, a.sample_ct, a.variant_ct, k=a.k,
                          seed=a.seed, miss_rate=a.miss_rate)


if __name__ == "__main__":
    main()

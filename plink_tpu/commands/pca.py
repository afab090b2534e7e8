"""--pca [k] [approx]: principal component analysis.

Behavior reference: CalcPca (2.0/plink2_matrix_calc.cc:5594).
- exact (default): full eigendecomposition of the missing-corrected GRM
  (host float64 eigh, mirroring the reference's LAPACK dsyevr path :5995).
- approx: Halko-style randomized range finder (:5697-5930): pc_ct+1
  power-iteration blocks of width 2*pc_ct concatenated into the projection
  QQ, X-projection SVD, eigenvalues = s^2 / variant_ct.  Power iterations
  stream the packed genotype tensor on device (ops/pca.py).

Outputs: .eigenvec (header #[FID\t]IID\tPC1.., unit-norm sample
eigenvectors, dtoa_g) and .eigenval (one eigenvalue per line).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import PackedDevice, grm_coefs
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs


def run_pca(ds: Dataset, cfg, log: RunLogger, grm: np.ndarray | None = None) -> None:
    pc_ct = cfg.pca
    inc = np.flatnonzero(ds.sample_mask)
    n = inc.size
    if pc_ct >= n:
        raise ValueError(f"--pca {pc_ct}: requires more samples than PCs")
    if cfg.pca_approx:
        eigvals, eigvecs = _pca_approx(ds, cfg, pc_ct, log)
    else:
        if grm is None:
            from .grm import _grm_matrix

            grm, _, _ = _grm_matrix(ds, cfg, log)
        full = np.tril(grm) + np.tril(grm, -1).T
        w, v = np.linalg.eigh(full)
        eigvals = w[::-1][:pc_ct]
        eigvecs = v[:, ::-1][:, :pc_ct]
    _write_eig(ds, cfg, log, inc, eigvals, eigvecs, pc_ct)
    if getattr(cfg, "pca_allele_wts", False):
        _write_allele_wts(ds, cfg, log, inc, eigvals, eigvecs, pc_ct)


def _pca_approx(ds: Dataset, cfg, pc_ct: int, log: RunLogger):
    import jax.numpy as jnp

    from ..ops.pca import x_apply_any, xt_apply_any, xtx_apply_any

    freqs = alt_allele_freqs(ds, founders_only=not cfg.nonfounders)
    vmask = ds.variant_mask.copy()
    pd = PackedDevice(ds, vmask, tile=1 << 30)  # single sample tile
    coefs = grm_coefs(freqs, np.zeros(len(freqs), dtype=bool), vmask)
    npadv = pd.nblocks * pd.vb
    cpad = np.zeros((npadv, 3), dtype=np.float32)
    cpad[: coefs.shape[0]] = coefs
    coef_dev = jnp.asarray(cpad.reshape(pd.nblocks, pd.vb, 3))

    n, npad = pd.n, pd.npad
    smask = np.zeros(npad, np.float32)
    smask[:n] = 1.0
    smask_dev = jnp.asarray(smask)
    variant_ct = int(vmask.sum())
    L = 2 * pc_ct
    rng = np.random.default_rng(cfg.seed if cfg.seed is not None else 0)
    g0 = rng.standard_normal((npad, L)).astype(np.float32)
    g0[n:] = 0.0
    blocks = [g0]
    cur = jnp.asarray(g0)
    inv_m = 1.0 / variant_ct
    for _ in range(pc_ct):
        cur = xtx_apply_any(pd.packed, coef_dev, smask_dev, cur) * inv_m
        blocks.append(np.asarray(cur))
    qq = np.concatenate(blocks, axis=1).astype(np.float64)  # [npad, (pc_ct+1)*L]
    qq[n:] = 0.0
    qq, _ = np.linalg.qr(qq)
    b = np.asarray(
        x_apply_any(pd.packed, coef_dev, smask_dev, jnp.asarray(qq.astype(np.float32)))
    ).reshape(npadv, qq.shape[1])[: len(freqs)]
    # SVD of the projected matrix ("Recovering top PCs from range
    # approximation", ref :5867)
    _, s, vt = np.linalg.svd(b.astype(np.float64), full_matrices=False)
    eigvals = (s[:pc_ct] ** 2) / variant_ct
    eigvecs = (qq @ vt.T[:, :pc_ct])[:n]
    # re-normalize (qq columns orthonormal => already unit, up to fp error)
    eigvecs /= np.linalg.norm(eigvecs, axis=0, keepdims=True)
    log.log(f"--pca approx: {variant_ct} variants, {pc_ct} PCs extracted.")
    return eigvals, eigvecs


def _write_eig(ds, cfg, log, inc, eigvals, eigvecs, pc_ct) -> None:
    si = ds.si
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
    with open(cfg.out + ".eigenval", "w") as f:
        for w in eigvals:
            f.write(g6(w) + "\n")
    with open(cfg.out + ".eigenvec", "w") as f:
        hdr = ("#FID\tIID" if use_fid else "#IID") + "".join(
            f"\tPC{k + 1}" for k in range(pc_ct)
        )
        f.write(hdr + "\n")
        for r, i in enumerate(inc):
            idp = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            f.write(idp + "".join("\t" + g6(v) for v in eigvecs[r]) + "\n")
    log.log(
        f"--pca: Eigenvector{'s' if pc_ct != 1 else ''} written to "
        f"{cfg.out}.eigenvec, and eigenvalue{'s' if pc_ct != 1 else ''} to "
        f"{cfg.out}.eigenval ."
    )


def _write_allele_wts(ds, cfg, log, inc, eigvals, eigvecs, pc_ct) -> None:
    """--pca allele-wts: per-allele PC loadings (FlushAlleleWts,
    2.0/plink2_matrix_calc.cc:5452): weight for PC k = (Z_v . u_k) /
    sqrt(eigval_k) with Z the (2p,sqrt(2pq))-normalized dosage used for the
    GRM; the ALT-allele row carries +w and the REF row -w.  (The reference
    build used as oracle lacks LAPACK and cannot run --pca, so this output
    is verified by reconstruction tests instead of byte-diffing.)"""
    import jax.numpy as jnp

    from ..ops.pca import x_apply_any

    freqs = alt_allele_freqs(ds, founders_only=not cfg.nonfounders)
    vmask = ds.variant_mask
    pd = PackedDevice(ds, vmask, tile=1 << 30)
    coefs = grm_coefs(freqs, np.zeros(len(freqs), dtype=bool), vmask)
    npadv = pd.nblocks * pd.vb
    cpad = np.zeros((npadv, 3), dtype=np.float32)
    cpad[: coefs.shape[0]] = coefs
    coef_dev = jnp.asarray(cpad.reshape(pd.nblocks, pd.vb, 3))
    n, npad = pd.n, pd.npad
    smask = np.zeros(npad, np.float32)
    smask[:n] = 1.0
    upad = np.zeros((npad, pc_ct), np.float32)
    upad[:n] = eigvecs
    w = np.asarray(
        x_apply_any(pd.packed, coef_dev, jnp.asarray(smask), jnp.asarray(upad))
    ).reshape(npadv, pc_ct)
    sel = np.flatnonzero(vmask)
    w = w[: len(np.flatnonzero(vmask))] if False else w
    inv_sqrt = 1.0 / np.sqrt(np.maximum(eigvals, 1e-300))
    vi = ds.vi
    from .basic_reports import _provref_strs

    prov_hdr, prov_fn = _provref_strs(ds)
    alt1 = vi.alt1()
    path = cfg.out + ".eigenvec.allele"
    with open(path, "w") as f:
        f.write("#CHROM\tID\tREF\tALT" + prov_hdr + "\tA1"
                + "".join(f"\tPC{k + 1}" for k in range(pc_ct)) + "\n")
        for r, v in enumerate(sel):
            meta = (f"{vi.chr_info.name(vi.chrom[v])}\t{vi.vid[v]}\t"
                    f"{vi.ref[v]}\t{vi.alt[v]}{prov_fn(int(v))}")
            # biallelic rows carry +/- 0.5 * w / sqrt(lambda) (ref
            # FlushAlleleWts mult, 2.0/plink2_matrix_calc.cc:5554-5562);
            # sign convention (oracle-diffed): REF = +0.5 w / sqrt(l),
            # ALT the negation
            wrow = 0.5 * w[r] * inv_sqrt
            f.write(meta + f"\t{vi.ref[v]}"
                    + "".join("\t" + g6(x) for x in wrow) + "\n")
            f.write(meta + f"\t{alt1[v]}"
                    + "".join("\t" + g6(-x) for x in wrow) + "\n")
    log.log(f"--pca allele-wts: Weights written to {path} .")

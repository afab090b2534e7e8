"""--make-grm-bin / --make-grm-list / --make-rel / --pca.

Behavior reference: CalcGrm (2.0/plink2_matrix_calc.cc:4555) with
ExpandCenteredVarmaj normalization (:3839) and per-pair observed-variant
denominators (:4769-4781); CalcPca (:5594) for eigen decomposition.
Compute is the f32 HIGHEST-precision Z^T Z matmul + int8 validity Gram in
ops/pairwise.py (MXU) instead of dsyrk rank-k blocks.

Output formats (verified against a locally built plink2):
- .grm.id : FID\tIID lines, no header.
- .grm    : "i\tj\tnsnp\tvalue" 1-based lower triangle incl. diagonal.
- .grm.bin / .grm.N.bin : float32 LE lower triangle incl. diagonal.
- .rel / .rel.id : text relationship matrix (triangle incl. diagonal by
  default; 'square'/'square0' modifiers), GCTA-compatible.
- .eigenvec / .eigenval : unit-norm GRM eigenvectors (sample-major) and
  eigenvalues; exact mode = full eigendecomposition of the GRM.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import PackedDevice, grm_coefs, grm_tile_any, iter_lower_tiles
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs


def _grm_matrix(ds: Dataset, cfg, log: RunLogger, tile: int = 2048):
    """Compute the full GRM [n, n] float64 (lower triangle valid) and the
    per-pair observed counts [n, n] int64."""
    freqs = alt_allele_freqs(ds, founders_only=not cfg.nonfounders)
    vmask = ds.variant_mask.copy()
    pd = PackedDevice(ds, vmask, tile=tile)
    coefs = grm_coefs(
        freqs, np.zeros(len(freqs), dtype=bool), vmask
    )  # genome-wide is_haploid only (ref :4694); humans => diploid everywhere
    npadv = pd.nblocks * pd.vb
    cpad = np.zeros((npadv, 3), dtype=np.float32)
    cpad[: coefs.shape[0]] = coefs
    coef_blocks = np.asarray(cpad).reshape(pd.nblocks, pd.vb, 3)
    import jax.numpy as jnp

    coef_dev = jnp.asarray(coef_blocks)

    n = pd.n
    s = pd.tile
    grm = np.zeros((n, n), dtype=np.float64)
    nm = np.zeros((n, n), dtype=np.int64)
    # dispatch-ahead pipeline: device computes tile k+1..k+W while tile k's
    # result streams back (fetch latency dominates on tunnel-attached TPUs)
    from collections import deque

    window = 8
    q: deque = deque()

    def _drain_one():
        r0, c0, acc, cnt = q.popleft()
        rmax, cmax = min(r0 + s, n), min(c0 + s, n)
        if rmax <= r0 or cmax <= c0:
            return
        grm[r0:rmax, c0:cmax] = np.asarray(acc)[: rmax - r0, : cmax - c0]
        nm[r0:rmax, c0:cmax] = np.asarray(cnt)[: rmax - r0, : cmax - c0]

    # small panels keep f64 numerators (byte parity); u16 counts need
    # variant_ct < 65536
    fetch32 = n > 8192 and int(vmask.sum()) < 65536
    for r0, c0 in iter_lower_tiles(pd.npad, s):
        acc, cnt = grm_tile_any(pd.packed, coef_dev, pd.vmask, r0, c0, s, s,
                                fetch32)
        q.append((r0, c0, acc, cnt))
        if len(q) >= window:
            _drain_one()
    while q:
        _drain_one()
    with np.errstate(divide="ignore", invalid="ignore"):
        grm = grm / nm
    return grm, nm, pd


def _write_id_file(path: str, si, inc) -> None:
    with open(path, "w") as f:
        for i in inc:
            f.write(f"{si.fid[i]}\t{si.iid[i]}\n")


def run_grm_pca(ds: Dataset, cfg, log: RunLogger) -> None:
    inc = np.flatnonzero(ds.sample_mask)
    n = inc.size
    want_grm_out = cfg.make_grm_bin or cfg.make_grm_list or cfg.make_rel
    want_exact_pca = cfg.pca is not None and not cfg.pca_approx
    grm = None
    if want_grm_out or want_exact_pca:
        grm, nm, _ = _grm_matrix(ds, cfg, log)
        log.log(f"{ds.variant_ct} variants used in GRM computation.")

    si = ds.si
    if cfg.make_grm_list:
        path = cfg.out + ".grm"
        with open(path, "w") as f:
            for i in range(n):
                for j in range(i + 1):
                    f.write(f"{i + 1}\t{j + 1}\t{nm[i, j]}\t{g6(grm[i, j])}\n")
        _write_id_file(cfg.out + ".grm.id", si, inc)
        log.log(f"--make-grm-list: GRM written to {path} + {cfg.out}.grm.id .")
    if cfg.make_grm_bin:
        # stream the lower triangle in row blocks (no 2x in-memory copy of
        # the multi-GB triangle at biobank n)
        with open(cfg.out + ".grm.bin", "wb") as fb, \
                open(cfg.out + ".grm.N.bin", "wb") as fn:
            bs = 1024
            for i0 in range(0, n, bs):
                i1 = min(i0 + bs, n)
                fb.write(np.concatenate(
                    [grm[i, : i + 1] for i in range(i0, i1)]
                ).astype("<f4").tobytes())
                fn.write(np.concatenate(
                    [nm[i, : i + 1] for i in range(i0, i1)]
                ).astype("<f4").tobytes())
        _write_id_file(cfg.out + ".grm.id", si, inc)
        log.log(
            f"--make-grm-bin: GRM written to {cfg.out}.grm.bin + "
            f"{cfg.out}.grm.N.bin + {cfg.out}.grm.id ."
        )
    if cfg.make_rel:
        shape = cfg.make_rel
        path = cfg.out + ".rel"
        with open(path, "w") as f:
            if shape == "square":
                full = np.tril(grm) + np.tril(grm, -1).T
                for i in range(n):
                    f.write("\t".join(g6(v) for v in full[i]) + "\n")
            elif shape == "square0":
                for i in range(n):
                    row = [g6(grm[i, j]) for j in range(i + 1)] + ["0"] * (n - i - 1)
                    f.write("\t".join(row) + "\n")
            else:  # triangle (default)
                for i in range(n):
                    f.write("\t".join(g6(grm[i, j]) for j in range(i + 1)) + "\n")
        _write_id_file(cfg.out + ".rel.id", si, inc)
        log.log(f"--make-rel: Matrix written to {path} + {cfg.out}.rel.id .")

    if cfg.pca is not None:
        from .pca import run_pca

        run_pca(ds, cfg, log, grm=grm)

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
from ..ops.pairwise import (
    PackedDevice,
    grm_chunk_any,
    grm_coefs,
    grm_tile_any,
    iter_lower_tiles,
    sample_miss_counts_any,
    )
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs


def _grm_setup(ds: Dataset, cfg, tile: int):
    """Shared PackedDevice + per-code normed-dosage coefficients."""
    import jax.numpy as jnp

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
    coef_dev = jnp.asarray(coef_blocks)
    return pd, coef_dev


def _stream_grm_bin(ds: Dataset, cfg, log: RunLogger, tile: int = 2048) -> None:
    """--make-grm-bin without materializing the N x N matrix anywhere.

    The device streams [tile, chunk] output chunks (f32 GRM ratio + u8
    joint-missing delta = 5 bytes/pair over the wire); a writer thread
    reconstructs the .grm.N.bin counts and appends the row-major lower
    triangle while the next chunks are still in flight.  Matches the old
    in-memory path byte-for-byte (same f32-HIGHEST block sums, f64 carry,
    f64 division).
    """
    import queue
    import threading
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    import os
    import time as _time

    _t0 = _time.time()
    _dbg = os.environ.get("PLINK_TPU_TIMING")

    def _tlog(msg):
        if _dbg:
            print(f"[grm +{_time.time()-_t0:7.2f}s] {msg}", file=__import__("sys").stderr)

    pd, coef_dev = _grm_setup(ds, cfg, tile)
    _tlog("setup done")
    n, s = pd.n, pd.tile
    # --parallel k n: compute/write only the ParallelBounds(start=0) row
    # piece, suffixing outputs .<k> (ref CalcGrm TriangleFill2 outer
    # bounds + output naming, 2.0/plink2_matrix_calc.cc:4597,4952-4981;
    # pieces concatenate to the full triangle)
    row_lo, row_hi = 0, n
    suffix = ""
    par = getattr(cfg, "parallel", None)
    if par is not None:
        from .king import _parallel_bounds

        k_, tot_ = par
        row_lo, row_hi = _parallel_bounds(n, 0, k_ - 1, tot_)
        suffix = f".{k_}"
    c = min(4 * s, pd.npad) if pd.npad > s else s
    miss_dev = sample_miss_counts_any(pd.packed, pd.vmask)
    mv = pd.variant_ct
    mv_dev = jnp.asarray(float(mv), jnp.float64)
    m_host = np.asarray(miss_dev)[:n].astype(np.int32)

    err: list[BaseException] = []
    writeq: queue.Queue = queue.Queue(maxsize=2)

    def _writer():
        try:
            with open(cfg.out + ".grm.bin" + suffix, "wb") as fb, \
                    open(cfg.out + ".grm.N.bin" + suffix, "wb") as fn:
                while True:
                    item = writeq.get()
                    if item is None:
                        return
                    r0, parts = item
                    rmax = min(r0 + s, row_hi)
                    rows, cols = rmax - r0, rmax  # row i needs cols 0..i
                    g = np.empty((rows, cols), np.float32)
                    jm = np.empty((rows, cols), np.int32)
                    for a0, ga, ja in parts:  # overlaps rewrite same values
                        hi = min(a0 + c, cols)
                        g[:, a0:hi] = ga[:rows, : hi - a0]
                        jm[:, a0:hi] = ja[:rows, : hi - a0]
                    nm = (
                        mv - m_host[r0:rmax, None] - m_host[None, :cols] + jm
                    ).astype(np.float32)
                    i0 = max(0, row_lo - r0)  # first strip of a piece
                    total = (r0 + i0 + 1 + rmax) * (rows - i0) // 2
                    gflat = np.empty(total, np.float32)
                    nflat = np.empty(total, np.float32)
                    off = 0
                    for i in range(i0, rows):
                        ln = r0 + i + 1
                        gflat[off : off + ln] = g[i, :ln]
                        nflat[off : off + ln] = nm[i, :ln]
                        off += ln
                    fb.write(gflat.tobytes())
                    fn.write(nflat.tobytes())
        except BaseException as e:  # surface in the main thread
            err.append(e)

    wt = threading.Thread(target=_writer, daemon=True)
    wt.start()

    # chunk grid: anchors every c columns, the last anchor pulled back so a
    # fixed-width window stays in bounds (multiple-of-4 for packed bytes)
    chunks = []
    last_anchor = {}
    # strips stay on the s-aligned grid (dynamic_slice clamps out-of-range
    # starts, so arbitrary strip origins would silently shift the tile);
    # the writer trims rows below row_lo inside the first strip
    for r0 in range((row_lo // s) * s, pd.npad, s):
        if r0 >= row_hi:
            break
        rmax = min(r0 + s, row_hi)
        anchors = sorted({min(a, pd.npad - c) for a in range(0, rmax, c)})
        for a0 in anchors:
            chunks.append((r0, a0))
        last_anchor[r0] = anchors[-1]

    pending: deque = deque()
    strip: dict[int, list] = {}
    # D2H is the bottleneck on tunnel-attached TPUs; concurrent fetches of
    # the in-flight chunks recover ~1.5x bandwidth vs serial np.asarray
    fetch_pool = ThreadPoolExecutor(max_workers=4)

    def _drain_one():
        r0, a0, fg, fj, fjmax = pending.popleft()
        g, jm, jmax = fg.result(), fj.result(), fjmax.result()
        _tlog(f"drained ({r0},{a0})")
        if int(jmax) > 255:
            # u8 overflow (pathological missingness): recompute in u16
            g, jm, _ = grm_chunk_any(
                pd.packed, coef_dev, pd.vmask, miss_dev, mv_dev,
                r0, a0, s, c, jm16=True)
            g, jm = np.asarray(g), np.asarray(jm)
        strip.setdefault(r0, []).append((a0, g, jm))
        if a0 == last_anchor[r0]:
            if err:
                raise err[0]
            writeq.put((r0, strip.pop(r0)))

    for r0, a0 in chunks:
        g, jm, jmax = grm_chunk_any(
            pd.packed, coef_dev, pd.vmask, miss_dev, mv_dev, r0, a0, s, c)
        _tlog(f"dispatched ({r0},{a0})")
        pending.append((
            r0, a0,
            fetch_pool.submit(np.asarray, g),
            fetch_pool.submit(np.asarray, jm),
            fetch_pool.submit(np.asarray, jmax),
        ))
        if len(pending) >= 6:
            _drain_one()
    while pending:
        _drain_one()
    writeq.put(None)
    wt.join()
    fetch_pool.shutdown()
    if err:
        raise err[0]
    if par is None or par[0] == 1:
        _write_id_file(cfg.out + ".grm.id",
                       ds.si, np.flatnonzero(ds.sample_mask))
    log.log(f"{ds.variant_ct} variants used in GRM computation.")
    if par is None:
        log.log(
            f"--make-grm-bin: GRM written to {cfg.out}.grm.bin + "
            f"{cfg.out}.grm.N.bin + {cfg.out}.grm.id ."
        )
    else:
        log.log(
            f"--make-grm-bin: GRM piece {par[0]}/{par[1]} (rows "
            f"{row_lo}-{row_hi - 1}) written to "
            f"{cfg.out}.grm.bin{suffix} + {cfg.out}.grm.N.bin{suffix} ."
        )


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
    want_exact_pca = cfg.pca is not None and not cfg.pca_approx
    needs_matrix = cfg.make_grm_list or cfg.make_rel or want_exact_pca
    if getattr(cfg, "parallel", None) is not None and cfg.make_grm_bin \
            and needs_matrix:
        raise ValueError(
            "--parallel --make-grm-bin cannot be combined with commands "
            "that consume the full relationship matrix.")
    if cfg.make_grm_bin and not needs_matrix:
        # streaming path: nothing else needs the resident N x N matrix
        _stream_grm_bin(ds, cfg, log)
        if cfg.pca is not None:
            from .pca import run_pca

            run_pca(ds, cfg, log, grm=None)
        return
    want_grm_out = cfg.make_grm_bin or cfg.make_grm_list or cfg.make_rel
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

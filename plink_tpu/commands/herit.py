"""--unrelated-heritability: one-trait REML h^2 via accelerated EM.

Behavior reference: reml_em_one_trait + unrelated_herit_batch
(1.9/plink_calc.c:2200-2366, :2433-2666): phenotype standardized to
mean 0 / variance 1, V = covg*K + covr*I, EM updates
  dcovg = covg^2 * (y'P K P y - tr(PK)) / n
  dcovr = covr^2 * (y'P P y - tr(P)) / n
with the reference's Aitken-style acceleration (angular-change /
step-ratio / boundary-distance jump caps, MAX_EM_ACCEL=100), iterating
until the log-likelihood change drops to the tolerance.  Defaults:
tol 1e-7, covg 0.45, covr 0.55 (plink_calc.c:128-130).

Batch mode (the documented --grm-bin/--grm-gz + --pheno workflow) loads
the GCTA-format relationship matrix; samples are restricted to those
with a nonmissing scalar phenotype.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from ..utils.logging import RunLogger

_MAX_EM_ACCEL = 100.0


def reml_em_one_trait(rel: np.ndarray, pheno: np.ndarray, covg: float,
                      covr: float, tol: float, strict: bool,
                      log: RunLogger) -> tuple[float, float]:
    """Faithful numpy port of reml_em_one_trait (1.9/plink_calc.c:2207)."""
    n = pheno.size
    n_recip = 1.0 / n
    covg_cur = covr_cur = 1.0
    while True:
        v = rel * covg
        v[np.diag_indices_from(v)] += covr
        vi = np.linalg.inv(v)
        row = vi.sum(axis=1)
        s = row.sum()
        p = vi - np.outer(row, row) / s
        pvg = p @ rel
        dlg = -np.trace(pvg)
        dle = -np.trace(p)
        r2 = p @ pheno
        dlg += pheno @ (pvg @ r2)
        dle += pheno @ (p @ r2)
        covg_last, covr_last = covg_cur, covr_cur
        covg_cur = covg * covg * dlg * n_recip
        covr_cur = covr * covr * dle * n_recip
        if strict:
            max_jump = 1.0
        else:
            dxx = abs(np.arctan2(covg_last, covr_last)
                      - np.arctan2(covg_cur, covr_cur))
            if dxx > np.pi:
                dxx = 2 * np.pi - dxx
            dyy = np.sqrt((covg_cur * covg_cur + covr_cur * covr_cur)
                          / (covg_last * covg_last + covr_last * covr_last))
            if covg_cur < 0.0:
                max_jump = covg * (-0.5) / covg_cur
            else:
                max_jump = (1.0 - covg) * 0.5 / covg_cur
            dzz = (covr * (-0.5) / covr_cur if covr_cur < 0.0
                   else (1.0 - covr) * 0.5 / covr_cur)
            max_jump = min(max_jump, dzz)
            if dxx > 0:
                max_jump = min(max_jump, (np.pi / 4) / dxx)
            if dyy < 1.0:
                max_jump = min(max_jump, 1 / (1.0 - dyy))
            max_jump = min(max(max_jump, 1.0), _MAX_EM_ACCEL)
        covg += covg_cur * max_jump
        covr += covr_cur * max_jump
        ll_change = covg_cur * dlg + covr_cur * dle
        if ll_change <= tol:
            break
    log.log(f"covg: {covg:g}  covr: {covr:g}")
    return covg, covr


def _load_grm(prefix: str, want_gz: bool):
    """GCTA .grm.bin/.grm.gz + .grm.id -> (ids list, rel [n, n] f64)."""
    ids = []
    with open(prefix + ".grm.id") as f:
        for ln in f:
            t = ln.split()
            if t:
                ids.append(t[-1])
    n = len(ids)
    rel = np.zeros((n, n), np.float64)
    if want_gz:
        opener = gzip.open if os.path.exists(prefix + ".grm.gz") else open
        path = prefix + (".grm.gz" if os.path.exists(prefix + ".grm.gz")
                         else ".grm")
        with opener(path, "rt") as f:
            for ln in f:
                t = ln.split()
                i, j = int(t[0]) - 1, int(t[1]) - 1
                rel[i, j] = rel[j, i] = float(t[-1])
    else:
        tri = np.fromfile(prefix + ".grm.bin", np.float32).astype(np.float64)
        k = 0
        for i in range(n):
            rel[i, : i + 1] = tri[k : k + i + 1]
            rel[: i + 1, i] = tri[k : k + i + 1]
            k += i + 1
    return ids, rel


def run_unrelated_heritability(cfg, log: RunLogger) -> None:
    """Batch mode: --unrelated-heritability [strict] [tol] [covg] [covr]
    with --grm-bin/--grm-gz <prefix> and --pheno (ref
    unrelated_herit_batch, 1.9/plink_calc.c:2433)."""
    mods = list(cfg.unrelated_heritability or ())
    strict = bool(mods) and mods[0] == "strict"
    if strict:
        mods = mods[1:]
    tol = float(mods[0]) if len(mods) > 0 else 1e-7
    covg = float(mods[1]) if len(mods) > 1 else 0.45
    covr = float(mods[2]) if len(mods) > 2 else 0.55
    prefix = cfg.grm_bin or cfg.grm_gz
    if not prefix or not cfg.pheno:
        raise ValueError(
            "--unrelated-heritability currently requires --grm-bin/--grm-gz "
            "and --pheno (the batch workflow)."
        )
    ids, rel = _load_grm(prefix, want_gz=cfg.grm_bin is None)
    # scalar phenotype keyed by IID
    pheno = {}
    with open(cfg.pheno) as f:
        first = f.readline()
        rows = [first] if not first.startswith(("#", "FID", "IID")) else []
        rows += f.readlines()
    for ln in rows:
        t = ln.split()
        if len(t) >= 2:
            iid = t[1] if len(t) > 2 else t[0]
            try:
                pheno[iid] = float(t[-1])
            except ValueError:
                pass
    sel = [k for k, iid in enumerate(ids)
           if iid in pheno and pheno[iid] != -9]
    if len(sel) < 2:
        raise ValueError("Less than two phenotypes present.")
    y = np.array([pheno[ids[k]] for k in sel], np.float64)
    rel = rel[np.ix_(sel, sel)]
    # mean_zero_var_one_in_place (1.9/plink_calc.c:2367)
    y = y - y.mean()
    y = y / np.sqrt((y * y).sum() / y.size)
    log.log(f"--unrelated-heritability: {y.size} phenotypes loaded.")
    covg, covr = reml_em_one_trait(rel, y, covg, covr, tol, strict, log)
    log.log(f"h^2 estimate: {covg:g}")

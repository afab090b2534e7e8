"""Differential tests for the round-3 --glm modifier carve-outs:
qt-residualize / cc-residualize / firth-residualize (Mbatchou et al. 2021
shortcut, ref 2.0/plink2_glm_logistic.cc:2939,3191 and
plink2_glm_linear.cc:181-210), single-prec-cc, pheno-ids, --xchr-model 1."""

import os
import shutil
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


def _cmp(path_a, path_b, tol=1e-3):
    """min(SAPE, abs) column comparison (glm_compare.py model)."""
    la = open(path_a).read().splitlines()
    lb = open(path_b).read().splitlines()
    assert la[0] == lb[0], f"headers differ:\n{la[0]}\n{lb[0]}"
    assert len(la) == len(lb)
    for a, b in zip(la[1:], lb[1:]):
        for x, y in zip(a.split("\t"), b.split("\t")):
            if x == y:
                continue
            fx, fy = float(x), float(y)
            sape = abs(fx - fy) / max((abs(fx) + abs(fy)) / 2, 1e-300)
            assert min(sape, abs(fx - fy)) < tol, f"{x} vs {y} in\n{a}\n{b}"


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("glmmods")
    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.03", "--seed", "18",
         "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.03", "scalar-pheno", "--seed",
         "18", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(5)
    ids = [l.split("\t")[0]
           for l in (d / "gp.psam").read_text().splitlines()[1:]]
    with open(d / "gp.cov", "w") as f:
        # 4 covariates: the oracle's FillSampleOffsetsD Firth prefit
        # (2.0/plink2_glm_logistic.cc:3396) errors out with exactly 2-3
        # covariates (pred_ct 3-4) regardless of scaling — an AVX2
        # strided-buffer quirk; 1 and >=4 covariates converge fine.
        f.write("#IID\tC1\tC2\tC3\tC4\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.uniform():.6f}\t{rng.uniform():.6f}\t"
                    f"{rng.uniform():.6f}\t{rng.uniform():.6f}\n")
    return d


def _run_both(d, flags, stem_o, stem_t):
    run_oracle(flags + ["--out", stem_o], str(d))
    run_tpu(flags + ["--out", stem_t], str(d))


def test_qt_residualize(panel):
    d = panel
    flags = ["--pfile", "gq", "--glm", "qt-residualize", "hide-covar",
             "--covar", "gp.cov"]
    _run_both(d, flags, "oqr", "tqr")
    _cmp(d / "oqr.PHENO1.glm.linear", d / "tqr.PHENO1.glm.linear")


def test_cc_residualize_hybrid(panel):
    d = panel
    flags = ["--pfile", "gp", "--glm", "cc-residualize", "hide-covar",
             "--covar", "gp.cov"]
    _run_both(d, flags, "ocr", "tcr")
    _cmp(d / "ocr.PHENO1.glm.logistic.hybrid",
         d / "tcr.PHENO1.glm.logistic.hybrid")


def test_cc_residualize_no_firth(panel):
    d = panel
    flags = ["--pfile", "gp", "--glm", "cc-residualize", "no-firth",
             "hide-covar", "--covar", "gp.cov"]
    _run_both(d, flags, "ocn", "tcn")
    _cmp(d / "ocn.PHENO1.glm.logistic", d / "tcn.PHENO1.glm.logistic")


def test_firth_residualize_always_firth(panel):
    d = panel
    flags = ["--pfile", "gp", "--glm", "firth", "firth-residualize",
             "hide-covar", "--covar", "gp.cov"]
    _run_both(d, flags, "ofr", "tfr")
    _cmp(d / "ofr.PHENO1.glm.firth", d / "tfr.PHENO1.glm.firth")


def test_firth_residualize_hybrid(panel):
    """firth-residualize without 'firth': the logistic offsets are never
    allocated, so every variant takes the Firth-residualized path
    (FIRTH? = Y throughout)."""
    d = panel
    flags = ["--pfile", "gp", "--glm", "firth-residualize", "hide-covar",
             "--covar", "gp.cov"]
    _run_both(d, flags, "ofh", "tfh")
    _cmp(d / "ofh.PHENO1.glm.logistic.hybrid",
         d / "tfh.PHENO1.glm.logistic.hybrid")


def test_single_prec_cc(panel):
    """'single-prec-cc' uses the f32 kernels without f64 refinement; both
    engines run f32 but with different summation orders, so the comparison
    tolerance is looser (plink2's own glm_compare runs at 0.1-0.3)."""
    d = panel
    flags = ["--pfile", "gp", "--glm", "single-prec-cc", "hide-covar",
             "--covar", "gp.cov"]
    _run_both(d, flags, "osp", "tsp")
    _cmp(d / "osp.PHENO1.glm.logistic.hybrid",
         d / "tsp.PHENO1.glm.logistic.hybrid", tol=0.02)


def test_pheno_ids(panel):
    d = panel
    flags = ["--pfile", "gp", "--glm", "pheno-ids", "hide-covar",
             "--covar", "gp.cov"]
    _run_both(d, flags, "oid", "tid")
    assert (d / "oid.PHENO1.glm.logistic.hybrid.id").read_bytes() == (
        d / "tid.PHENO1.glm.logistic.hybrid.id").read_bytes()


def test_residualize_requires_hide_covar(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        with pytest.raises(ValueError, match="hide-covar"):
            main(["--pfile", "gp", "--glm", "cc-residualize", "--covar",
                  "gp.cov", "--out", "bad"])
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def xpanel(tmp_path_factory):
    """Mixed 1/X panel with both sexes for --xchr-model tests."""
    d = tmp_path_factory.mktemp("xm1")
    subprocess.run(
        [ORACLE, "--dummy", "300", "200", "0.02", "--seed", "23",
         "--out", "base"],
        cwd=d, check=True, capture_output=True,
    )
    lines = (d / "base.pvar").read_text().splitlines()
    hdr = [l for l in lines if l.startswith("#")]
    rows = [l for l in lines if not l.startswith("#")]
    out = []
    for i, r in enumerate(rows):
        t = r.split("\t")
        t[0] = "1" if i < 120 else "X"
        t[1] = str(1000 + i)
        out.append("\t".join(t))
    (d / "mix.pvar").write_text("\n".join(hdr + out) + "\n")
    shutil.copy(d / "base.pgen", d / "mix.pgen")
    plines = (d / "base.psam").read_text().splitlines()
    shdr = plines[0].lstrip("#").split("\t")
    si = shdr.index("SEX")
    out = [plines[0]]
    for i, l in enumerate(plines[1:]):
        t = l.split("\t")
        t[si] = "1" if i % 2 == 0 else "2"
        out.append("\t".join(t))
    (d / "mix.psam").write_text("\n".join(out) + "\n")
    rng = np.random.default_rng(9)
    with open(d / "qt.txt", "w") as f:
        f.write("#IID\tQT\n")
        for l in out[1:]:
            f.write(f"{l.split(chr(9))[0]}\t{rng.normal():.6f}\n")
    return d


def _glm_cmp(d, oracle_stem, tpu_stem, ext, val_lo, val_hi, tol,
             skip_autosome_freq=False):
    """skip_autosome_freq: under --xchr-model 1 the oracle's LINEAR thread
    recomputes autosomal a1_dosage as sum(genotype_vals) without gating on
    is_regular_x (2.0/plink2_glm_linear.cc:3255-3266), but under
    sparse_optimization genotype_vals is never filled — so its autosomal
    A1_FREQ column is garbage (reads an unfilled buffer).  We emit the
    correct frequency; skip that column on non-X rows."""
    def rows(p):
        with open(p) as f:
            hdr = f.readline()
            return hdr, [l.rstrip("\n").split("\t") for l in f]
    oh, orows = rows(str(d / f"{oracle_stem}.{ext}"))
    th, trows = rows(str(d / f"{tpu_stem}.{ext}"))
    assert oh == th
    om = {(r[0], r[1], r[val_lo - 1]): r for r in orows}
    tm = {(r[0], r[1], r[val_lo - 1]): r for r in trows}
    assert set(om) == set(tm)
    freq_col = oh.rstrip("\n").split("\t").index("A1_FREQ")
    for k in om:
        ra, rb = om[k], tm[k]
        ca_, cb_ = list(ra[:val_lo]), list(rb[:val_lo])
        if skip_autosome_freq and ra[0] != "X":
            ca_[freq_col] = cb_[freq_col] = "-"
        assert ca_ == cb_, (ra, rb)
        for ca, cb in zip(ra[val_lo:val_hi], rb[val_lo:val_hi]):
            if ca == "NA" or cb == "NA":
                assert ca == cb, (ra, rb)
                continue
            x, y = float(ca), float(cb)
            err = min(abs(x - y), abs(x - y) / max(abs(x), abs(y), 1e-300))
            assert err <= tol, (k, ra, rb)


def test_xchr_model_1_logistic(xpanel):
    d = xpanel
    flags = ["--pfile", "mix", "--glm", "allow-no-covars",
             "--xchr-model", "1"]
    _run_both(d, flags, "ox1", "tx1")
    _glm_cmp(d, "ox1", "tx1", "PHENO1.glm.logistic.hybrid", 11, 15, 2e-3)


def test_xchr_model_1_linear(xpanel):
    d = xpanel
    flags = ["--pfile", "mix", "--pheno", "qt.txt", "--pheno-name", "QT",
             "--glm", "allow-no-covars", "--xchr-model", "1"]
    _run_both(d, flags, "oxq", "txq")
    _glm_cmp(d, "oxq", "txq", "QT.glm.linear", 10, 14, 1e-4,
             skip_autosome_freq=True)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize("flag", [
    "--quantile-normalize", "--pheno-quantile-normalize",
    "--covar-quantile-normalize", "--variance-standardize",
])
def test_pheno_covar_transforms(tmp_path, flag):
    """Quantile-normalize / variance-standardize transform family (ref
    PhenoQuantileNormalize, 2.0/plink2_misc.cc:3318: tie groups share
    z = QuantileToZscore((start+end)/(2n)))."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "200", "60", "0.02", "scalar-pheno",
         "--seed", "19", "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    rng = np.random.default_rng(4)
    ids = [l.split("\t")[0]
           for l in (tmp_path / "d.psam").read_text().splitlines()[1:]]
    with open(tmp_path / "c.cov", "w") as f:
        f.write("#IID\tC1\tC2\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\t{rng.exponential():.6f}\n")
    args = ["--pfile", "d", "--glm", "hide-covar", "--covar", "c.cov", flag]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(args + ["--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    o = (tmp_path / "o.PHENO1.glm.linear").read_text().splitlines()
    t = (tmp_path / "t.PHENO1.glm.linear").read_text().splitlines()
    ip = o[0].split("\t").index("P")
    assert len(o) == len(t)
    for lo, lt in zip(o[1:], t[1:]):
        po, pt = lo.split("\t")[ip], lt.split("\t")[ip]
        if po == "NA" or pt == "NA":
            assert po == pt
        else:
            assert abs(float(po) - float(pt)) <= \
                2e-3 * max(abs(float(po)), 1e-9), (lo, lt)

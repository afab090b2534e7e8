"""Permutation tests (--glm aperm / mperm=N) vs the plink2 oracle.

Empirical p-values are RNG-dependent, so comparisons are statistical:
strong-signal variants must hit the exact EMP floor 1/(N+1) in both
engines; null variants must agree within binomial noise.
"""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get(
    "PLINK2_ORACLE_LAPACK", "/tmp/oracle_lapack/2.0/build_dynamic/plink2"
)
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="LAPACK plink2 oracle not built"
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


def _read_emp(path, col2):
    with open(path) as f:
        hdr = f.readline().rstrip().split("\t")
        rows = [l.rstrip().split("\t") for l in f]
    i1, i2 = hdr.index("EMP1"), hdr.index(col2)
    g = lambda s: float(s) if s != "NA" else np.nan
    return (np.array([g(r[i1]) for r in rows]),
            np.array([g(r[i2]) for r in rows]))


@pytest.fixture(scope="module")
def perm_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("perm")
    run_oracle(["--dummy", "300", "400", "0.02", "--seed", "11",
                "--out", "panel"], str(d))
    # qt pheno correlated with two variants
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from plink_tpu.dataset import load_dataset
    from plink_tpu.ops.pairwise import _unpack_np

    ds = load_dataset(str(d / "panel"))
    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct].astype(float)
    codes[codes == 3] = np.nan
    rng = np.random.default_rng(5)
    yq = (np.nan_to_num(codes[7]) * 0.9 + np.nan_to_num(codes[200]) * 0.7
          + rng.standard_normal(ds.raw_sample_ct))
    with open(d / "ph.txt", "w") as f:
        f.write("#IID\tQT\n")
        for i, iid in enumerate(ds.si.iid):
            f.write(f"{iid}\t{yq[i]:.6f}\n")
    return d


def test_linear_mperm(perm_panel):
    d = perm_panel
    N = 1000
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--glm", "allow-no-covars", f"mperm={N}", "--seed", "4"]
    run_oracle(args + ["--out", "o"], str(d))
    run_tpu(args + ["--out", "t"], str(d))
    oe1, oe2 = _read_emp(str(d / "o.QT.glm.linear.mperm"), "EMP2")
    te1, te2 = _read_emp(str(d / "t.QT.glm.linear.mperm"), "EMP2")
    # signal variants: exact floor in both engines
    floor = 1.0 / (N + 1)
    assert te1[7] == pytest.approx(floor) and oe1[7] == pytest.approx(floor)
    assert te2[7] == pytest.approx(floor) and oe2[7] == pytest.approx(floor)
    # null variants: within binomial noise (max over 400 tests ~ 4 sigma)
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 6.0 / N)
    assert frac_ok > 0.98, frac_ok
    assert np.nanmax(np.abs(oe2 - te2)) < 0.12


def test_linear_aperm(perm_panel):
    d = perm_panel
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--glm", "allow-no-covars", "aperm", "--seed", "4",
            "--aperm", "6", "10000"]
    run_oracle(args + ["--out", "oa"], str(d))
    run_tpu(args + ["--out", "ta"], str(d))
    oe1, opc = _read_emp(str(d / "oa.QT.glm.linear.aperm"), "PERM_CT")
    te1, tpc = _read_emp(str(d / "ta.QT.glm.linear.aperm"), "PERM_CT")
    floor = 1.0 / 10001
    assert te1[7] == pytest.approx(floor) and oe1[7] == pytest.approx(floor)
    # adaptive EMP1s agree within a factor ~e on log scale for the bulk
    rel = np.abs(np.log(te1) - np.log(oe1))
    assert np.nanmedian(rel) < 0.5
    # pruning actually happened (null variants stop early in both)
    assert np.nanmedian(tpc) < 2000 and np.nanmedian(opc) < 2000


def test_firth_mperm(perm_panel):
    d = perm_panel
    N = 500
    args = ["--pfile", "panel", "--glm", "allow-no-covars", "firth",
            f"mperm={N}", "--seed", "4"]
    run_oracle(args + ["--out", "oc"], str(d))
    run_tpu(args + ["--out", "tc"], str(d))
    oe1, _ = _read_emp(str(d / "oc.PHENO1.glm.firth.mperm"), "EMP2")
    te1, _ = _read_emp(str(d / "tc.PHENO1.glm.firth.mperm"), "EMP2")
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 8.0 / N)
    assert frac_ok > 0.97, frac_ok


def test_cc_perm_requires_firth(perm_panel):
    d = perm_panel
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(str(d))
    try:
        with pytest.raises(ValueError, match="requires"):
            main(["--pfile", "panel", "--glm", "allow-no-covars",
                  "mperm=10", "--out", "x"])
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def xperm_panel(tmp_path_factory):
    """Mixed chr1/chrX panel with both sexes: exercises the per-ploidy-group
    permutation path (union-sample permutation + per-group regressions, ref
    GlmFirthPerm sample_include_union, 2.0/plink2_glm_logistic.cc:6086)."""
    import shutil

    d = tmp_path_factory.mktemp("xperm")
    run_oracle(["--dummy", "300", "300", "0.02", "--seed", "31",
                "--out", "base"], str(d))
    lines = (d / "base.pvar").read_text().splitlines()
    hdr = [l for l in lines if l.startswith("#")]
    rows = [l for l in lines if not l.startswith("#")]
    out = []
    for i, r in enumerate(rows):
        t = r.split("\t")
        t[0] = "1" if i < 200 else "X"
        t[1] = str(2000 + i)
        out.append("\t".join(t))
    (d / "mix.pvar").write_text("\n".join(hdr + out) + "\n")
    shutil.copy(d / "base.pgen", d / "mix.pgen")
    pl = (d / "base.psam").read_text().splitlines()
    si = pl[0].lstrip("#").split("\t").index("SEX")
    o = [pl[0]]
    for i, l in enumerate(pl[1:]):
        t = l.split("\t")
        t[si] = "1" if i % 2 == 0 else "2"
        o.append("\t".join(t))
    (d / "mix.psam").write_text("\n".join(o) + "\n")
    # qt pheno correlated with one autosomal and one chrX variant
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from plink_tpu.dataset import load_dataset
    from plink_tpu.ops.pairwise import _unpack_np

    ds = load_dataset(str(d / "mix"))
    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct].astype(float)
    codes[codes == 3] = np.nan
    rng = np.random.default_rng(7)
    yq = (np.nan_to_num(codes[11]) * 1.0 + np.nan_to_num(codes[250]) * 0.9
          + rng.standard_normal(ds.raw_sample_ct))
    with open(d / "ph.txt", "w") as f:
        f.write("#IID\tQT\n")
        for i, iid in enumerate(ds.si.iid):
            f.write(f"{iid}\t{yq[i]:.6f}\n")
    return d


def _oracle_split_emp(d, N, base_args, suffix):
    """The oracle SEGFAULTS on a mixed autosome+chrX panel whenever the
    per-group covariate switch is live in a permutation run (even under
    --xchr-model 0); 'no-x-sex', autosome-only and X-only runs all work.
    So the oracle side runs split (--not-chr X, --chr X) — per-group EMPs
    are statistically comparable since each group regression permutes the
    same union sample set."""
    run_oracle(base_args + ["--not-chr", "X", "--out", "oa_"], str(d))
    run_oracle(base_args + ["--chr", "X", "--out", "obx_"], str(d))
    e1a, _ = _read_emp(str(d / f"oa_.{suffix}"), "EMP2")
    e1x, _ = _read_emp(str(d / f"obx_.{suffix}"), "EMP2")
    return np.concatenate([e1a, e1x])


def test_linear_mperm_chrx_groups(xperm_panel):
    d = xperm_panel
    N = 600
    args = ["--pfile", "mix", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--glm", "allow-no-covars", f"mperm={N}", "--seed", "9"]
    oe1 = _oracle_split_emp(d, N, args, "QT.glm.linear.mperm")
    run_tpu(args + ["--out", "tx"], str(d))
    te1, _ = _read_emp(str(d / "tx.QT.glm.linear.mperm"), "EMP2")
    assert te1.size == oe1.size == 300
    floor = 1.0 / (N + 1)
    # strong signals (one autosomal, one chrX) hit the floor in both
    # (abs tolerance: the report prints 6 significant digits)
    assert te1[11] == pytest.approx(floor, abs=1e-8)
    assert oe1[11] == pytest.approx(floor, abs=1e-8)
    assert te1[250] == pytest.approx(floor, abs=1e-8)
    assert oe1[250] == pytest.approx(floor, abs=1e-8)
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 8.0 / N)
    assert frac_ok > 0.97, frac_ok


def test_firth_mperm_chrx_groups(xperm_panel):
    d = xperm_panel
    N = 300
    args = ["--pfile", "mix", "--glm", "allow-no-covars", "firth",
            f"mperm={N}", "--seed", "9"]
    oe1 = _oracle_split_emp(d, N, args, "PHENO1.glm.firth.mperm")
    run_tpu(args + ["--out", "txc"], str(d))
    te1, _ = _read_emp(str(d / "txc.PHENO1.glm.firth.mperm"), "EMP2")
    assert te1.size == oe1.size == 300
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 10.0 / N)
    assert frac_ok > 0.95, frac_ok


def test_linear_mperm_dominant(perm_panel):
    """DOM-model permutation: permstat is |t| of the DOM main effect."""
    d = perm_panel
    N = 500
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--glm", "allow-no-covars", "dominant", f"mperm={N}",
            "--seed", "6"]
    run_oracle(args + ["--out", "od"], str(d))
    run_tpu(args + ["--out", "td"], str(d))
    oe1, _ = _read_emp(str(d / "od.QT.glm.linear.mperm"), "EMP2")
    te1, _ = _read_emp(str(d / "td.QT.glm.linear.mperm"), "EMP2")
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 8.0 / N)
    assert frac_ok > 0.97, frac_ok


@pytest.fixture(scope="module")
def joint_cov(perm_panel):
    """Gaussian covariate for the joint-test perm runs (the reference's
    covarless missing-genotype fast path spuriously flags low-correlation
    genotypic designs CORR_TOO_HIGH, plink2_glm_linear.cc:1380-1404, so the
    joint comparisons run with a covariate where both engines agree)."""
    d = perm_panel
    rng = np.random.default_rng(17)
    ids = [l.split("\t")[0]
           for l in (d / "panel.psam").read_text().splitlines()[1:]]
    with open(d / "jc.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    return d


def test_linear_mperm_genotypic(joint_cov):
    """GENO_2DF joint-test permutation: permstat is the joint F (the
    reference compares -ln p of FstatToLnP, monotone per variant)."""
    d = joint_cov
    N = 600
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--covar", "jc.cov", "--glm", "genotypic", f"mperm={N}",
            "--seed", "4"]
    run_oracle(args + ["--out", "og"], str(d))
    run_tpu(args + ["--out", "tg"], str(d))
    oe1, oe2 = _read_emp(str(d / "og.QT.glm.linear.mperm"), "EMP2")
    te1, te2 = _read_emp(str(d / "tg.QT.glm.linear.mperm"), "EMP2")
    floor = 1.0 / (N + 1)
    assert te1[7] == pytest.approx(floor, abs=1e-8)
    assert oe1[7] == pytest.approx(floor, abs=1e-8)
    assert (np.isnan(oe1) == np.isnan(te1)).mean() > 0.97
    m = ~np.isnan(oe1) & ~np.isnan(te1)
    sd = np.sqrt(np.maximum(oe1[m] * (1 - oe1[m]), 1e-9) / N)
    frac_ok = np.mean(np.abs(oe1[m] - te1[m]) <= 5 * sd + 8.0 / N)
    assert frac_ok > 0.97, frac_ok
    assert np.nanmax(np.abs(oe2 - te2)) < 0.15


def test_linear_aperm_genotypic(joint_cov):
    d = joint_cov
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--covar", "jc.cov", "--glm", "genotypic", "aperm",
            "--seed", "4", "--aperm", "6", "5000"]
    run_oracle(args + ["--out", "oga"], str(d))
    run_tpu(args + ["--out", "tga"], str(d))
    oe1, opc = _read_emp(str(d / "oga.QT.glm.linear.aperm"), "PERM_CT")
    te1, tpc = _read_emp(str(d / "tga.QT.glm.linear.aperm"), "PERM_CT")
    floor = 1.0 / 5001
    assert te1[7] == pytest.approx(floor, abs=1e-8)
    assert oe1[7] == pytest.approx(floor, abs=1e-8)
    rel = np.abs(np.log(te1) - np.log(oe1))
    assert np.nanmedian(rel) < 0.5
    assert np.nanmedian(tpc) < 2000 and np.nanmedian(opc) < 2000


def test_firth_mperm_hethom(joint_cov):
    """hethom joint-test (HOM+HET 2-df Wald) case/control permutation."""
    d = joint_cov
    N = 300
    args = ["--pfile", "panel", "--covar", "jc.cov", "--glm", "firth",
            "hethom", f"mperm={N}", "--seed", "4"]
    run_oracle(args + ["--out", "oh"], str(d))
    run_tpu(args + ["--out", "th"], str(d))
    oe1, _ = _read_emp(str(d / "oh.PHENO1.glm.firth.mperm"), "EMP2")
    te1, _ = _read_emp(str(d / "th.PHENO1.glm.firth.mperm"), "EMP2")
    assert (np.isnan(oe1) == np.isnan(te1)).mean() > 0.97
    m = ~np.isnan(oe1) & ~np.isnan(te1)
    sd = np.sqrt(np.maximum(oe1[m] * (1 - oe1[m]), 1e-9) / N)
    frac_ok = np.mean(np.abs(oe1[m] - te1[m]) <= 5 * sd + 10.0 / N)
    assert frac_ok > 0.95, frac_ok


def test_linear_mperm_interaction(joint_cov):
    """interaction designs permute on |t| of the primary (ADD) test with
    the ADDxC1 column in the model."""
    d = joint_cov
    N = 500
    args = ["--pfile", "panel", "--pheno", "ph.txt", "--pheno-name", "QT",
            "--covar", "jc.cov", "--glm", "interaction", f"mperm={N}",
            "--seed", "4"]
    run_oracle(args + ["--out", "oi"], str(d))
    run_tpu(args + ["--out", "ti"], str(d))
    oe1, _ = _read_emp(str(d / "oi.QT.glm.linear.mperm"), "EMP2")
    te1, _ = _read_emp(str(d / "ti.QT.glm.linear.mperm"), "EMP2")
    floor = 1.0 / (N + 1)
    assert te1[7] == pytest.approx(floor, abs=1e-8)
    assert oe1[7] == pytest.approx(floor, abs=1e-8)
    sd = np.sqrt(np.maximum(oe1 * (1 - oe1), 1e-9) / N)
    frac_ok = np.nanmean(np.abs(oe1 - te1) <= 5 * sd + 8.0 / N)
    assert frac_ok > 0.97, frac_ok

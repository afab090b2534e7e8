"""--glm tests: numpy f64 references for the linear and logistic paths, plus
differential checks against the plink2 oracle with the reference's own
min(SAPE, abs-err) comparison model (2.0/Tests/TEST_PHASED_VCF/glm_compare.py,
which the reference runs with tolerances of 0.1-0.3; we use 1e-3)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def _compare_glm(path_a, path_b, tol=1e-3):
    la = open(path_a).read().splitlines()
    lb = open(path_b).read().splitlines()
    assert la[0] == lb[0], f"headers differ:\n{la[0]}\n{lb[0]}"
    assert len(la) == len(lb)
    for a, b in zip(la[1:], lb[1:]):
        ta, tb = a.split("\t"), b.split("\t")
        for x, y in zip(ta, tb):
            if x == y:
                continue
            fx, fy = float(x), float(y)
            sape = abs(fx - fy) / max((abs(fx) + abs(fy)) / 2, 1e-300)
            assert min(sape, abs(fx - fy)) < tol, f"{x} vs {y} in\n{a}\n{b}"


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
class TestGlmDifferential:
    @pytest.fixture(scope="class")
    def panel(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("glmdiff")
        subprocess.run(
            [ORACLE, "--dummy", "300", "400", "0.04", "--seed", "13", "--out", "gp"],
            cwd=d, check=True, capture_output=True,
        )  # binary pheno
        subprocess.run(
            [ORACLE, "--dummy", "300", "400", "0.04", "scalar-pheno", "--seed",
             "13", "--out", "gq"],
            cwd=d, check=True, capture_output=True,
        )  # quantitative pheno (same genotypes: same seed)
        rng = np.random.default_rng(4)
        ids = [l.split("\t")[0] for l in (d / "gp.psam").read_text().splitlines()[1:]]
        with open(d / "gp.cov", "w") as f:
            f.write("#IID\tC1\tC2\n")
            for iid in ids:
                f.write(f"{iid}\t{rng.normal():.6f}\t{rng.normal():.6f}\n")
        return d

    def _run_both(self, d, flags, stem_o, stem_t):
        from plink_tpu.cli import main

        subprocess.run([ORACLE] + flags + ["--out", stem_o], cwd=d, check=True,
                       capture_output=True)
        old = os.getcwd()
        os.chdir(d)
        try:
            assert main(flags + ["--out", stem_t]) == 0
        finally:
            os.chdir(old)

    def test_linear(self, panel):
        d = panel
        flags = ["--pfile", "gq", "--glm", "--covar", "gp.cov"]
        self._run_both(d, flags, "ol", "tl")
        _compare_glm(d / "ol.PHENO1.glm.linear", d / "tl.PHENO1.glm.linear")

    def test_linear_hide_covar_no_covars(self, panel):
        d = panel
        flags = ["--pfile", "gq", "--glm", "allow-no-covars"]
        self._run_both(d, flags, "on", "tn")
        _compare_glm(d / "on.PHENO1.glm.linear", d / "tn.PHENO1.glm.linear")

    def test_logistic_hybrid(self, panel):
        d = panel
        flags = ["--pfile", "gp", "--glm", "hide-covar", "--covar", "gp.cov"]
        self._run_both(d, flags, "ob", "tb")
        _compare_glm(
            d / "ob.PHENO1.glm.logistic.hybrid",
            d / "tb.PHENO1.glm.logistic.hybrid",
        )


def test_logistic_irls_matches_numpy(geno_factory):
    """Device IRLS vs f64 numpy glm.fit-style reference on one block."""
    import jax.numpy as jnp

    from plink_tpu.ops.glm import logistic_irls_block
    from plink_tpu.ops.pairwise import _pack_np

    rng = np.random.default_rng(7)
    V, N = 12, 400
    codes = geno_factory(V, N, missing_rate=0.05, maf_lo=0.1, maf_hi=0.5)
    cov = rng.normal(size=(N, 1))
    logit = -0.3 + 0.5 * cov[:, 0]
    y = (rng.random(N) < 1 / (1 + np.exp(-logit))).astype(np.float64)
    npad = -(-N // 4) * 4
    packed = jnp.asarray(_pack_np(codes, npad))
    c = np.concatenate([np.ones((N, 1)), cov], axis=1)
    cpad = np.zeros((npad, 2), np.float32)
    cpad[:N] = c
    ypad = np.zeros(npad, np.float32)
    ypad[:N] = y
    mask = np.zeros(npad, np.float32)
    mask[:N] = 1
    gw = jnp.tile(jnp.asarray([[[1.0, 2.0, 0.0]]], jnp.float32), (V, 1, 1))
    beta, se, ll, conv, fail, unf, obs, _ = (
        np.asarray(x)
        for x in logistic_irls_block(
            packed, gw, jnp.asarray(cpad),
            jnp.asarray(ypad), jnp.asarray(mask), 2,
        )
    )
    assert conv.all() and not fail.any()
    # f64 reference per variant
    for v in range(V):
        val = codes[v] != 3
        X = np.column_stack([np.ones(val.sum()), c[val][:, 1], codes[v][val]])
        yv = y[val]
        b = np.zeros(3)
        z = 4.863891244002886 * (yv - 0.5)
        b = np.linalg.solve(X.T @ X, X.T @ z)
        for _ in range(50):
            p = 1 / (1 + np.exp(-(X @ b)))
            w = p * (1 - p)
            h = X.T * w @ X
            b_new = b - np.linalg.solve(h, X.T @ (p - yv))
            if np.max(np.abs(b_new - b)) < 1e-10:
                b = b_new
                break
            b = b_new
        p = 1 / (1 + np.exp(-(X @ b)))
        h = X.T * (p * (1 - p)) @ X
        se_ref = np.sqrt(np.diag(np.linalg.inv(h)))
        # kernel predictor order: const, covars..., geno
        np.testing.assert_allclose(beta[v, 2], b[2], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(se[v, 2], se_ref[2], rtol=2e-4)
        assert obs[v] == val.sum()


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize(
    "model",
    ["genotypic", "dominant", "recessive", "hetonly", "hethom", "interaction"],
)
def test_logistic_models(tmp_path, model):
    """All genotype models through the logistic-hybrid path, including the
    GENO_2DF joint Wald test (FstatToLnP(chisq/ct, ct, obs)), the
    validParameters() whole-row INVALID_RESULT check, and the NOLAPACK
    SVD-pseudo-inverse collinearity semantics."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "260", "200", "0.04", "--seed", "29", "--out", "bp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    rng = np.random.default_rng(5)
    ids = [l.split("\t")[0] for l in (tmp_path / "bp.psam").read_text().splitlines()[1:]]
    with open(tmp_path / "bp.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    flags = ["--pfile", "bp", "--glm", model, "--covar", "bp.cov"]
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=tmp_path, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "t"]) == 0
    finally:
        os.chdir(old)
    _compare_glm(
        tmp_path / "o.PHENO1.glm.logistic.hybrid",
        tmp_path / "t.PHENO1.glm.logistic.hybrid",
    )


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize(
    "model",
    ["genotypic", "dominant", "recessive", "hetonly", "hethom", "interaction"],
)
def test_linear_models(tmp_path, model):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "260", "200", "0.04", "scalar-pheno", "--seed",
         "47", "--out", "mp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    rng = np.random.default_rng(3)
    ids = [l.split("\t")[0] for l in (tmp_path / "mp.psam").read_text().splitlines()[1:]]
    with open(tmp_path / "mp.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    flags = ["--pfile", "mp", "--glm", model, "--covar", "mp.cov"]
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=tmp_path, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "t"]) == 0
    finally:
        os.chdir(old)
    _compare_glm(tmp_path / "o.PHENO1.glm.linear", tmp_path / "t.PHENO1.glm.linear")


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize(
    "flags,suffix",
    [
        (["--pfile", "gq", "--glm", "log10", "allow-no-covars"],
         "PHENO1.glm.linear"),
        (["--pfile", "gq", "--glm", "intercept", "allow-no-covars"],
         "PHENO1.glm.linear"),
        (["--pfile", "gp", "--glm", "intercept", "log10", "--covar",
          "gp.cov"], "PHENO1.glm.logistic.hybrid"),
    ],
)
def test_glm_intercept_log10(tmp_path, flags, suffix):
    """'intercept' adds TEST=INTERCEPT rows; 'log10' renames P to
    NEG_LOG10_P with -log10 values."""
    import numpy as np

    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "300", "100", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--dummy", "300", "100", "0.04", "--seed", "13", "--out",
         "gp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    rng = np.random.default_rng(4)
    ids = [l.split("\t")[0]
           for l in (tmp_path / "gp.psam").read_text().splitlines()[1:]]
    with open(tmp_path / "gp.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    _compare_glm(tmp_path / f"o.{suffix}", tmp_path / f"t.{suffix}")


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize(
    "model",
    ["dominant", "recessive", "hetonly", "genotypic", "hethom", "interaction"],
)
@pytest.mark.parametrize("kind", ["qt", "cc"])
def test_dosage_models(tmp_path, model, kind):
    """Genotype models over DOSAGE data: piecewise codings (DOM 0..1..1,
    REC 0..0..1, HET 0..1..0; GlmLogisticThreadF,
    2.0/plink2_glm_logistic.cc:2110-2155), GxC interaction columns, and
    the GENO_2DF joint test with second dof = sample_obs_ct."""
    from plink_tpu.cli import main

    args0 = ["--dummy", "260", "70", "0.03", "dosage-freq=0.7",
             "--seed", "13", "--out", "dp"]
    if kind == "qt":
        args0.insert(5, "scalar-pheno")
    subprocess.run([ORACLE] + args0, cwd=tmp_path, check=True,
                   capture_output=True)
    rng = np.random.default_rng(5)
    ids = [l.split("\t")[0]
           for l in (tmp_path / "dp.psam").read_text().splitlines()[1:]]
    with open(tmp_path / "dp.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    flags = ["--pfile", "dp", "--glm", model, "--covar", "dp.cov"]
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    ext = ".PHENO1.glm.linear" if kind == "qt" \
        else ".PHENO1.glm.logistic.hybrid"
    ao = (tmp_path / ("o" + ext)).read_text().splitlines()
    at = (tmp_path / ("t" + ext)).read_text().splitlines()
    assert ao[0] == at[0]
    assert len(ao) == len(at)
    ip = ao[0].split("\t").index("P")
    for lo, lt in zip(ao[1:], at[1:]):
        po, pt = lo.split("\t")[ip], lt.split("\t")[ip]
        if po == "NA" or pt == "NA":
            assert po == pt, (lo, lt)
        else:
            fo, ft = float(po), float(pt)
            assert abs(fo - ft) <= 2e-3 * max(abs(fo), 1e-8) + 1e-9, (lo, lt)

"""--lasso differential tests vs plink 1.9: byte-identical .lasso reports
on the explicit-minlambda path (the f64 coordinate-descent mirror is
operation-order faithful; the warm-start minlambda estimator uses a
different RNG stream and is not byte-comparable)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE2 = os.environ.get("PLINK2_ORACLE",
                         "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(ORACLE2) and os.path.exists(ORACLE19)),
    reason="oracles not built",
)


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True,
                   capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("lasso")
    subprocess.run(
        [ORACLE2, "--dummy", "260", "350", "0.02", "scalar-pheno",
         "--seed", "47", "--out", "sp"],
        cwd=d, check=True, capture_output=True)
    subprocess.run(
        [ORACLE2, "--pfile", "sp", "--make-bed", "--out", "sb"],
        cwd=d, check=True, capture_output=True)
    rng = np.random.default_rng(3)
    ids = [(l.split()[0], l.split()[1])
           for l in (d / "sb.fam").read_text().splitlines()]
    with open(d / "cv.txt", "w") as f:
        f.write("FID IID AGE BMI\n")
        for fid, iid in ids:
            f.write(f"{fid} {iid} {rng.uniform(20, 70):.4f} "
                    f"{rng.uniform(18, 35):.4f}\n")
    return d


@pytest.mark.parametrize("extra", [
    [],
    ["report-zeroes"],
], ids=["basic", "report-zeroes"])
def test_lasso_basic(panel, extra):
    d = panel
    run19(["--bfile", "sb", "--lasso", "0.5", "0.05"] + extra
          + ["--out", "o"], str(d))
    run_tpu(["--bfile", "sb", "--lasso", "0.5", "0.05"] + extra
            + ["--out", "t"], str(d))
    assert (d / "o.lasso").read_bytes() == (d / "t.lasso").read_bytes()


@pytest.mark.parametrize("extra", [
    ["--covar", "cv.txt"],
    ["--covar", "cv.txt", "--lasso-select-covars"],
    ["--covar", "cv.txt", "--lasso-select-covars", "AGE"],
], ids=["covar-unpenalized", "select-all", "select-one"])
def test_lasso_covars(panel, extra):
    d = panel
    run19(["--bfile", "sb", "--lasso", "0.5", "0.04"] + extra
          + ["--out", "oc"], str(d))
    run_tpu(["--bfile", "sb", "--lasso", "0.5", "0.04"] + extra
            + ["--out", "tc"], str(d))
    assert (d / "oc.lasso").read_bytes() == (d / "tc.lasso").read_bytes()


def test_lasso_cc_pheno(tmp_path):
    d = tmp_path
    subprocess.run(
        [ORACLE2, "--dummy", "220", "250", "0.02", "--seed", "9",
         "--out", "cp"], cwd=d, check=True, capture_output=True)
    subprocess.run(
        [ORACLE2, "--pfile", "cp", "--make-bed", "--out", "cb"],
        cwd=d, check=True, capture_output=True)
    run19(["--bfile", "cb", "--lasso", "0.4", "0.06", "--out", "od"],
          str(d))
    run_tpu(["--bfile", "cb", "--lasso", "0.4", "0.06", "--out", "td"],
            str(d))
    assert (d / "od.lasso").read_bytes() == (d / "td.lasso").read_bytes()


def test_lasso_numpy_fallback_matches_native(panel):
    """The numpy CD implementation must match the native kernel."""
    from plink_tpu.commands import lasso as L
    from plink_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(0)
    C, n = 40, 120
    X = rng.standard_normal((C, n))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    y = rng.standard_normal(n)
    y /= np.linalg.norm(y)
    import ctypes

    lib = get_lib()
    for lam in (0.02, 0.1):
        xh1 = (X @ y).copy()
        r1 = np.empty(n)
        it1 = int(lib.lasso_cd_lambda(
            X.ctypes.data_as(ctypes.c_void_p), C, n, lam, 2,
            y.ctypes.data_as(ctypes.c_void_p),
            xh1.ctypes.data_as(ctypes.c_void_p),
            r1.ctypes.data_as(ctypes.c_void_p)))
        xh2 = (X @ y).copy()
        r2 = np.empty(n)
        it2 = L._cd_lambda_numpy(X, lam, 2, y, xh2, r2)
        assert it1 == it2
        np.testing.assert_allclose(xh1, xh2, rtol=1e-12, atol=1e-15)

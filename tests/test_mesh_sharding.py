"""Multi-device mesh sharding: production commands must produce identical
outputs on 1 device and on the full 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8).

This is the TPU-native replacement for the reference's manual --parallel
sharding (2.0/plink2_matrix_calc.cc:81-117): the variant-block axis is
sharded over the mesh and Gram contractions psum over the collective mesh
axis, so ONE invocation uses every chip.

PLINK_TPU_VB=64 forces many small blocks (so the 8-way shard is real);
PLINK_TPU_DEVICES=1 disables sharding for the reference run.  Integer
outputs (KING counts, geno counts, GLM hardcall stats) are byte-identical;
f64-accumulated GRM/PCA outputs are compared at 1e-12/1e-6 tolerance (the
psum changes the f64 summation order of per-block f32 partials).
"""

import filecmp
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out, extra, devices=None, vb="64"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PLINK_TPU_VB"] = vb
    if devices:
        env["PLINK_TPU_DEVICES"] = devices
    else:
        env.pop("PLINK_TPU_DEVICES", None)
    cmd = [sys.executable, "-m", "plink_tpu.cli"] + extra + ["--out", out,
                                                            "--silent"]
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-2000:]


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh")
    prefix = str(d / "p")
    _run(prefix, ["--dummy", "200", "600", "0.05", "--seed", "7"])
    # covariate file: SEX + 2 gaussian columns
    rng = np.random.default_rng(11)
    with open(prefix + ".psam") as f:
        hdr = f.readline().rstrip("\n").split("\t")
        sex_i = hdr.index("SEX")
        rows = [l.split("\t") for l in f]
    with open(prefix + ".cov", "w") as f:
        f.write("#IID\tSEX\tC1\tC2\n")
        for r in rows:
            f.write(f"{r[0]}\t{r[sex_i]}\t{rng.normal():.6f}\t{rng.normal():.6f}\n")
    return prefix


def _both(panel, tmp_path, args):
    one = str(tmp_path / "one")
    eight = str(tmp_path / "eight")
    _run(one, ["--pfile", panel] + args, devices="1")
    _run(eight, ["--pfile", panel] + args)
    return one, eight


def test_freq_counts_sharded(panel, tmp_path):
    one, eight = _both(panel, tmp_path, ["--freq", "--missing", "--geno-counts",
                                         "--hardy"])
    for ext in (".afreq", ".vmiss", ".smiss", ".gcount", ".hardy"):
        assert filecmp.cmp(one + ext, eight + ext, shallow=False), ext


def test_glm_sharded(panel, tmp_path):
    one, eight = _both(
        panel, tmp_path,
        ["--glm", "hide-covar", "--covar", panel + ".cov"],
    )
    for ext in (".PHENO1.glm.logistic.hybrid",):
        assert filecmp.cmp(one + ext, eight + ext, shallow=False), ext


def test_glm_linear_sharded(panel, tmp_path):
    # quantitative pheno: reuse C1 as phenotype via --pheno
    ph = str(tmp_path / "ph.txt")
    rng = np.random.default_rng(3)
    with open(panel + ".psam") as f:
        f.readline()
        iids = [l.split("\t")[0] for l in f]
    with open(ph, "w") as f:
        f.write("#IID\tQT1\n")
        for i in iids:
            f.write(f"{i}\t{rng.normal():.6f}\n")
    one, eight = _both(
        panel, tmp_path,
        ["--glm", "hide-covar", "--covar", panel + ".cov", "--pheno", ph],
    )
    assert filecmp.cmp(one + ".QT1.glm.linear", eight + ".QT1.glm.linear",
                       shallow=False)


def test_king_sharded(panel, tmp_path):
    one, eight = _both(panel, tmp_path, ["--make-king-table", "--make-king",
                                         "bin"])
    # KING counts are int32 Gram combinations: exact equality required
    assert filecmp.cmp(one + ".kin0", eight + ".kin0", shallow=False)
    a = np.fromfile(one + ".king.bin", np.float64)
    b = np.fromfile(eight + ".king.bin", np.float64)
    np.testing.assert_array_equal(a, b)


def test_grm_sharded(panel, tmp_path):
    one, eight = _both(panel, tmp_path, ["--make-grm-bin"])
    a = np.fromfile(one + ".grm.bin", np.float32)
    b = np.fromfile(eight + ".grm.bin", np.float32)
    assert np.abs(a - b).max() <= 2e-6
    assert filecmp.cmp(one + ".grm.N.bin", eight + ".grm.N.bin", shallow=False)


def test_pca_approx_sharded(panel, tmp_path):
    one, eight = _both(panel, tmp_path, ["--pca", "4", "approx", "--seed",
                                         "13"])
    for ext in (".eigenval", ".eigenvec"):
        a = np.loadtxt(one + ext, skiprows=1 if ext == ".eigenvec" else 0,
                       usecols=None if ext == ".eigenval" else (1, 2, 3, 4))
        b = np.loadtxt(eight + ext, skiprows=1 if ext == ".eigenvec" else 0,
                       usecols=None if ext == ".eigenval" else (1, 2, 3, 4))
        # sign-flip aware comparison (power iteration sign is arbitrary only
        # under different summation orders)
        if a.ndim == 1:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
        else:
            for k in range(a.shape[1]):
                d1 = np.abs(a[:, k] - b[:, k]).max()
                d2 = np.abs(a[:, k] + b[:, k]).max()
                assert min(d1, d2) <= 1e-4

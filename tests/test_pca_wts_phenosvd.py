"""--pca allele-wts and --pheno-svd numeric self-consistency tests.

The locally built oracle lacks LAPACK so these commands cannot be
byte-diffed; instead we verify the documented math: allele weights
reconstruct sample PCs through the normalized dosage matrix, and
pheno-svd projections/weights reconstruct the phenotype matrix."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def test_pca_allele_wts_reconstruction(tmp_path):
    from plink_tpu.cli import main

    d = tmp_path
    subprocess.run(
        [ORACLE, "--dummy", "120", "200", "0.0", "--seed", "3", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gp", "--pca", "4", "allele-wts",
                     "--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    # parse outputs
    ev = np.array([
        [float(x) for x in l.split("\t")[1:]]
        for l in (d / "t.eigenvec").read_text().splitlines()[1:]
    ])
    evals = np.array([float(l) for l in (d / "t.eigenval").read_text().split()])
    rows = (d / "t.eigenvec.allele").read_text().splitlines()[1:]
    alt_rows = rows[1::2]  # ALT allele row is second per variant
    W = np.array([[float(x) for x in r.split("\t")[6:]] for r in alt_rows])
    # rebuild Z from the pgen directly
    import sys
    sys.path.insert(0, "/root/repo")
    from plink_tpu.dataset import load_dataset
    from plink_tpu.ops.pairwise import _unpack_np

    os.chdir(d)
    try:
        ds = load_dataset("gp")
        codes = _unpack_np(ds.reader.read_packed(0, ds.raw_variant_ct))[
            :, : ds.raw_sample_ct
        ].astype(float)
    finally:
        os.chdir(old)
    p = codes.mean(axis=1) / 2
    z = (codes - 2 * p[:, None]) / np.sqrt(2 * p * (1 - p))[:, None]
    M = z.shape[0]
    # W = Z U / sqrt(lambda)  =>  Z^T W / (M sqrt(lambda)) = U
    recon = (z.T @ W) / (M * np.sqrt(evals)[None, :])
    # sign-align columns
    for k in range(recon.shape[1]):
        if np.dot(recon[:, k], ev[:, k]) < 0:
            recon[:, k] = -recon[:, k]
    np.testing.assert_allclose(recon, ev, atol=5e-4)


def test_pheno_svd_reconstruction(tmp_path):
    from plink_tpu.cli import main

    d = tmp_path
    subprocess.run(
        [ORACLE, "--dummy", "80", "30", "0.0", "scalar-pheno", "--seed", "9",
         "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(2)
    ids = [l.split("\t")[0] for l in (d / "gp.psam").read_text().splitlines()[1:]]
    with open(d / "ph.txt", "w") as f:
        f.write("#IID\tQ1\tQ2\tQ3\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\t{rng.normal():.6f}\t"
                    f"{rng.normal():.6f}\n")
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gp", "--pheno", "ph.txt", "--pheno-svd",
                     "3", "--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    proj = np.array([
        [float(x) for x in l.split("\t")[1:]]
        for l in (d / "t.pheno_svd.pheno").read_text().splitlines()[1:]
    ])
    wts = np.array([
        [float(x) for x in l.split("\t")[1:]]
        for l in (d / "t.pheno_svd.wts").read_text().splitlines()[1:]
    ])
    y = np.array([
        [float(x) for x in l.split("\t")[1:4]]
        for l in (d / "ph.txt").read_text().splitlines()[1:]
    ])
    # proj @ wts^T == Y  (U S V^T with wts rows = V rows per phenotype)
    np.testing.assert_allclose(proj @ wts.T, y, atol=2e-4)

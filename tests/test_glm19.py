"""PLINK 1.9 --linear/--logistic parity: byte-diffed vs a local plink 1.9."""

import os
import subprocess

import numpy as np
import pytest

ORACLE2 = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(ORACLE19) and os.path.exists(ORACLE2)),
    reason="plink 1.9 oracle not built",
)


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def panels(tmp_path_factory):
    d = tmp_path_factory.mktemp("glm19")
    for tag, seed, extra in (("pb", 33, []), ("qb", 34, ["scalar-pheno"]),
                             ("pa", 35, [])):
        subprocess.run(
            [ORACLE2, "--dummy", "150", "300", "0.05"] + extra
            + ["--seed", str(seed), "--out", f"pp{tag}"],
            cwd=d, check=True, capture_output=True)
        subprocess.run(
            [ORACLE2, "--pfile", f"pp{tag}", "--make-bed", "--out", tag],
            cwd=d, check=True, capture_output=True)
        if tag == "pa":
            continue  # pa stays all-autosomal (genotypic perm fixture)
        # mixed chromosomes in sorted blocks: 1, 22, X, Y, MT
        lines = (d / f"{tag}.bim").read_text().splitlines()
        out = []
        for i, l in enumerate(lines):
            t = l.split("\t")
            t[0] = ("1" if i < 180 else "22" if i < 230 else "23" if i < 270
                    else "24" if i < 285 else "26")
            out.append("\t".join(t))
        (d / f"{tag}.bim").write_text("\n".join(out) + "\n")
    rng = np.random.default_rng(11)
    fam = [l.split() for l in (d / "pb.fam").read_text().splitlines()]
    with open(d / "cv.txt", "w") as f:
        f.write("FID IID C1 C2\n")
        for r in fam:
            f.write(f"{r[0]} {r[1]} {rng.standard_normal():.4f} "
                    f"{rng.standard_normal():.4f}\n")
    return d


CASES = [
    ("logistic", "pb", []),
    ("logistic", "pb", ["--covar", "cv.txt"]),
    ("logistic hide-covar", "pb", ["--covar", "cv.txt"]),
    ("logistic beta", "pb", []),
    ("logistic dominant", "pb", []),
    ("logistic recessive", "pb", []),
    ("logistic genotypic", "pb", []),
    ("logistic hethom", "pb", []),
    ("logistic sex", "pb", []),
    ("logistic", "pb", ["--ci", "0.95"]),
    ("linear", "qb", []),
    ("linear", "qb", ["--covar", "cv.txt"]),
    ("linear standard-beta", "qb", []),
    ("linear standard-beta", "qb", ["--covar", "cv.txt"]),
    ("linear genotypic", "qb", []),
    ("linear hethom", "qb", []),
    ("linear dominant", "qb", []),
    ("linear intercept", "qb", ["--ci", "0.9"]),
    ("linear sex", "qb", []),
    ("linear", "qb", ["--xchr-model", "2"]),
    ("linear", "qb", ["--xchr-model", "0"]),
    # interaction: G x covariate / G x sex terms (glm_fill_design
    # 1.9/plink_glm.c:1977-2238)
    ("logistic interaction", "pb", ["--covar", "cv.txt"]),
    ("linear interaction", "qb", ["--covar", "cv.txt"]),
    ("linear interaction sex", "qb", ["--covar", "cv.txt"]),
    ("linear interaction genotypic", "qb", ["--covar", "cv.txt"]),
    ("logistic interaction hethom", "pb", ["--covar", "cv.txt"]),
    ("linear interaction sex", "qb", []),
    # no-snp: one-off covariate-only regressions (glm_linear_nosnp
    # :7055 / glm_logistic_nosnp :7923)
    ("logistic no-snp", "pb", ["--covar", "cv.txt"]),
    ("logistic no-snp beta intercept", "pb",
     ["--covar", "cv.txt", "--ci", "0.95"]),
    ("logistic no-snp sex", "pb", ["--covar", "cv.txt"]),
    ("linear no-snp", "qb", ["--covar", "cv.txt"]),
    # standard-beta + intercept is NOT byte-compared: standardized
    # covariates make the intercept mathematically 0, and its ~1e-17
    # display exposes LAPACK accumulation-order noise across BLAS builds
    ("linear no-snp standard-beta", "qb",
     ["--covar", "cv.txt", "--ci", "0.9"]),
    ("linear no-snp intercept", "qb", ["--covar", "cv.txt"]),
    ("linear no-snp sex", "qb", ["--covar", "cv.txt"]),
]


PERM_CASES = [
    ("linear mperm=50", "qb", ".assoc.linear.mperm", ["--threads", "4"]),
    ("linear perm", "qb", ".assoc.linear.perm",
     ["--aperm", "5", "60", "0", "0.0001", "1", "0.001", "--threads", "4"]),
    ("linear standard-beta mperm=40", "qb", ".assoc.linear.mperm",
     ["--threads", "2"]),
    ("logistic mperm=50", "pb", ".assoc.logistic.mperm", ["--threads", "4"]),
    ("logistic perm", "pb", ".assoc.logistic.perm",
     ["--aperm", "5", "60", "0", "0.0001", "1", "0.001", "--threads", "4"]),
    # genotypic forces --xchr-model 0; the reference's perm report rows
    # for the excluded nonautosomal variants come from out-of-bounds array
    # reads (nondeterministic garbage), so the genotypic perm fixture is
    # all-autosomal
    ("logistic genotypic perm", "pa", ".assoc.logistic.perm",
     ["--aperm", "5", "50", "0", "0.0001", "1", "0.001", "--threads", "1"]),
    ("linear perm perm-count", "qb", ".assoc.linear.perm",
     ["--aperm", "5", "40", "0", "0.0001", "1", "0.001", "--threads", "2"]),
]


@pytest.mark.parametrize("flagspec,panel,ext,extra", PERM_CASES)
def test_glm19_perm_parity(panels, flagspec, panel, ext, extra):
    d = panels
    toks = flagspec.split()
    flag, mods = toks[0], toks[1:]
    tag = (flagspec + "_" + "_".join(extra)).replace(" ", "_") \
        .replace("--", "").replace(".", "").replace("=", "")
    args = (["--bfile", panel, f"--{flag}"] + mods
            + ["--seed", "77", "--allow-no-sex"] + extra)
    run19(args + ["--out", f"o_{tag}"], str(d))
    run_tpu(args + ["--out", f"t_{tag}", "--silent"], str(d))
    a = (d / f"o_{tag}{ext}").read_bytes()
    b = (d / f"t_{tag}{ext}").read_bytes()
    assert a == b, f"{tag}: perm report differs"


@pytest.mark.parametrize("flagspec,panel,extra", CASES)
def test_glm19_parity(panels, flagspec, panel, extra):
    d = panels
    toks = flagspec.split()
    flag, mods = toks[0], toks[1:]
    ext = ".assoc." + flag
    tag = (flagspec + "_" + "_".join(extra)).replace(" ", "_") \
        .replace("--", "").replace(".", "")
    args = ["--bfile", panel, f"--{flag}"] + mods + extra + ["--allow-no-sex"]
    run19(args + ["--out", f"o_{tag}"], str(d))
    run_tpu(args + ["--out", f"t_{tag}", "--silent"], str(d))
    a = (d / f"o_{tag}{ext}").read_bytes()
    b = (d / f"t_{tag}{ext}").read_bytes()
    assert a == b, f"{tag}: report differs"


COND_CASES = [
    ("linear", "qb", []),
    ("linear", "qb", ["--covar", "cv.txt"]),
    ("logistic", "pb", []),
    ("linear", "qb", ["--condition-dominant"]),
    ("logistic", "pb", ["--condition-recessive"]),
    ("linear", "qb", ["--covar", "cv.txt", "--no-snp"]),
    ("logistic", "pb", ["--no-snp"]),
]


@pytest.mark.parametrize("flag,panel,extra", COND_CASES,
                         ids=lambda c: str(c))
def test_glm19_condition(panels, flag, panel, extra):
    """--condition / --condition-list (glm_scan_conditions,
    1.9/plink_glm.c:92; geno_map :4584-4596)."""
    d = panels
    # pick two autosomal variant IDs from the fixture
    bim = (d / f"{panel}.bim").read_text().splitlines()
    vids = [bim[5].split("\t")[1], bim[17].split("\t")[1]]
    mods = []
    cond: list[str]
    if "--condition-dominant" in extra:
        cond, mods = ["--condition", vids[0], "dominant"], []
    elif "--condition-recessive" in extra:
        cond, mods = ["--condition", vids[0], "recessive"], []
    else:
        (d / "clist.txt").write_text("\n".join(vids) + "\n")
        cond = ["--condition-list", "clist.txt"]
        mods = [e for e in extra]
    tag = (flag + "_" + "_".join(extra)).replace(" ", "_") \
        .replace("--", "").replace(".", "")
    args = (["--bfile", panel, f"--{flag}"] + cond + mods
            + ["--allow-no-sex"])
    run19(args + ["--out", f"oc_{tag}"], str(d))
    run_tpu(args + ["--out", f"tc_{tag}", "--silent"], str(d))
    ext = ".assoc." + flag
    a = (d / f"oc_{tag}{ext}").read_bytes()
    b = (d / f"tc_{tag}{ext}").read_bytes()
    assert a == b, f"{tag}: condition report differs"

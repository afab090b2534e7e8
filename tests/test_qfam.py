"""--qfam family-based QT permutation tests vs plink 1.9."""

import os
import subprocess

import numpy as np
import pytest

ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE19), reason="plink 1.9 oracle not built")


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
def fam_panel(tmp_path_factory):
    """45 nuclear families + 20 singletons, chr1/2 + chrX (excluded by
    qfam), QT pheno."""
    d = tmp_path_factory.mktemp("qfam")
    rng = np.random.default_rng(7)
    M_a, M_x = 120, 30
    M = M_a + M_x
    chrom = [1] * 60 + [2] * 60 + [23] * M_x
    pos = (list(range(100000, 100000 + 60 * 2000, 2000)) * 2
           + list(range(500000, 500000 + M_x * 3000, 3000)))
    with open(d / "panel.map", "w") as f:
        for j in range(M):
            f.write(f"{chrom[j]} snp{j} 0 {pos[j]}\n")
    freqs = rng.uniform(0.1, 0.9, M)

    def geno_pair(freq):
        g = rng.binomial(2, freq)
        if rng.random() < 0.04:
            return "0 0"
        return ["A A", "A B", "B B"][g]

    lines = []
    for fam in range(45):
        fid = f"F{fam}"
        for pi, sx in enumerate((1, 2)):
            g = " ".join(geno_pair(freqs[j]) for j in range(M))
            lines.append(f"{fid} P{pi} 0 0 {sx} -9 {g}")
        for k in range(1 + fam % 3):
            sx = 1 + (fam + k) % 2
            g = " ".join(geno_pair(freqs[j]) for j in range(M))
            lines.append(f"{fid} K{k} P0 P1 {sx} -9 {g}")
    for s in range(20):
        g = " ".join(geno_pair(freqs[j]) for j in range(M))
        lines.append(f"S{s} I0 0 0 {1 + s % 2} -9 {g}")
    (d / "panel.ped").write_text("\n".join(lines) + "\n")
    run19(["--file", "panel", "--make-bed", "--allow-no-sex",
           "--out", "pb"], str(d))
    rows = []
    for line in open(d / "pb.fam"):
        t = line.split()
        rows.append(f"{t[0]} {t[1]} {rng.normal(10, 3):.3f}")
    (d / "qt.phe").write_text("\n".join(rows) + "\n")
    (d / "qt_h.phe").write_text("#FID IID P\n" + "\n".join(rows)
                                + "\n")
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.mark.parametrize("flag,sfx,mods", [
    ("--qfam", "within", ["mperm=200"]),
    ("--qfam-parents", "parents", ["mperm=150"]),
    ("--qfam-between", "between", ["mperm=600"]),   # 2 RNG batches
    ("--qfam-total", "total", ["perm", "perm-count"]),
    ("--qfam", "within", ["perm", "emp-se"]),
])
def test_qfam(fam_panel, flag, sfx, mods):
    d = fam_panel
    tag = sfx + str(len("".join(mods)))
    extra = []
    if "perm" in mods:
        extra = ["--aperm", "10", "300", "0.01", "0.001", "2",
                 "0.002"]
    run19(["--bfile", "pb", "--pheno", "qt.phe", flag] + mods + extra
          + ["--seed", "21", "--allow-no-sex", "--out", f"o_{tag}"],
          str(d))
    run_tpu(["--bfile", "pb", "--pheno", "qt_h.phe", flag] + mods
            + extra + ["--seed", "21", "--allow-no-sex",
                       "--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.qfam.{sfx}", f"t_{tag}.qfam.{sfx}")
    _cmp(d, f"o_{tag}.qfam.{sfx}.perm", f"t_{tag}.qfam.{sfx}.perm")


def test_dfam(fam_panel):
    d = fam_panel
    # dfam needs a cc pheno; derive one from the QT file
    rows = []
    for line in open(d / "qt.phe"):
        t = line.split()
        rows.append(f"{t[0]} {t[1]} {1 + (float(t[2]) > 10)}")
    (d / "cc.phe").write_text("\n".join(rows) + "\n")
    (d / "cc_h.phe").write_text("#FID IID P\n" + "\n".join(rows)
                                + "\n")
    run19(["--bfile", "pb", "--pheno", "cc.phe", "--dfam",
           "--allow-no-sex", "--out", "o_df"], str(d))
    run_tpu(["--bfile", "pb", "--pheno", "cc_h.phe", "--dfam",
             "--allow-no-sex", "--out", "t_df", "--silent"], str(d))
    _cmp(d, "o_df.dfam", "t_df.dfam")


def test_dfam_no_unrelateds(fam_panel):
    d = fam_panel
    run19(["--bfile", "pb", "--pheno", "cc.phe", "--dfam",
           "no-unrelateds", "--allow-no-sex", "--out", "o_dn"],
          str(d))
    run_tpu(["--bfile", "pb", "--pheno", "cc_h.phe", "--dfam",
             "no-unrelateds", "--allow-no-sex", "--out", "t_dn",
             "--silent"], str(d))
    _cmp(d, "o_dn.dfam", "t_dn.dfam")

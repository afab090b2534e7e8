"""--set/--make-set subsystem differential tests vs plink 1.9:
--write-set/--set-table outputs, --gene/--gene-all prefilters, and the
--assoc perm/mperm set-test (SET/NSNP/NSIG/ISIG/EMP1/SNPS report)."""

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


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    """220 samples x 80 markers over 2 chromosomes, cc pheno, gene
    ranges file + explicit set file."""
    d = tmp_path_factory.mktemp("sets")
    rng = np.random.default_rng(11)
    S, M = 220, 80
    with open(d / "p.map", "w") as f:
        for j in range(M):
            chrom = 1 if j < 50 else 2
            pos = 100000 + (j if j < 50 else j - 50) * 2000
            f.write(f"{chrom} snp{j} 0 {pos}\n")
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            base = 0.25 + 0.3 * (i % 2)  # built-in case/control signal
            g = " ".join(
                al[rng.binomial(2, base if j % 7 == 3 else 0.35)
                   if rng.random() > 0.02 else 3]
                for j in range(M))
            f.write(f"F{i} I{i} 0 0 {1 + i % 2} {1 + i % 2} {g}\n")
    # --make-set ranges: named genes, overlapping + an empty one
    with open(d / "genes.txt", "w") as f:
        f.write("1 100000 120000 GENE_A\n")
        f.write("1 115000 150000 GENE_B\n")
        f.write("1 180000 190000 GENE_C\n")
        f.write("2 100000 140000 GENE_D\n")
        f.write("2 900000 990000 GENE_EMPTY\n")
        f.write("1 130000 160000 GENE_A\n")  # second range, same set
    # explicit --set file
    with open(d / "sets.txt", "w") as f:
        f.write("SET1\nsnp1\nsnp4\nsnp9\nsnp12\nEND\n\n")
        f.write("SET2\nsnp30\nsnp31\nsnp32\nsnp55\nsnp60\nnosuch\nEND\n")
    run19(["--file", "p", "--make-bed", "--allow-no-sex", "--out", "pb"],
          str(d))
    return d


def test_write_set_from_make_set(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt", "--write-set",
            "--set-table", "--allow-no-sex"]
    run19(args + ["--out", "o_ws"], str(d))
    run_tpu(args + ["--out", "t_ws", "--silent"], str(d))
    _cmp(d, "o_ws.set", "t_ws.set")
    _cmp(d, "o_ws.set.table", "t_ws.set.table")


def test_write_set_border_collapse(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt",
            "--make-set-border", "5", "--write-set", "--allow-no-sex"]
    run19(args + ["--out", "o_wb"], str(d))
    run_tpu(args + ["--out", "t_wb", "--silent"], str(d))
    _cmp(d, "o_wb.set", "t_wb.set")


def test_write_set_from_set_file(panel):
    d = panel
    args = ["--bfile", "pb", "--set", "sets.txt", "--write-set",
            "--set-table", "--allow-no-sex"]
    run19(args + ["--out", "o_sf"], str(d))
    run_tpu(args + ["--out", "t_sf", "--silent"], str(d))
    _cmp(d, "o_sf.set", "t_sf.set")
    _cmp(d, "o_sf.set.table", "t_sf.set.table")


def test_gene_all_prefilter(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt", "--gene-all",
            "--write-set", "--make-bed", "--allow-no-sex"]
    run19(args + ["--out", "o_ga"], str(d))
    run_tpu(args + ["--out", "t_ga", "--silent"], str(d))
    _cmp(d, "o_ga.set", "t_ga.set")
    _cmp(d, "o_ga.bim", "t_ga.bim")
    _cmp(d, "o_ga.bed", "t_ga.bed")


def test_gene_subset_prefilter(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt", "--gene",
            "GENE_B", "GENE_D", "--write-set", "--make-bed",
            "--allow-no-sex"]
    run19(args + ["--out", "o_gs"], str(d))
    run_tpu(args + ["--out", "t_gs", "--silent"], str(d))
    _cmp(d, "o_gs.set", "t_gs.set")
    _cmp(d, "o_gs.bim", "t_gs.bim")


def test_complement_collapse_all(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt",
            "--make-set-complement-all", "NOTGENES", "--write-set",
            "--allow-no-sex"]
    run19(args + ["--out", "o_cc"], str(d))
    run_tpu(args + ["--out", "t_cc", "--silent"], str(d))
    _cmp(d, "o_cc.set", "t_cc.set")


def test_assoc_set_test_perm(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt", "--assoc",
            "perm", "set-test", "--aperm", "5", "200", "0", "0.0001",
            "1", "0.001", "--seed", "77", "--threads", "1",
            "--allow-no-sex"]
    run19(args + ["--out", "o_st"], str(d))
    run_tpu(args + ["--out", "t_st", "--silent"], str(d))
    _cmp(d, "o_st.assoc", "t_st.assoc")
    _cmp(d, "o_st.assoc.set.perm", "t_st.assoc.set.perm")


def test_assoc_set_test_mperm(panel):
    d = panel
    args = ["--bfile", "pb", "--set", "sets.txt", "--assoc",
            "mperm=150", "set-test", "--seed", "123", "--threads", "1",
            "--allow-no-sex"]
    run19(args + ["--out", "o_sm"], str(d))
    run_tpu(args + ["--out", "t_sm", "--silent"], str(d))
    _cmp(d, "o_sm.assoc", "t_sm.assoc")
    _cmp(d, "o_sm.assoc.set.mperm", "t_sm.assoc.set.mperm")


def test_assoc_set_test_r2_and_max(panel):
    d = panel
    args = ["--bfile", "pb", "--make-set", "genes.txt", "--assoc",
            "mperm=100", "set-test", "--set-r2", "0.25", "--set-max",
            "2", "--set-p", "0.2", "--seed", "5", "--threads", "4",
            "--allow-no-sex"]
    run19(args + ["--out", "o_sr"], str(d))
    run_tpu(args + ["--out", "t_sr", "--silent"], str(d))
    _cmp(d, "o_sr.assoc.set.mperm", "t_sr.assoc.set.mperm")

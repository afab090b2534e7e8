"""--tdt differential tests: byte-diffed against plink 1.9
(tdt / tdt_poo, 1.9/plink_family.c:1739-2560)."""

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
def trio_panel(tmp_path_factory):
    """45 nuclear families (1-3 children) + 20 singletons over
    chr1/chr2/chrX with 4% missingness, mixed sexes and phenotypes
    (including discordant parent pairs for parenTDT)."""
    d = tmp_path_factory.mktemp("tdt")
    rng = np.random.default_rng(7)
    M_a, M_x = 260, 60
    M = M_a + M_x
    chrom = [1] * 130 + [2] * 130 + [23] * M_x
    pos = (list(range(100000, 100000 + 130 * 2000, 2000)) * 2
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
        if fam % 3 == 0:
            ppheno = [2, 1]
        elif fam % 5 == 0:
            ppheno = [1, 1]
        else:
            ppheno = [-9, 1] if fam % 7 == 0 else [1, 2]
        for pi, (sx, ph) in enumerate(zip([1, 2], ppheno)):
            g = " ".join(geno_pair(freqs[j]) for j in range(M))
            lines.append(f"{fid} P{pi} 0 0 {sx} {ph} {g}")
        for k in range(1 + fam % 3):
            sx = 1 + (fam + k) % 2
            ph = 2 if (fam + k) % 2 == 0 else 1
            g = " ".join(geno_pair(freqs[j]) for j in range(M))
            lines.append(f"{fid} K{k} P0 P1 {sx} {ph} {g}")
    for s in range(20):
        g = " ".join(geno_pair(freqs[j]) for j in range(M))
        lines.append(f"S{s} I0 0 0 {1 + s % 2} {1 + s % 2} {g}")
    (d / "panel.ped").write_text("\n".join(lines) + "\n")
    run19(["--file", "panel", "--make-bed", "--out", "pb"], str(d))
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def test_tdt_default(trio_panel):
    d = trio_panel
    run19(["--bfile", "pb", "--tdt", "--out", "o"], str(d))
    run_tpu(["--bfile", "pb", "--tdt", "--out", "t", "--silent"], str(d))
    _cmp(d, "o.tdt", "t.tdt")


@pytest.mark.parametrize("mode", ["exact", "exact-midp"])
def test_tdt_exact(trio_panel, mode):
    d = trio_panel
    run19(["--bfile", "pb", "--tdt", mode, "--out", f"o_{mode}"], str(d))
    run_tpu(["--bfile", "pb", "--tdt", mode, "--out", f"t_{mode}",
             "--silent"], str(d))
    _cmp(d, f"o_{mode}.tdt", f"t_{mode}.tdt")


def test_tdt_poo(trio_panel):
    d = trio_panel
    run19(["--bfile", "pb", "--tdt", "poo", "--out", "o_poo"], str(d))
    run_tpu(["--bfile", "pb", "--tdt", "poo", "--out", "t_poo",
             "--silent"], str(d))
    _cmp(d, "o_poo.tdt.poo", "t_poo.tdt.poo")


def test_tdt_ci(trio_panel):
    d = trio_panel
    run19(["--bfile", "pb", "--tdt", "--ci", "0.95", "--out", "o_ci"],
          str(d))
    run_tpu(["--bfile", "pb", "--tdt", "--ci", "0.95", "--out", "t_ci",
             "--silent"], str(d))
    _cmp(d, "o_ci.tdt", "t_ci.tdt")


def test_tucc_write_bed(trio_panel):
    d = trio_panel
    run19(["--bfile", "pb", "--tucc", "write-bed", "--allow-no-sex",
           "--out", "o_tu"], str(d))
    run_tpu(["--bfile", "pb", "--tucc", "write-bed", "--allow-no-sex",
             "--out", "t_tu", "--silent"], str(d))
    for ext in ("fam", "bim", "bed"):
        _cmp(d, f"o_tu.tucc.{ext}", f"t_tu.tucc.{ext}")


def test_tucc_ped(trio_panel):
    d = trio_panel
    run19(["--bfile", "pb", "--tucc", "--allow-no-sex",
           "--out", "o_tp"], str(d))
    run_tpu(["--bfile", "pb", "--tucc", "--allow-no-sex",
             "--out", "t_tp", "--silent"], str(d))
    _cmp(d, "o_tp.tucc.ped", "t_tp.tucc.ped")

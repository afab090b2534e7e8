"""--blocks differential tests: byte-diffed against plink 1.9
(haploview_blocks, 1.9/plink_ld.c:7114-7710)."""

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
def ld_panel(tmp_path_factory):
    """300 samples x 400 markers with simulated haplotype-block LD
    structure over chr1 + chrX, 2% missingness."""
    d = tmp_path_factory.mktemp("blocks")
    rng = np.random.default_rng(11)
    S, M = 300, 400
    geno = np.zeros((M, S), int)
    pos = np.zeros(M, int)
    chrom = np.zeros(M, int)
    m = 0
    for c, code in ((1, 1), (2, 23)):
        cur_pos = 100000
        while m < M * c // 2:
            blk = min(int(rng.integers(2, 9)), M * c // 2 - m)
            haps = rng.integers(0, 2, (4, blk))
            hapfreq = rng.dirichlet(np.ones(4) * 2)
            h1 = haps[rng.choice(4, S, p=hapfreq)]
            h2 = haps[rng.choice(4, S, p=hapfreq)]
            g = (h1 + h2).T
            miss = rng.random((blk, S)) < 0.02
            g[miss] = 3
            geno[m:m + blk] = g
            for k in range(blk):
                pos[m + k] = cur_pos
                chrom[m + k] = code
                cur_pos += int(rng.integers(500, 6000))
            m += blk
    with open(d / "p.map", "w") as f:
        for j in range(M):
            f.write(f"{chrom[j]} s{j} 0 {pos[j]}\n")
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            gs = " ".join(al[geno[j, i]] for j in range(M))
            f.write(f"F{i} I{i} 0 0 {1 + i % 2} {1 + i % 2} {gs}\n")
    run19(["--file", "p", "--make-bed", "--out", "pb"], str(d))
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.mark.parametrize("extra", [
    [],
    ["--blocks-min-maf", "0.2"],
    ["--blocks-max-kb", "50"],
    ["--blocks-strong-lowci", "0.75", "--blocks-strong-highci", "0.95",
     "--blocks-recomb-highci", "0.85", "--blocks-inform-frac", "0.90"],
])
def test_blocks(ld_panel, extra):
    d = ld_panel
    tag = "_".join(extra).replace("--", "").replace(".", "") or "def"
    run19(["--bfile", "pb", "--blocks", "no-pheno-req"] + extra
          + ["--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--blocks", "no-pheno-req"] + extra
            + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.blocks", f"t_{tag}.blocks")
    _cmp(d, f"o_{tag}.blocks.det", f"t_{tag}.blocks.det")


def test_blocks_pheno_req(ld_panel):
    d = ld_panel
    run19(["--bfile", "pb", "--blocks", "--out", "o_ph"], str(d))
    run_tpu(["--bfile", "pb", "--blocks", "--out", "t_ph", "--silent"],
            str(d))
    _cmp(d, "o_ph.blocks", "t_ph.blocks")
    _cmp(d, "o_ph.blocks.det", "t_ph.blocks.det")

"""--unrelated-heritability (ref reml_em_one_trait + unrelated_herit_batch,
1.9/plink_calc.c:2200-2666).  The STABLE 1.9 build refuses the flag and the
reference's --grm-bin batch loader has an fread item-count-vs-byte-count
bug ("File read failure" always), so the differential runs the dev-build
oracle's IN-RUN mode against our batch mode on the oracle's own
--make-grm-bin matrix."""

import os
import subprocess

import numpy as np
import pytest

P19DEV = os.environ.get("PLINK19DEV_ORACLE", "/tmp/oracle19dev/plink")
pytestmark = pytest.mark.skipif(
    not os.path.exists(P19DEV), reason="plink 1.9 dev oracle not built"
)


def test_unrelated_heritability_twins(tmp_path):
    from plink_tpu.cli import main
    from plink_tpu.io.pgen_write import write_pgen_simple
    from plink_tpu.ops.pairwise import _pack_np

    rng = np.random.default_rng(11)
    n_u, m = 60, 300
    maf = rng.uniform(0.1, 0.5, m)
    gu = ((rng.random((m, n_u)) < maf[:, None]).astype(np.uint8)
          + (rng.random((m, n_u)) < maf[:, None]).astype(np.uint8))
    g = np.repeat(gu, 2, axis=1)  # twin pairs -> identifiable REML optimum
    write_pgen_simple(str(tmp_path / "tw.pgen"),
                      _pack_np(g, -(-120 // 4) * 4), 120)
    with open(tmp_path / "tw.pvar", "w") as f:
        f.write("#CHROM\tPOS\tID\tREF\tALT\n")
        for i in range(m):
            f.write(f"1\t{i+1}\tv{i}\tA\tC\n")
    with open(tmp_path / "tw.psam", "w") as f:
        f.write("#IID\tSEX\n")
        for i in range(120):
            f.write(f"s{i}\t1\n")
    gv = rng.standard_normal(n_u)
    y = np.repeat(gv, 2) * np.sqrt(0.6) \
        + rng.standard_normal(120) * np.sqrt(0.4)
    with open(tmp_path / "ph.txt", "w") as f:
        for i in range(120):
            f.write(f"0 s{i} {y[i]:.6f}\n")
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "tw", "--make-bed", "--out", "twb",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run(
        [P19DEV, "--bfile", "twb", "--pheno", "ph.txt",
         "--unrelated-heritability", "--out", "o", "--silent"],
        cwd=tmp_path, check=True, capture_output=True, timeout=500,
    )
    subprocess.run(
        [P19DEV, "--bfile", "twb", "--make-grm-bin", "--out", "g",
         "--silent"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    os.chdir(tmp_path)
    try:
        assert main(["--grm-bin", "g", "--pheno", "ph.txt",
                     "--unrelated-heritability", "--out", "t",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    h_o = [l for l in (tmp_path / "o.log").read_text().splitlines()
           if l.startswith("h^2")][0]
    h_t = [l for l in (tmp_path / "t.log").read_text().splitlines()
           if l.startswith("h^2")][0]
    assert h_o == h_t, (h_o, h_t)

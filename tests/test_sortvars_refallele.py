"""--sort-vars, --ref-allele [force], --set-missing-var-ids, and
--export phylip-phased differential tests."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("sortref")
    subprocess.run(
        [ORACLE, "--dummy", "60", "40", "0.02", "--seed", "11", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    (d / "um.txt").write_text("snp3 900\nsnp5 2\n")
    (d / "ra.txt").write_text("snp0\tB\nsnp4\tA\n")
    return d


def test_sort_vars(panel):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gq", "--update-map", "um.txt", "--sort-vars",
             "--make-pgen"]
    subprocess.run([ORACLE] + flags + ["--out", "o_s"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_s", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_s.pvar").read_text() == (d / "t_s.pvar").read_text()
    for stem in ("o_s", "t_s"):
        subprocess.run([ORACLE, "--pfile", stem, "--freq", "--out",
                        f"{stem}_f"], cwd=d, check=True, capture_output=True)
    assert (d / "o_s_f.afreq").read_text() == (d / "t_s_f.afreq").read_text()


def test_ref_allele(panel):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gq", "--ref-allele", "force", "ra.txt",
             "--export", "A"]
    subprocess.run([ORACLE] + flags + ["--out", "o_r"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_r", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_r.raw").read_text() == (d / "t_r.raw").read_text()


def test_phylip_phased(panel):
    import random

    from plink_tpu.cli import main

    d = panel
    random.seed(9)
    lines = ["##fileformat=VCFv4.2", "##contig=<ID=1>",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"s{i}" for i in range(6))]
    for v in range(10):
        row = f"1\t{100 + v}\tv{v}\tA\tC\t.\t.\t.\tGT"
        for s in range(6):
            row += "\t" + random.choice(["0|0", "0|1", "1|0", "1|1"])
        lines.append(row)
    (d / "full.vcf").write_text("\n".join(lines) + "\n")
    flags = ["--vcf", "full.vcf", "--export", "phylip-phased"]
    subprocess.run([ORACLE] + flags + ["--out", "o_p"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_p", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_p.phy").read_text() == (d / "t_p.phy").read_text()

"""Interval/ID-range variant filters differential tests: --extract
bed0/bed1, --extract-intersect, --snp/--snps/--exclude-snps + --window,
--from/--to; byte-identical snplists vs the oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("ranges")
    subprocess.run(
        [ORACLE, "--dummy", "50", "400", "0.02", "--seed", "11", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    (d / "iv.bed0").write_text("1\t10\t20\n1\t100\t110\n")
    (d / "iv.bed1").write_text("1 11 20 r1\n1 101 110 r2\n")
    (d / "el1.txt").write_text("snp3\nsnp4\nsnp5\n")
    (d / "el2.txt").write_text("snp4\nsnp5\nsnp6\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--extract", "bed0", "iv.bed0"],
        ["--extract", "bed1", "iv.bed1"],
        ["--exclude", "bed1", "iv.bed1"],
        ["--extract-intersect", "el1.txt", "el2.txt"],
        ["--snp", "snp50", "--window", "0.01"],
        ["--from", "snp10", "--to", "snp15"],
        ["--snps", "snp3-snp7,snp100"],
        ["--exclude-snps", "snp3-snp396"],
    ],
)
def test_range_filters(panel, flags):
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq"] + flags + ["--write-snplist"]
    subprocess.run([ORACLE] + full + ["--out", "o_r"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_r", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_r.snplist").read_text() == (d / "t_r.snplist").read_text()

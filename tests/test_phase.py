"""Hardcall-phase support differential tests: phased VCF import round-trip
(vrtype-0x10 tracks with byte-aligned explicit phasepresent), per-sample
prev_phased VCF export state machine, fully-phased haps/hapslegend export,
phase-preserving make-pgen (oracle reads our pgen), and --indep-pairphase
via haplotype-column expansion."""

import os
import random
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("phase")
    random.seed(3)
    hdr = ["##fileformat=VCFv4.2", "##contig=<ID=1>",
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
           + "\t".join(f"s{i}" for i in range(8))]
    pool = ["0|0", "0|1", "1|0", "1|1", "0/1", "1/1", "./.", "0/0"]
    lines = list(hdr)
    for v in range(12):
        row = f"1\t{100 + v}\tv{v}\tA\tC\t.\t.\t.\tGT"
        for s in range(8):
            row += "\t" + random.choice(pool)
        lines.append(row)
    (d / "ph.vcf").write_text("\n".join(lines) + "\n")
    lines = list(hdr)
    for v in range(10):
        row = f"1\t{100 + v}\tv{v}\tA\tC\t.\t.\t.\tGT"
        for s in range(8):
            row += "\t" + random.choice(["0|0", "0|1", "1|0", "1|1"])
        lines.append(row)
    (d / "full.vcf").write_text("\n".join(lines) + "\n")
    # LD panel for pairphase
    import numpy as np

    rng = np.random.default_rng(7)
    N, V = 100, 60
    haps = np.zeros((2 * N, V), np.int8)
    for h in range(2 * N):
        x = rng.random() < 0.5
        for v in range(V):
            if rng.random() < 0.2:
                x = rng.random() < 0.5
            haps[h, v] = x
    lines = ["##fileformat=VCFv4.2", "##contig=<ID=1>",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"s{i}" for i in range(N))]
    for v in range(V):
        row = f"1\t{100 + v * 3}\tv{v}\tA\tC\t.\t.\t.\tGT"
        for s in range(N):
            row += f"\t{haps[2 * s, v]}|{haps[2 * s + 1, v]}"
        lines.append(row)
    (d / "ld.vcf").write_text("\n".join(lines) + "\n")
    return d


def _body(p):
    return [l for l in open(p).read().splitlines() if not l.startswith("##")]


def test_phased_vcf_roundtrip(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--vcf", "ph.vcf", "--export", "vcf", "--out",
                    "o_v"], cwd=d, check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--vcf", "ph.vcf", "--export", "vcf", "--out", "t_v",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    assert _body(d / "o_v.vcf") == _body(d / "t_v.vcf")


def test_haps_export(panel):
    from plink_tpu.cli import main

    d = panel
    for fmt in ("haps", "hapslegend"):
        subprocess.run([ORACLE, "--vcf", "full.vcf", "--export", fmt,
                        "--out", "o_h"], cwd=d, check=True,
                       capture_output=True)
        old = os.getcwd()
        os.chdir(d)
        try:
            assert main(["--vcf", "full.vcf", "--export", fmt, "--out",
                         "t_h", "--silent"]) == 0
        finally:
            os.chdir(old)
        assert (d / "o_h.haps").read_text() == (d / "t_h.haps").read_text()
        if fmt == "hapslegend":
            assert (d / "o_h.legend").read_text() == (
                d / "t_h.legend"
            ).read_text()


def test_phase_preserving_make_pgen(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--vcf", "ph.vcf", "--make-pgen", "--out", "t_p",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run([ORACLE, "--pfile", "t_p", "--export", "vcf", "--out",
                    "o_r"], cwd=d, check=True, capture_output=True)
    subprocess.run([ORACLE, "--vcf", "ph.vcf", "--export", "vcf", "--out",
                    "o_v"], cwd=d, check=True, capture_output=True)
    assert _body(d / "o_r.vcf") == _body(d / "o_v.vcf")


def test_indep_pairphase(panel):
    from plink_tpu.cli import main

    d = panel
    flags = ["--vcf", "ld.vcf", "--indep-pairphase", "10", "3", "0.4"]
    subprocess.run([ORACLE] + flags + ["--out", "o_pp"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_pp", "--silent"]) == 0
    finally:
        os.chdir(old)
    for s in ("in", "out"):
        assert (d / f"o_pp.prune.{s}").read_text() == (
            d / f"t_pp.prune.{s}"
        ).read_text()

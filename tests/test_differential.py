"""Differential tests against a locally built plink2 oracle binary,
mirroring the reference's own golden-test strategy (2.0/Tests/run_tests.sh:
build outputs with both engines, diff).  Skipped when no oracle is present.

Oracle build recipe (recorded in BASELINE.md): copy /root/reference/2.0 to a
scratch dir, `make NO_LAPACK=1` in build_dynamic (needs a zlib header shim
and a math.h include fix in the NOLAPACK branch of plink2_matrix.h).
"""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")


def run_oracle(args, cwd):
    subprocess.run([ORACLE] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def dummy_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("diffdata")
    run_oracle(
        ["--dummy", "400", "1500", "0.08", "--seed", "42", "--out", "panel"], str(d)
    )
    return d


def _assert_same(d, stem_a, stem_b, exts):
    for ext in exts:
        a = (d / f"{stem_a}.{ext}").read_bytes()
        b = (d / f"{stem_b}.{ext}").read_bytes()
        assert a == b, f".{ext} differs\noracle:\n{a[:400]}\nplink_tpu:\n{b[:400]}"


def test_basic_reports_match(dummy_panel):
    d = dummy_panel
    flags = ["--pfile", "panel", "--freq", "--missing", "--hardy", "--geno-counts"]
    run_oracle(flags + ["--out", "o_basic"], str(d))
    run_tpu(flags + ["--out", "t_basic"], str(d))
    _assert_same(d, "o_basic", "t_basic", ["afreq", "vmiss", "smiss", "hardy", "gcount"])


def test_filters_match(dummy_panel):
    d = dummy_panel
    flags = [
        "--pfile", "panel", "--maf", "0.05", "--geno", "0.05", "--hwe", "0.001",
        "--freq", "--write-snplist",
    ]
    run_oracle(flags + ["--out", "o_filt"], str(d))
    run_tpu(flags + ["--out", "t_filt"], str(d))
    _assert_same(d, "o_filt", "t_filt", ["afreq", "snplist"])


def test_make_bed_roundtrip_match(dummy_panel):
    d = dummy_panel
    flags = ["--pfile", "panel", "--make-bed"]
    run_oracle(flags + ["--out", "o_bed"], str(d))
    run_tpu(flags + ["--out", "t_bed"], str(d))
    _assert_same(d, "o_bed", "t_bed", ["bed", "bim", "fam"])


def test_our_pgen_readable_by_oracle(dummy_panel):
    d = dummy_panel
    run_tpu(["--pfile", "panel", "--make-pgen", "--out", "t_copy"], str(d))
    # Oracle validates and re-reports on our .pgen output.
    run_oracle(["--pfile", "t_copy", "--validate", "--out", "o_val"], str(d))
    run_oracle(["--pfile", "t_copy", "--freq", "--out", "o_refreq"], str(d))
    run_oracle(["--pfile", "panel", "--freq", "--out", "o_freq"], str(d))
    a = (d / "o_refreq.afreq").read_text().splitlines()
    b = (d / "o_freq.afreq").read_text().splitlines()
    assert a == b


def test_king_table_filter_match(dummy_panel):
    d = dummy_panel
    flags = ["--pfile", "panel", "--make-king-table", "--king-table-filter",
             "0.05"]
    run_oracle(flags + ["--out", "o_ktf"], str(d))
    run_tpu(flags + ["--out", "t_ktf"], str(d))
    _assert_same(d, "o_ktf", "t_ktf", ["kin0"])
    # filter log line parity (counts reported/filtered)
    o = (d / "o_ktf.log").read_text()
    t = (d / "t_ktf.log").read_text()
    oline = [l for l in o.splitlines() if l.startswith("--king-table-filter:")]
    tline = [l for l in t.splitlines() if l.startswith("--king-table-filter:")]
    assert oline == tline

"""--parallel sharding, --make-king bin shapes, and --king-cutoff resume
from a triangular .king.bin (ParallelBounds/TriangleDivide port,
KingCutoffBatchBinary): byte/bit-identical outputs vs the oracle."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("kingpar")
    subprocess.run(
        [ORACLE, "--dummy", "120", "200", "0.02", "--seed", "3", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize("k", ["1", "2", "3"])
def test_parallel_king_table(panel, k):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gp", "--make-king-table", "--parallel", k, "3"]
    subprocess.run([ORACLE] + flags + ["--out", "o_p"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_p", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"o_p.kin0.{k}").read_text() == (
        d / f"t_p.kin0.{k}"
    ).read_text()


def test_king_bin_and_cutoff_resume(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--pfile", "gp", "--make-king", "triangle",
                    "bin", "--out", "o_b"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gp", "--make-king", "triangle", "bin",
                     "--out", "t_b", "--silent"]) == 0
        assert main(["--pfile", "gp", "--king-cutoff", "t_b", "0.1",
                     "--out", "t_c", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert np.array_equal(
        np.fromfile(d / "o_b.king.bin"), np.fromfile(d / "t_b.king.bin")
    )
    subprocess.run([ORACLE, "--pfile", "gp", "--king-cutoff", "o_b", "0.1",
                    "--out", "o_c"], cwd=d, check=True, capture_output=True)
    for s in ("in", "out"):
        assert (d / f"o_c.king.cutoff.{s}.id").read_text() == (
            d / f"t_c.king.cutoff.{s}.id"
        ).read_text()

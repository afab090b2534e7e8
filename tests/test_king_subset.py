"""--king-table-subset differential tests (CalcKingTableSubset,
2.0/plink2_matrix_calc.cc:2754): byte-identical pair-restricted .kin0 vs
the oracle, preserving input pair orientation/order and the optional
kinship threshold filter."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("kingsub")
    subprocess.run(
        [ORACLE, "--dummy", "60", "300", "0.02", "--seed", "3", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "gp", "--make-king-table", "--out", "full"],
        cwd=d, check=True, capture_output=True,
    )
    lines = (d / "full.kin0").read_text().splitlines()
    (d / "subset.kin0").write_text(
        "\n".join([lines[0]] + lines[5:12] + [lines[20]]) + "\n"
    )
    (d / "subset_swap.kin0").write_text(
        "#IID1\tIID2\tKINSHIP\nper0\tper5\t0.3\nper7\tper2\t0.01\n"
    )
    return d


@pytest.mark.parametrize(
    "extra",
    [
        ["--king-table-subset", "subset.kin0"],
        ["--king-table-subset", "subset_swap.kin0"],
        ["--king-table-subset", "subset_swap.kin0", "0.1"],
    ],
)
def test_king_table_subset(panel, extra):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gp"] + extra + ["--make-king-table"]
    subprocess.run([ORACLE] + flags + ["--out", "o_k"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_k", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_k.kin0").read_text() == (d / "t_k.kin0").read_text()

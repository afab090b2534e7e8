"""--clump differential tests.

Index rows (identity + P) must match byte-wise; member columns
(TOTAL/NONSIG/bins/SP2) may differ on at most 2% of rows, covering the
reference's ambiguous-haplotype root-selection edge documented in
commands/clump.py."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("clump")
    subprocess.run(
        [ORACLE, "--dummy", "400", "250", "0.04", "--seed", "37", "--out", "cp"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "cp", "--glm", "allow-no-covars", "hide-covar",
         "--out", "as"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize(
    "params",
    [["--clump-p1", "0.5", "--clump-p2", "0.8", "--clump-r2", "0.3",
      "--clump-kb", "100"],
     ["--clump-p1", "0.2", "--clump-p2", "0.4", "--clump-r2", "0.5"]],
)
def test_clump_differential(panel, params):
    from plink_tpu.cli import main

    flags = ["--pfile", "cp", "--clump",
             "as.PHENO1.glm.logistic.hybrid"] + params
    tag = params[-1].replace(".", "")
    subprocess.run([ORACLE] + flags + ["--out", f"o{tag}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{tag}"]) == 0
    finally:
        os.chdir(old)
    la = (panel / f"o{tag}.clumps").read_text().splitlines()
    lb = (panel / f"t{tag}.clumps").read_text().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    diff_rows = 0
    for a, b in zip(la[1:], lb[1:]):
        if a == b:
            continue
        ta, tb = a.split("\t"), b.split("\t")
        # index identity and p must always match
        assert ta[:4] == tb[:4], f"index row differs:\n{a}\n{b}"
        diff_rows += 1
    assert diff_rows <= max(1, len(la) // 50), f"{diff_rows} member-col diffs"


@pytest.mark.parametrize("extras,tag", [
    (["--clump-range", "genes.txt"], "range"),
    (["--clump-range0", "genes.txt"], "range0"),
    (["--clump-range", "genes.txt", "--clump-range-border", "0.02"],
     "border"),
    (["--clump-bins", "0.001,0.02,0.3"], "bins"),
    (["--clump-allow-overlap"], "overlap"),
], ids=lambda x: x if isinstance(x, str) else None)
def test_clump_range_bins_overlap(panel, extras, tag):
    """--clump-range[0]/--clump-range-border/--clump-bins/
    --clump-allow-overlap (ClumpReports, 2.0/plink2_ld.cc:9040-9400)."""
    from plink_tpu.cli import main

    d = panel
    (d / "genes.txt").write_text(
        "1 20 60 ZGENE\n1 50 120 AGENE\n1 55 58 MGENE\n1 200 210 CGENE\n")
    flags = ["--pfile", "cp", "--clump", "as.PHENO1.glm.logistic.hybrid",
             "--clump-p1", "0.1", "--clump-p2", "0.4"] + extras
    subprocess.run([ORACLE] + flags + ["--out", f"o_{tag}"], cwd=d,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", f"t_{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"o_{tag}.clumps").read_bytes() == \
        (d / f"t_{tag}.clumps").read_bytes()

"""--keep-if / --remove-if differential tests vs the plink2 oracle
(KeepRemoveIf, 2.0/plink2_filter.cc): quantitative/binary/existence
comparisons on psam phenotypes and --covar columns, byte-identical
--write-samples output."""

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
    d = tmp_path_factory.mktemp("keepif")
    subprocess.run(
        [ORACLE, "--dummy", "100", "50", "0.04", "scalar-pheno", "--seed",
         "7", "--out", "kq"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--dummy", "100", "50", "0.04", "--seed", "7", "--out", "kb"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(2)
    ids = [l.split("\t")[0] for l in (d / "kq.psam").read_text().splitlines()[1:]]
    with open(d / "kq.cov", "w") as f:
        f.write("#IID\tAGE\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.integers(20, 80)}\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--pfile", "kq", "--keep-if", "PHENO1", ">", "1.0"],
        ["--pfile", "kq", "--keep-if", "PHENO1<=0.5"],
        ["--pfile", "kq", "--keep-if", "PHENO1"],
        ["--pfile", "kb", "--keep-if", "PHENO1", "==", "case"],
        ["--pfile", "kb", "--remove-if", "PHENO1", "==", "control"],
        ["--pfile", "kq", "--covar", "kq.cov", "--keep-if", "AGE", ">=", "50"],
        ["--pfile", "kq", "--covar", "kq.cov", "--remove-if", "AGE", "<", "40"],
    ],
)
def test_keep_remove_if(panel, flags):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE] + flags + ["--write-samples", "--out", "o_ki"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--write-samples", "--out", "t_ki", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_ki.id").read_text() == (d / "t_ki.id").read_text()


def test_no_samples_remaining(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        with pytest.raises(ValueError, match="No samples remaining"):
            main(["--pfile", "kq", "--remove-if", "PHENO1", "!=", "123456",
                  "--write-samples", "--out", "t_ns", "--silent"])
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def cat_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("keepcats")
    subprocess.run(
        [ORACLE, "--dummy", "90", "30", "0.02", "scalar-pheno", "--seed",
         "7", "--out", "kq"],
        cwd=d, check=True, capture_output=True,
    )
    ids = [l.split("\t")[0] for l in (d / "kq.psam").read_text().splitlines()[1:]]
    with open(d / "pop.txt", "w") as f:
        f.write("#IID\tPOP\n")
        for k, iid in enumerate(ids):
            f.write(f"{iid}\tP{k % 3 + 1}\n")
    (d / "cats.txt").write_text("P2\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--keep-cat-pheno", "POP", "--keep-cat-names", "P1", "P3"],
        ["--keep-cat-pheno", "POP", "--keep-cats", "cats.txt"],
        ["--remove-cat-pheno", "POP", "--remove-cats", "cats.txt"],
    ],
)
def test_keep_remove_cats(cat_panel, flags):
    from plink_tpu.cli import main

    d = cat_panel
    full = ["--pfile", "kq", "--pheno", "pop.txt"] + flags + ["--write-samples"]
    subprocess.run([ORACLE] + full + ["--out", "o_c"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_c", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_c.id").read_text() == (d / "t_c.id").read_text()

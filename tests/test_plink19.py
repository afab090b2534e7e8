"""PLINK 1.9 analysis parity: --assoc / --model / --genome byte-diffed
against a locally built plink 1.9 binary."""

import os
import subprocess

import pytest

ORACLE2 = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(ORACLE19) and os.path.exists(ORACLE2)),
    reason="plink 1.9 oracle not built",
)


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def bed_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("p19")
    subprocess.run(
        [ORACLE2, "--dummy", "200", "500", "0.05", "--seed", "33",
         "--out", "pp"], cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE2, "--pfile", "pp", "--make-bed", "--out", "pb"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def test_assoc(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--assoc", "--allow-no-sex", "--out", "o"],
          str(d))
    run_tpu(["--bfile", "pb", "--assoc", "--allow-no-sex", "--out", "t",
             "--silent"], str(d))
    _cmp(d, "o.assoc", "t.assoc")


def test_assoc_counts(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--assoc", "counts", "--allow-no-sex",
           "--out", "oc"], str(d))
    run_tpu(["--bfile", "pb", "--assoc", "counts", "--allow-no-sex",
             "--out", "tc", "--silent"], str(d))
    _cmp(d, "oc.assoc", "tc.assoc")


def test_model(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--model", "--allow-no-sex", "--out", "om"],
          str(d))
    run_tpu(["--bfile", "pb", "--model", "--allow-no-sex", "--out", "tm",
             "--silent"], str(d))
    _cmp(d, "om.model", "tm.model")


def test_model_cell(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--model", "--cell", "2", "--allow-no-sex",
           "--out", "om2"], str(d))
    run_tpu(["--bfile", "pb", "--model", "--cell", "2", "--allow-no-sex",
             "--out", "tm2", "--silent"], str(d))
    _cmp(d, "om2.model", "tm2.model")


def test_genome(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--genome", "--out", "og"], str(d))
    run_tpu(["--bfile", "pb", "--genome", "--out", "tg", "--silent"],
            str(d))
    _cmp(d, "og.genome", "tg.genome")

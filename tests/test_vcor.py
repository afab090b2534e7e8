"""--r[2]-[un]phased differential tests (byte-identical vs plink2 oracle)."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("vcor")
    subprocess.run(
        [ORACLE, "--dummy", "350", "260", "0.04", "--seed", "23", "--out", "vp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize(
    "flag,extra",
    [("--r2-unphased", []), ("--r2-phased", []),
     ("--r-unphased", ["--ld-window-r2", "0.4"]),
     ("--r-phased", ["--ld-window-r2", "0.4"])],
)
def test_vcor_differential(panel, flag, extra):
    from plink_tpu.cli import main

    stem = flag.strip("-").replace("-", "_")
    flags = ["--pfile", "vp", flag] + extra
    subprocess.run([ORACLE] + flags + ["--out", f"o{stem}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{stem}"]) == 0
    finally:
        os.chdir(old)
    assert (panel / f"o{stem}.vcor").read_bytes() == (
        panel / f"t{stem}.vcor"
    ).read_bytes()

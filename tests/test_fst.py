"""--fst differential tests (Hudson + Weir-Cockerham, byte-identical)."""

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
    d = tmp_path_factory.mktemp("fst")
    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.05", "--seed", "41", "--out", "fp"],
        cwd=d, check=True, capture_output=True,
    )
    rng = random.Random(6)
    lines = (d / "fp.psam").read_text().splitlines()
    with open(d / "fp.psam", "w") as f:
        f.write(lines[0] + "\tPOP\n")
        for l in lines[1:]:
            f.write(l + "\t" + rng.choice(["AFR", "EUR", "EAS"]) + "\n")
    return d


@pytest.mark.parametrize("method", ["hudson", "wc"])
def test_fst_differential(panel, method):
    from plink_tpu.cli import main

    flags = ["--pfile", "fp", "--fst", "POP"]
    if method == "wc":
        flags.append("method=wc")
    subprocess.run([ORACLE] + flags + ["--out", f"o{method}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{method}"]) == 0
    finally:
        os.chdir(old)
    assert (panel / f"o{method}.fst.summary").read_bytes() == (
        panel / f"t{method}.fst.summary"
    ).read_bytes()

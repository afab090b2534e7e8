"""--loop-cats (ref Plink2Core loop, 2.0/plink2.cc:2010-2034): variant
filters + commands re-run per category with <out>.<cat>.* naming, the
loop column dropped from the pheno set, byte-identical to the oracle."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def test_loop_cats(tmp_path):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "60", "40", "0.05", "--seed", "6", "--out", "b"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    rng = np.random.default_rng(3)
    lines = (tmp_path / "b.psam").read_text().splitlines()
    cats = ["EUR", "AFR", "EAS"]
    out = [lines[0] + "\tPOP"]
    for l in lines[1:]:
        out.append(l + "\t" + cats[int(rng.integers(0, 3))])
    (tmp_path / "b.psam").write_text("\n".join(out) + "\n")
    args = ["--pfile", "b", "--loop-cats", "POP", "--freq", "--missing",
            "--maf", "0.1"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(args + ["--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    for c in cats:
        for e in ("afreq", "vmiss", "smiss"):
            o = tmp_path / f"o.{c}.{e}"
            t = tmp_path / f"t.{c}.{e}"
            assert o.exists() == t.exists(), (c, e)
            if o.exists():
                assert o.read_text() == t.read_text(), (c, e)

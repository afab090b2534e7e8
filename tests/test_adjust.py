"""--adjust differential test (tolerance compare: our GLM P values carry
~1e-7 f32-sourced relative error which can flip the 6th printed digit)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
def test_adjust_differential(tmp_path):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "250", "300", "0.03", "scalar-pheno", "--seed",
         "17", "--out", "ap"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    flags = ["--pfile", "ap", "--glm", "allow-no-covars", "hide-covar",
             "--adjust"]
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=tmp_path, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(flags + ["--out", "t"]) == 0
    finally:
        os.chdir(old)
    la = (tmp_path / "o.PHENO1.glm.linear.adjusted").read_text().splitlines()
    lb = (tmp_path / "t.PHENO1.glm.linear.adjusted").read_text().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    for a, b in zip(la[1:], lb[1:]):
        ta, tb = a.split("\t"), b.split("\t")
        assert ta[:3] == tb[:3], f"row identity differs: {a} vs {b}"
        for x, y in zip(ta[3:], tb[3:]):
            fx, fy = float(x), float(y)
            assert abs(fx - fy) <= 1e-5 * max(abs(fx), 1e-10) + 1e-8, (a, b)

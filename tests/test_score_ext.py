"""--score-col-nums / --q-score-range / --score-list differential tests
(ScoreReport, 2.0/plink2_matrix_calc.cc:6892): byte-identical .sscore
outputs vs the plink2 oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("scoreext")
    subprocess.run(
        [ORACLE, "--dummy", "300", "400", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    pvar = (d / "gq.pvar").read_text().splitlines()
    with open(d / "s1.txt", "w") as f1, open(d / "s2.txt", "w") as f2:
        for k, ln in enumerate(pvar[1:31]):
            t = ln.split("\t")
            if k < 20:
                f1.write(f"{t[2]} {t[3]} {k * 0.01} {k * 0.002}\n")
            if k >= 10:
                f2.write(f"{t[2]} {t[4]} {k * 0.03}\n")
    (d / "slist.txt").write_text("s1.txt\ns2.txt\n")
    (d / "qr.ranges").write_text("R1 0 0.1\nR2 0 0.5\nskipme x y\n")
    with open(d / "qr.data", "w") as f:
        for k, ln in enumerate(pvar[1:31]):
            f.write(f"{ln.split(chr(9))[2]} {k * 0.02}\n")
    return d


@pytest.mark.parametrize(
    "flags,outputs",
    [
        (["--score", "s1.txt"], ["sscore"]),
        (["--score", "s1.txt", "--score-col-nums", "3-4"], ["sscore"]),
        (["--score", "s1.txt", "no-mean-imputation"], ["sscore"]),
        (["--score", "s1.txt", "--q-score-range", "qr.ranges", "qr.data"],
         ["R1.sscore", "R2.sscore"]),
        (["--score-list", "slist.txt"], ["sscore"]),
    ],
)
def test_score_ext(panel, flags, outputs):
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_s"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_s", "--silent"]) == 0
    finally:
        os.chdir(old)
    for s in outputs:
        assert (d / f"o_s.{s}").read_text() == (d / f"t_s.{s}").read_text()


@pytest.mark.parametrize(
    "mods",
    [
        ["center"],
        ["variance-standardize"],
        ["dominant"],
        ["recessive"],
        ["center", "no-mean-imputation"],
        ["dominant", "no-mean-imputation"],
        ["list-variants"],
    ],
    ids=lambda m: "+".join(m),
)
def test_score_modifiers(panel, mods):
    """center/variance-standardize/dominant/recessive/list-variants
    (ref: geno_slope/intercept + domrec lookup table,
    2.0/plink2_matrix_calc.cc:6746-6763, 8005-8035)."""
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq", "--score", "s1.txt"] + mods
    subprocess.run([ORACLE] + full + ["--out", "o_m"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_m", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_m.sscore").read_text() == (d / "t_m.sscore").read_text()
    if "list-variants" in mods:
        assert (d / "o_m.sscore.vars").read_text() == \
            (d / "t_m.sscore.vars").read_text()

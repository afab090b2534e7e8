"""PLINK 1.9 --distance / --distance-matrix / --ibs-matrix parity,
byte-diffed against a locally built plink 1.9 binary."""

import gzip
import os
import subprocess

import numpy as np
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
    d = tmp_path_factory.mktemp("dist")
    subprocess.run(
        [ORACLE2, "--dummy", "80", "400", "0.06", "--seed", "91",
         "--out", "pp"], cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE2, "--pfile", "pp", "--make-bed", "--out", "pb"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def _pair(d, mods, o, t):
    run19(["--bfile", "pb", "--distance"] + mods
          + ["--allow-no-sex", "--out", o], str(d))
    run_tpu(["--bfile", "pb", "--distance"] + mods
            + ["--allow-no-sex", "--out", t, "--silent"], str(d))


def test_default_weighted_triangle(bed_panel):
    d = bed_panel
    _pair(d, [], "o0", "t0")
    _cmp(d, "o0.dist", "t0.dist")
    _cmp(d, "o0.dist.id", "t0.dist.id")


def test_ibs_and_1mibs(bed_panel):
    d = bed_panel
    _pair(d, ["ibs", "1-ibs", "allele-ct"], "o1", "t1")
    for ext in (".dist", ".mibs", ".mdist", ".mibs.id"):
        _cmp(d, "o1" + ext, "t1" + ext)


def test_square_square0_flat(bed_panel):
    d = bed_panel
    _pair(d, ["square"], "o2", "t2")
    _cmp(d, "o2.dist", "t2.dist")
    _pair(d, ["square0", "flat-missing"], "o3", "t3")
    _cmp(d, "o3.dist", "t3.dist")


def test_gz(bed_panel):
    d = bed_panel
    _pair(d, ["gz"], "o4", "t4")
    a = gzip.open(d / "o4.dist.gz").read()
    b = gzip.open(d / "t4.dist.gz").read()
    assert a == b


def test_bin_bin4(bed_panel):
    d = bed_panel
    # square f64: diagonal constant 0; square f32: plink's stale-fxx
    # diagonal quirk (plink_calc.c:3981-3991) replicated byte-exactly
    _pair(d, ["bin"], "o5", "t5")
    _cmp(d, "o5.dist.bin", "t5.dist.bin")
    _pair(d, ["bin4"], "o6", "t6")
    _cmp(d, "o6.dist.bin", "t6.dist.bin")
    _pair(d, ["square0", "bin4"], "o7", "t7")
    _cmp(d, "o7.dist.bin", "t7.dist.bin")


def test_triangle_bin(bed_panel):
    d = bed_panel
    _pair(d, ["triangle", "bin", "ibs"], "o8", "t8")
    _cmp(d, "o8.mibs.bin", "t8.mibs.bin")
    # 1.9's mdist triangle-bin writer overreads 1% past the dists buffer
    # when it follows the mibs writer (g_pct never reset,
    # plink_calc.c:3828-3837); compare the well-defined prefix only.
    _pair(d, ["triangle", "bin", "ibs", "1-ibs"], "o9", "t9")
    n = 80
    tri = n * (n - 1) // 2
    a = np.fromfile(d / "o9.mdist.bin", np.float64)
    b = np.fromfile(d / "t9.mdist.bin", np.float64)
    assert len(b) == tri
    assert np.array_equal(a[:tri], b)


def test_plink1_matrix_modes(bed_panel):
    d = bed_panel
    run19(["--bfile", "pb", "--distance-matrix", "--allow-no-sex",
           "--out", "om"], str(d))
    run_tpu(["--bfile", "pb", "--distance-matrix", "--allow-no-sex",
             "--out", "tm", "--silent"], str(d))
    _cmp(d, "om.mdist", "tm.mdist")
    _cmp(d, "om.mdist.id", "tm.mdist.id")
    run19(["--bfile", "pb", "--ibs-matrix", "--allow-no-sex",
           "--out", "oi"], str(d))
    run_tpu(["--bfile", "pb", "--ibs-matrix", "--allow-no-sex",
             "--out", "ti", "--silent"], str(d))
    _cmp(d, "oi.mibs", "ti.mibs")


def test_filters_compose(bed_panel):
    d = bed_panel
    args = ["--maf", "0.1", "--geno", "0.05"]
    run19(["--bfile", "pb"] + args
          + ["--distance", "--allow-no-sex", "--out", "of"], str(d))
    run_tpu(["--bfile", "pb"] + args
            + ["--distance", "--allow-no-sex", "--out", "tf", "--silent"],
            str(d))
    _cmp(d, "of.dist", "tf.dist")


def test_bad_modifier_errors(bed_panel):
    from plink_tpu.cli import main

    d = bed_panel
    old = os.getcwd()
    os.chdir(d)
    try:
        for bad in (["nonsense"], ["gz", "bin"], ["square", "triangle"]):
            with pytest.raises(ValueError):
                main(["--bfile", "pb", "--distance"] + bad
                     + ["--out", "x", "--silent"])
    finally:
        os.chdir(old)

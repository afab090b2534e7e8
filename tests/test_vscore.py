"""--variant-score differential tests (Vscore,
2.0/plink2_matrix_calc.cc:9274): byte-identical .vscore vs the oracle,
including forced mean-imputation of missing genotypes, --vscore-col-nums,
and sample-filter interaction."""

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
    d = tmp_path_factory.mktemp("vscore")
    subprocess.run(
        [ORACLE, "--dummy", "300", "400", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(9)
    ids = [l.split("\t")[0] for l in (d / "gq.psam").read_text().splitlines()[1:]]
    with open(d / "vs.txt", "w") as f:
        f.write("#IID\tW1\tW2\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\t{rng.random():.6f}\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--variant-score", "vs.txt"],
        ["--variant-score", "vs.txt", "--vscore-col-nums", "3"],
        ["--keep-if", "PHENO1 > 0", "--variant-score", "vs.txt"],
        ["--maf", "0.2", "--variant-score", "vs.txt"],
    ],
)
def test_vscore(panel, flags):
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_v"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_v", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_v.vscore").read_text() == (d / "t_v.vscore").read_text()


@pytest.fixture(scope="module")
def xymt_panel(tmp_path_factory):
    """chr1/X/Y/MT panel with known sexes (chrY forbids unknown-sex)."""
    d = tmp_path_factory.mktemp("vscore_xymt")
    subprocess.run(
        [ORACLE, "--dummy", "240", "400", "0.05", "--seed", "31", "--out", "gx"],
        cwd=d, check=True, capture_output=True,
    )
    lines = (d / "gx.psam").read_text().splitlines()
    with open(d / "gx.psam", "w") as f:
        f.write("#IID\tSEX\tPHENO1\n")
        for i, l in enumerate(lines[1:]):
            iid, _sex, ph = l.split("\t")
            f.write(f"{iid}\t{1 + i % 2}\t{ph}\n")
    plines = (d / "gx.pvar").read_text().splitlines()
    with open(d / "gx.pvar", "w") as f:
        f.write(plines[0] + "\n")
        body = plines[1:]
        q = len(body) // 4
        for i, l in enumerate(body):
            cols = l.split("\t")
            cols[0] = ("1", "X", "Y", "MT")[min(i // q, 3)]
            f.write("\t".join(cols) + "\n")
    rng = np.random.default_rng(11)
    ids = [l.split("\t")[0] for l in (d / "gx.psam").read_text().splitlines()[1:]]
    with open(d / "vs.txt", "w") as f:
        f.write("#IID\tW1\tW2\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\t{rng.random():.6f}\n")
    return d


@pytest.mark.parametrize(
    "flags",
    [
        ["--variant-score", "vs.txt"],
        ["--variant-score", "vs.txt", "--xchr-model", "1"],
    ],
)
def test_vscore_xymt(xymt_panel, flags):
    from plink_tpu.cli import main

    d = xymt_panel
    full = ["--pfile", "gx"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_x"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_x", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_x.vscore").read_text() == (d / "t_x.vscore").read_text()


def test_vscore_xchr_model0(xymt_panel):
    """--xchr-model 0 drops chrX rows (oracle crashes on this config —
    pgenlib_read.cc:1976 assertion — so verified self-consistently)."""
    from plink_tpu.cli import main

    d = xymt_panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gx", "--variant-score", "vs.txt",
                     "--xchr-model", "0", "--out", "t_x0", "--silent"]) == 0
    finally:
        os.chdir(old)
    lines = (d / "t_x0.vscore").read_text().splitlines()[1:]
    chroms = {l.split("\t")[0] for l in lines}
    assert "X" not in chroms and {"1", "Y", "MT"} <= chroms
    # non-X rows identical to the default run
    base = [l for l in (d / "o_x.vscore").read_text().splitlines()[1:]
            if not l.startswith("X\t")]
    assert lines == base


@pytest.mark.parametrize("mode", ["bin", "bin4", "bin4-single"])
def test_vscore_bin(panel, mode):
    """Binary .vscore.bin/.cols/.vars output (ref Vscore
    2.0/plink2_matrix_calc.cc:9534-9560, 10001-10022)."""
    from plink_tpu.cli import main

    d = panel
    mods = mode.replace("-single", " single-prec").split()
    full = ["--pfile", "gq", "--variant-score", "vs.txt"] + mods
    subprocess.run([ORACLE] + full + ["--out", "o_b"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_b", "--silent"]) == 0
    finally:
        os.chdir(old)
    for ext in (".vscore.cols", ".vscore.vars"):
        assert (d / ("o_b" + ext)).read_text() == \
            (d / ("t_b" + ext)).read_text(), ext
    import numpy as np

    dt = np.float64 if mode == "bin" else np.float32
    a = np.fromfile(d / "o_b.vscore.bin", dtype=dt)
    b = np.fromfile(d / "t_b.vscore.bin", dtype=dt)
    assert a.shape == b.shape
    # single-prec: BOTH engines accumulate in f32, in different orders
    rtol = 1e-4 if "single" in mode else (5e-6 if dt == np.float32 else 1e-12)
    np.testing.assert_allclose(b, a, rtol=rtol, atol=2e-5)

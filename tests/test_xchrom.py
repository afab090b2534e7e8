"""Mixed-chromosome (1/X/Y) report differential tests: X male-het halving
in allele freqs, hethap->missing in gcount, chrX Graffelman-Weir exact HWE."""

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
    d = tmp_path_factory.mktemp("xchr")
    subprocess.run(
        [ORACLE, "--dummy", "300", "200", "0.05", "--seed", "61", "--out", "xp"],
        cwd=d, check=True, capture_output=True,
    )
    lines = (d / "xp.pvar").read_text().splitlines()
    with open(d / "xp.pvar", "w") as f:
        f.write(lines[0] + "\n")
        for i, l in enumerate(lines[1:]):
            t = l.split("\t")
            t[0] = "1" if i < 80 else ("X" if i < 150 else "Y")
            f.write("\t".join(t) + "\n")
    rng = random.Random(2)
    lines = (d / "xp.psam").read_text().splitlines()
    with open(d / "xp.psam", "w") as f:
        f.write(lines[0] + "\n")
        for l in lines[1:]:
            t = l.split("\t")
            t[1] = rng.choice(["1", "2"])
            f.write("\t".join(t) + "\n")
    return d


def test_mixed_chrom_reports(panel):
    from plink_tpu.cli import main

    flags = ["--pfile", "xp", "--freq", "--missing", "--hardy", "--geno-counts"]
    subprocess.run([ORACLE] + flags + ["--out", "o"], cwd=panel, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", "t"]) == 0
    finally:
        os.chdir(old)
    for ext in ("afreq", "vmiss", "smiss", "hardy", "hardy.x", "gcount"):
        assert (panel / f"o.{ext}").read_bytes() == (
            panel / f"t.{ext}"
        ).read_bytes(), ext


def test_check_sex(panel):
    from plink_tpu.cli import main

    flags = ["--pfile", "xp", "--check-sex", "max-female-xf=0.2",
             "min-male-xf=0.5", "min-male-yrate=0.5", "max-female-yrate=0.4"]
    subprocess.run([ORACLE] + flags + ["--out", "ocs"], cwd=panel, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", "tcs"]) == 0
    finally:
        os.chdir(old)
    assert (panel / "ocs.sexcheck").read_bytes() == (
        panel / "tcs.sexcheck"
    ).read_bytes()


def test_impute_sex(panel):
    from plink_tpu.cli import main

    flags = ["--pfile", "xp", "--impute-sex", "max-female-xf=0.2",
             "min-male-xf=0.5", "--make-pgen"]
    subprocess.run([ORACLE] + flags + ["--out", "ois"], cwd=panel, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", "tis"]) == 0
    finally:
        os.chdir(old)
    assert (panel / "ois.psam").read_bytes() == (panel / "tis.psam").read_bytes()

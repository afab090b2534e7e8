"""--update-name/-map/-alleles/-ids/-parents + --make-just-psam/-pvar
differential tests: byte-identical outputs vs the plink2 oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("updmeta")
    subprocess.run(
        [ORACLE, "--dummy", "100", "60", "0.04", "scalar-pheno", "--seed",
         "7", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    (d / "un.txt").write_text("snp1 newname1\nsnp3 renamed3\nsnpX nope\n")
    (d / "uid.txt").write_text("per0 newper0\n")
    (d / "upar.txt").write_text("per3 DAD3 MOM3\n")
    (d / "um.txt").write_text("snp2 999\n")
    (d / "ua.txt").write_text("snp2 A B X Y\nsnp4 B A P Q\n")
    return d


@pytest.mark.parametrize(
    "flags,suffix",
    [
        (["--update-name", "un.txt", "--write-snplist"], "snplist"),
        (["--update-ids", "uid.txt", "--write-samples"], "id"),
        (["--update-parents", "upar.txt", "--make-just-psam"], "psam"),
        (["--update-map", "um.txt", "--make-just-pvar"], "pvar"),
        (["--update-alleles", "ua.txt", "--make-just-pvar"], "pvar"),
    ],
)
def test_update_meta(panel, flags, suffix):
    from plink_tpu.cli import main

    d = panel
    full = ["--pfile", "gq"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_u"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_u", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"o_u.{suffix}").read_text() == (d / f"t_u.{suffix}").read_text()

"""compound-genotypes / phylip / ind-major-bed / eig / eigt export and
--eigfile import differential tests: all byte-identical vs the oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("expmore")
    subprocess.run(
        [ORACLE, "--dummy", "90", "70", "0.05", "acgt", "--seed", "23",
         "--out", "gac"],
        cwd=d, check=True, capture_output=True,
    )
    return d


@pytest.mark.parametrize(
    "fmt,sufs",
    [
        ("compound-genotypes", ["ped", "map"]),
        ("phylip", ["phy"]),
        ("ind-major-bed", ["bed", "bim", "fam"]),
        ("eig", ["geno", "ind", "snp"]),
        ("eigt", ["geno", "ind", "snp"]),
    ],
)
def test_export_formats(panel, fmt, sufs):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--export", fmt, "--out", "o_e"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gac", "--export", fmt, "--out", "t_e",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    for s in sufs:
        assert (d / f"o_e.{s}").read_bytes() == (d / f"t_e.{s}").read_bytes(), s


def test_eig_import(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "gac", "--export", "eig", "--out", "src_e"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--eigfile", "src_e", "--freq", "--missing", "--out", "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--eigfile", "src_e", "--freq", "--missing", "--out",
                     "t_i", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_i.afreq").read_text() == (d / "t_i.afreq").read_text()
    assert (d / "o_i.vmiss").read_text() == (d / "t_i.vmiss").read_text()


@pytest.mark.parametrize("fmt", ["oxford-v2", "vcf-4.2"])
def test_export_new_formats(panel, fmt):
    """oxford-v2 (doubled variant-ID .gen column, ExportOxGen :658) and
    vcf-4.2 (##fileformat version line): byte-identical vs the oracle."""
    d = panel
    pfx = str(d / "gac")
    subprocess.run([ORACLE, "--pfile", pfx, "--export", fmt,
                    "--out", str(d / f"o_{fmt}")], check=True,
                   capture_output=True)
    from plink_tpu.cli import main

    assert main(["--pfile", pfx, "--export", fmt,
                 "--out", str(d / f"t_{fmt}"), "--silent"]) == 0
    exts = {"oxford-v2": (".gen", ".sample"), "vcf-4.2": (".vcf",)}[fmt]
    for e in exts:
        assert (d / f"o_{fmt}{e}").read_bytes() == \
            (d / f"t_{fmt}{e}").read_bytes(), e


def test_export_sample_v2_and_bgen11(panel):
    """'sample-v2' modifier (.sample single-ID format, ExportOxSampleV2
    :3443) and bgen-1.1 (layout-1; .bgen compared via oracle reimport
    since the zlib implementations differ byte-wise)."""
    d = panel
    pfx = str(d / "gac")
    from plink_tpu.cli import main

    subprocess.run([ORACLE, "--pfile", pfx, "--export", "oxford",
                    "sample-v2", "--out", str(d / "o_sv2")], check=True,
                   capture_output=True)
    assert main(["--pfile", pfx, "--export", "oxford", "sample-v2",
                 "--out", str(d / "t_sv2"), "--silent"]) == 0
    assert (d / "o_sv2.sample").read_bytes() == \
        (d / "t_sv2.sample").read_bytes()
    subprocess.run([ORACLE, "--pfile", pfx, "--export", "bgen-1.1",
                    "--out", str(d / "o_b11")], check=True,
                   capture_output=True)
    assert main(["--pfile", pfx, "--export", "bgen-1.1",
                 "--out", str(d / "t_b11"), "--silent"]) == 0
    assert (d / "o_b11.sample").read_bytes() == \
        (d / "t_b11.sample").read_bytes()
    for tag in ("o_b11", "t_b11"):
        subprocess.run(
            [ORACLE, "--bgen", str(d / f"{tag}.bgen"), "ref-last",
             "--sample", str(d / f"{tag}.sample"),
             "--make-pgen", "--out", str(d / f"ri_{tag}")],
            check=True, capture_output=True)
    assert (d / "ri_o_b11.pgen").read_bytes() == \
        (d / "ri_t_b11.pgen").read_bytes()
    assert (d / "ri_o_b11.pvar").read_bytes() == \
        (d / "ri_t_b11.pvar").read_bytes()

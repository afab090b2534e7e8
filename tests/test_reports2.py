"""Differential tests for --het / --score / --sample-counts / --export vcf
against the plink2 oracle (byte-identical where the formats allow)."""

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
    d = tmp_path_factory.mktemp("rep2")
    subprocess.run(
        [ORACLE, "--dummy", "150", "250", "0.06", "acgt", "--seed", "55",
         "--out", "pp"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(8)
    with open(d / "w.score", "w") as f:
        f.write("ID\tA1\tW\n")
        lines = (d / "pp.pvar").read_text().splitlines()
        for l in lines[1:None:3]:
            t = l.split("\t")
            if t[0].startswith("#"):
                continue
            f.write(f"{t[2]}\t{t[4]}\t{rng.normal():.4f}\n")
    return d


def _run_both(d, flags, stem_o, stem_t):
    from plink_tpu.cli import main

    subprocess.run([ORACLE] + flags + ["--out", stem_o], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", stem_t]) == 0
    finally:
        os.chdir(old)


def test_het(panel):
    _run_both(panel, ["--pfile", "pp", "--het"], "oh", "th")
    assert (panel / "oh.het").read_bytes() == (panel / "th.het").read_bytes()


def test_sample_counts(panel):
    _run_both(panel, ["--pfile", "pp", "--sample-counts"], "os", "ts")
    assert (panel / "os.scount").read_bytes() == (panel / "ts.scount").read_bytes()


def test_score(panel):
    flags = ["--pfile", "pp", "--score", "w.score", "1", "2", "3", "header"]
    _run_both(panel, flags, "oc", "tc")
    assert (panel / "oc.sscore").read_bytes() == (panel / "tc.sscore").read_bytes()


def test_export_vcf(panel):
    _run_both(panel, ["--pfile", "pp", "--export", "vcf"], "ov", "tv")
    assert (panel / "ov.vcf").read_bytes() == (panel / "tv.vcf").read_bytes()


def test_export_vcf_with_filters(panel):
    flags = ["--pfile", "pp", "--maf", "0.1", "--export", "vcf"]
    _run_both(panel, flags, "ovf", "tvf")
    assert (panel / "ovf.vcf").read_bytes() == (panel / "tvf.vcf").read_bytes()


@pytest.mark.parametrize("fmt,exts", [
    ("A", ["raw"]), ("AD", ["raw"]), ("ped", ["ped", "map"]),
    ("tped", ["tped", "tfam"]),
])
def test_export_formats(panel, fmt, exts):
    flags = ["--pfile", "pp", "--export", fmt]
    _run_both(panel, flags, f"oe{fmt}", f"te{fmt}")
    for ext in exts:
        assert (panel / f"oe{fmt}.{ext}").read_bytes() == (
            panel / f"te{fmt}.{ext}"
        ).read_bytes(), ext

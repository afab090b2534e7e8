"""--meta-analysis differential tests: byte-diffed against plink 1.9
(meta_analysis, 1.9/plink_misc.c:5297-6600)."""

import gzip
import os
import subprocess

import numpy as np
import pytest

ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE19), reason="plink 1.9 oracle not built")


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True,
                   capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def studies(tmp_path_factory):
    """Three OR-scale studies with overlaps, allele swaps, a mismatch,
    bad ES/SE values, a within-file duplicate, and one gzipped input;
    plus three BETA-scale studies for qt mode."""
    d = tmp_path_factory.mktemp("meta")
    rng = np.random.default_rng(3)
    for f in range(3):
        lines = ["CHR SNP BP A1 A2 OR SE P NMISS"]
        for i in range(60):
            if (i + f) % 7 == 0 and f > 0:
                continue
            a1, a2 = "A", "G"
            orv = float(np.exp(rng.normal(0, 0.3)))
            se = float(abs(rng.normal(0.1, 0.03))) + 0.01
            p = float(rng.uniform(0, 1))
            nm = int(rng.integers(100, 900))
            if f == 1 and i % 5 == 0:
                a1, a2 = a2, a1
                orv = 1 / orv
            if f == 2 and i == 11:
                a1, a2 = "T", "C"
            if f == 2 and i == 13:
                orv = "NA"
            if f == 1 and i == 17:
                se = "-1"
            row = (f"{1 + i % 22} rs{i} {10000 + i * 137} {a1} {a2} "
                   f"{orv} {se} {p} {nm}")
            lines.append(row)
            if f == 0 and i == 23:
                lines.append(row)
        (d / f"st{f}.assoc").write_text("\n".join(lines) + "\n")
    with open(d / "st1.assoc", "rb") as src, \
            gzip.open(d / "st1.assoc.gz", "wb") as dst:
        dst.write(src.read())
    rng = np.random.default_rng(9)
    for f in range(3):
        lines = ["CHR SNP BP A1 A2 BETA SE P NMISS"]
        for i in range(40):
            if (i + f) % 6 == 0 and f > 0:
                continue
            b = float(rng.normal(0, 0.2))
            se = float(abs(rng.normal(0.1, 0.02))) + 0.01
            p = float(rng.uniform(0, 1))
            nm = int(rng.integers(50, 400))
            lines.append(f"{1 + i % 22} q{i} {5000 + i * 91} A G {b} "
                         f"{se} {p} {nm}")
        (d / f"qt{f}.lin").write_text("\n".join(lines) + "\n")
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def test_meta_default_and_prob(studies):
    d = studies
    args = ["--meta-analysis", "st0.assoc", "st1.assoc", "st2.assoc"]
    run19(args + ["--out", "o"], str(d))
    run_tpu(args + ["--out", "t", "--silent"], str(d))
    _cmp(d, "o.meta", "t.meta")
    _cmp(d, "o.prob", "t.prob")


@pytest.mark.parametrize("mods", [["study"], ["report-all"],
                                  ["weighted-z"], ["no-map"],
                                  ["no-allele"]])
def test_meta_modifiers(studies, mods):
    d = studies
    args = (["--meta-analysis", "st0.assoc", "st1.assoc.gz", "st2.assoc",
             "+"] + mods)
    tag = "_".join(mods)
    run19(args + ["--out", f"o_{tag}"], str(d))
    run_tpu(args + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.meta", f"t_{tag}.meta")


def test_meta_qt(studies):
    d = studies
    args = ["--meta-analysis", "qt0.lin", "qt1.lin", "qt2.lin", "+",
            "qt", "study", "weighted-z"]
    run19(args + ["--out", "oq"], str(d))
    run_tpu(args + ["--out", "tq", "--silent"], str(d))
    _cmp(d, "oq.meta", "tq.meta")

"""1.9 --recode formats with no 2.0 counterpart (structure, bimbam, lgen,
23, fastphase; ref 1.9/plink_data.c:12102+): byte-identical output vs a
locally built plink 1.9."""

import os
import subprocess

import pytest

P19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not os.path.exists(P19), reason="plink 1.9 oracle not built"
)


def run19(args, cwd):
    subprocess.run([P19] + args + ["--silent"], cwd=cwd, check=True,
                   capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args + ["--silent"]) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("rc19")
    run19(["--dummy", "40", "30", "0.06", "--seed", "5", "--out", "d"],
          str(d))
    # mixed-chromosome panel (autosomes + chrX/chrY hh handling)
    run19(["--dummy", "40", "30", "0.06", "--seed", "8", "--out", "dx0"],
          str(d))
    bim = (d / "dx0.bim").read_text().splitlines()
    out = []
    for i, ln in enumerate(bim):
        p = ln.split("\t")
        p[0] = "1" if i < 10 else ("23" if i < 20 else "24")
        p[3] = str(i % 10 + 1)
        out.append("\t".join(p))
    (d / "dx.bim").write_text("\n".join(out) + "\n")
    (d / "dx.bed").write_bytes((d / "dx0.bed").read_bytes())
    (d / "dx.fam").write_text((d / "dx0.fam").read_text())
    return d


@pytest.mark.parametrize("fmt,outs", [
    ("structure", ["{}.recode.strct_in"]),
    ("bimbam", ["{}.recode.geno.txt", "{}.recode.pheno.txt",
                "{}.recode.pos.txt"]),
    ("bimbam-1chr", ["{}.recode.geno.txt", "{}.recode.pos.txt"]),
    ("lgen", ["{}.lgen", "{}.fam", "{}.map"]),
    ("lgen-ref", ["{}.lgen", "{}.ref", "{}.fam", "{}.map"]),
    ("fastphase", ["{}.chr-1.recode.phase.inp"]),
    ("fastphase-1chr", ["{}.recode.phase.inp"]),
])
def test_recode_formats(panel, fmt, outs):
    d = panel
    tag = fmt.replace("-", "_")
    run19(["--bfile", "d", "--recode", fmt, "--out", f"o{tag}"], str(d))
    run_tpu(["--bfile", "d", "--recode", fmt, "--out", f"t{tag}"], str(d))
    for pat in outs:
        o = d / pat.format(f"o{tag}")
        t = d / pat.format(f"t{tag}")
        assert o.read_bytes() == t.read_bytes(), pat


@pytest.mark.parametrize("fmt,outs", [
    ("structure", ["{}.recode.strct_in"]),
    ("lgen", ["{}.lgen", "{}.fam", "{}.map"]),
    ("fastphase", ["{}.chr-1.recode.phase.inp", "{}.chr-23.recode.phase.inp",
                   "{}.chr-24.recode.phase.inp"]),
])
def test_recode_mixed_chrom(panel, fmt, outs):
    """chrX/chrY panels: het-haploid -> missing, per-chromosome fastphase
    files, structure's -1 chromosome starts."""
    d = panel
    tag = "x" + fmt.replace("-", "_")
    run19(["--bfile", "dx", "--recode", fmt, "--out", f"o{tag}"], str(d))
    run_tpu(["--bfile", "dx", "--recode", fmt, "--out", f"t{tag}"], str(d))
    for pat in outs:
        o = d / pat.format(f"o{tag}")
        t = d / pat.format(f"t{tag}")
        assert o.read_bytes() == t.read_bytes(), pat


def test_recode_23(panel):
    d = panel
    run19(["--dummy", "1", "12", "0.1", "--seed", "9", "--out", "d1"],
          str(d))
    run19(["--bfile", "d1", "--recode", "23", "--out", "o23"], str(d))
    run_tpu(["--bfile", "d1", "--recode", "23", "--out", "t23"], str(d))
    # first line carries a timestamp; compare the rest byte-wise
    o = (d / "o23.txt").read_text().splitlines()[1:]
    t = (d / "t23.txt").read_text().splitlines()[1:]
    assert o == t

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


def run_oracle(args, cwd):
    subprocess.run([ORACLE] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


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


def _glm_cmp(d, oracle_stem, tpu_stem, ext, val_lo, val_hi, tol):
    def rows(p):
        with open(p) as f:
            hdr = f.readline()
            return hdr, [l.rstrip("\n").split("\t") for l in f]
    oh, orows = rows(str(d / f"{oracle_stem}.{ext}"))
    th, trows = rows(str(d / f"{tpu_stem}.{ext}"))
    assert oh == th
    om = {(r[0], r[1], r[val_lo - 1]): r for r in orows}
    tm = {(r[0], r[1], r[val_lo - 1]): r for r in trows}
    assert set(om) == set(tm)
    for k in om:
        ra, rb = om[k], tm[k]
        assert ra[:val_lo] == rb[:val_lo], (ra, rb)
        for ca, cb in zip(ra[val_lo:val_hi], rb[val_lo:val_hi]):
            if ca == "NA" or cb == "NA":
                assert ca == cb, (ra, rb)
                continue
            x, y = float(ca), float(cb)
            err = min(abs(x - y), abs(x - y) / max(abs(x), abs(y), 1e-300))
            assert err <= tol, (k, ra, rb)


def test_glm_mixed_ploidy(tmp_path):
    """--glm on a 1/X/Y/MT panel with mixed sexes: chrX auto-adds the SEX
    covariate, chrY restricts to nonfemales, haploid genotypes are coded
    0..1 (ref: GlmMain chrX/chrY handling, 2.0/plink2_glm.cc:2502-2640)."""
    d = tmp_path
    run_oracle(["--dummy", "300", "240", "0.02", "--seed", "31",
                "--out", "base"], str(d))
    # rewrite chroms (1, X, Y, MT) and alternate sexes
    lines = (d / "base.pvar").read_text().splitlines()
    hdr = [l for l in lines if l.startswith("#")]
    rows = [l for l in lines if not l.startswith("#")]
    out = []
    for i, r in enumerate(rows):
        t = r.split("\t")
        t[0] = "1" if i < 120 else ("X" if i < 180 else
                                    ("Y" if i < 210 else "MT"))
        t[1] = str(1000 + i)
        out.append("\t".join(t))
    (d / "mix.pvar").write_text("\n".join(hdr + out) + "\n")
    import shutil
    shutil.copy(d / "base.pgen", d / "mix.pgen")
    plines = (d / "base.psam").read_text().splitlines()
    shdr = plines[0].lstrip("#").split("\t")
    si = shdr.index("SEX")
    out = [plines[0]]
    for i, l in enumerate(plines[1:]):
        t = l.split("\t")
        t[si] = "1" if i % 2 == 0 else "2"
        out.append("\t".join(t))
    (d / "mix.psam").write_text("\n".join(out) + "\n")

    flags = ["--pfile", "mix", "--glm", "allow-no-covars"]
    run_oracle(flags + ["--out", "o"], str(d))
    run_tpu(flags + ["--out", "t"], str(d))
    _glm_cmp(d, "o", "t", "PHENO1.glm.logistic.hybrid", 11, 15, 2e-3)

    # quantitative pheno
    import numpy as np
    rng = np.random.default_rng(8)
    with open(d / "qt.txt", "w") as f:
        f.write("#IID\tQT\n")
        for l in out[1:]:
            f.write(f"{l.split(chr(9))[0]}\t{rng.normal():.6f}\n")
    flags = ["--pfile", "mix", "--pheno", "qt.txt", "--pheno-name", "QT",
             "--glm", "allow-no-covars"]
    run_oracle(flags + ["--out", "oq"], str(d))
    run_tpu(flags + ["--out", "tq"], str(d))
    _glm_cmp(d, "oq", "tq", "QT.glm.linear", 10, 14, 1e-4)


@pytest.mark.parametrize("colspec", [
    "cols=fid,sid,pedsex,status,xf,ycount,yrate,yobs",
    "cols=+ycount,+yobs",
    "cols=pedsex,xf",
])
def test_check_sex_cols(panel, colspec):
    """--check-sex cols= sets (ref 2.0/plink2_misc.cc:10664-10702)."""
    from plink_tpu.cli import main

    flags = ["--pfile", "xp", "--check-sex", "max-female-xf=0.2",
             "min-male-xf=0.5", "min-male-yrate=0.5", "max-female-yrate=0.4",
             colspec]
    tag = "c" + str(abs(hash(colspec)) % 10000)
    subprocess.run([ORACLE] + flags + ["--out", f"o{tag}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (panel / f"o{tag}.sexcheck").read_bytes() == (
        panel / f"t{tag}.sexcheck").read_bytes()

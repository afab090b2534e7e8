"""--mh/--bd/--homog stratified tests vs plink 1.9."""

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
def strat_panel(tmp_path_factory):
    """240 samples x 250 markers (chr1/chr2/chrX), cc pheno, mixed
    sexes, 5% missing; cl.txt = 5 natural-unsorted clusters with a few
    unassigned samples, cl2.txt = 40 case/control pairs (hits the
    homog NA-row-drop quirk and 2-digit DF widths)."""
    d = tmp_path_factory.mktemp("cmh")
    rng = np.random.default_rng(77)
    S, M_x = 240, 50
    M = 200 + M_x
    chrom = [1] * 100 + [2] * 100 + [23] * M_x
    pos = (list(range(100000, 100000 + 100 * 2000, 2000)) * 2
           + list(range(500000, 500000 + M_x * 3000, 3000)))
    with open(d / "p.map", "w") as f:
        for j in range(M):
            f.write(f"{chrom[j]} snp{j} 0 {pos[j]}\n")
    freqs = rng.uniform(0.05, 0.95, M)
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            g = []
            for j in range(M):
                v = rng.binomial(2, freqs[j])
                if rng.random() < 0.05:
                    v = 3
                g.append(al[v])
            ph = 1 + (rng.random() < 0.45)
            f.write(f"F{i} I{i} 0 0 {1 + i % 2} {ph} "
                    + " ".join(g) + "\n")
    names = ["zeta", "alpha", "mid3", "beta", "k9"]
    with open(d / "cl.txt", "w") as f:
        for i in range(S):
            if i % 29 == 7:
                continue
            f.write(f"F{i} I{i} {names[i % 5]}\n")
    run19(["--file", "p", "--make-bed", "--out", "pb"], str(d))
    phen = {}
    for line in open(d / "pb.fam"):
        t = line.split()
        phen.setdefault(t[5], []).append((t[0], t[1]))
    with open(d / "cl2.txt", "w") as f:
        for i in range(40):
            f.write(f"{phen['2'][i][0]} {phen['2'][i][1]} c{i}\n")
            f.write(f"{phen['1'][i][0]} {phen['1'][i][1]} c{i}\n")
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.mark.parametrize("flags,cl", [
    (["--mh"], "cl.txt"),
    (["--bd"], "cl.txt"),
    (["--bd", "--ci", "0.9"], "cl2.txt"),
])
def test_cmh(strat_panel, flags, cl):
    d = strat_panel
    tag = "_".join(f.lstrip("-") for f in flags)
    run19(["--bfile", "pb", "--within", cl, "--allow-no-sex"]
          + flags + ["--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--within", cl, "--allow-no-sex"]
            + flags + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.cmh", f"t_{tag}.cmh")


@pytest.mark.parametrize("cl", ["cl.txt", "cl2.txt"])
def test_mh2(strat_panel, cl):
    d = strat_panel
    tag = "m2_" + cl.split(".")[0]
    run19(["--bfile", "pb", "--within", cl, "--mh2",
           "--allow-no-sex", "--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--within", cl, "--mh2",
             "--allow-no-sex", "--out", f"t_{tag}", "--silent"],
            str(d))
    _cmp(d, f"o_{tag}.cmh2", f"t_{tag}.cmh2")


@pytest.mark.parametrize("cl", ["cl.txt", "cl2.txt"])
def test_homog(strat_panel, cl):
    d = strat_panel
    tag = cl.split(".")[0]
    run19(["--bfile", "pb", "--within", cl, "--homog",
           "--allow-no-sex", "--out", f"oh_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--within", cl, "--homog",
             "--allow-no-sex", "--out", f"th_{tag}", "--silent"],
            str(d))
    _cmp(d, f"oh_{tag}.homog", f"th_{tag}.homog")


def test_cmh_family(strat_panel, tmp_path):
    d = strat_panel
    for ext in ("bed", "bim"):
        (tmp_path / f"fb.{ext}").write_bytes(
            (d / f"pb.{ext}").read_bytes())
    with open(tmp_path / "fb.fam", "w") as f:
        for k, line in enumerate(open(d / "pb.fam")):
            t = line.split()
            t[0] = f"F{k % 8}"
            f.write(" ".join(t) + "\n")
    args = ["--bfile", "fb", "--mh", "--family", "--allow-no-sex",
            "--ci", "0.9"]
    run19(args + ["--out", "o"], str(tmp_path))
    run_tpu(args + ["--out", "t", "--silent"], str(tmp_path))
    _cmp(tmp_path, "o.cmh", "t.cmh")


@pytest.fixture(scope="module")
def qt_pheno(strat_panel):
    d = strat_panel
    rng = np.random.default_rng(5)
    rows = []
    for line in open(d / "pb.fam"):
        t = line.split()
        rows.append(f"{t[0]} {t[1]} {rng.normal(50, 10):.4f}")
    (d / "qt.phe").write_text("\n".join(rows) + "\n")
    (d / "qt_h.phe").write_text("#FID IID QT\n" + "\n".join(rows)
                                + "\n")
    return d


@pytest.mark.parametrize("mods", [[], ["qt-means", "lin"]])
def test_qassoc(qt_pheno, mods):
    d = qt_pheno
    tag = "qa" + str(len(mods))
    run19(["--bfile", "pb", "--pheno", "qt.phe", "--assoc"] + mods
          + ["--allow-no-sex", "--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--pheno", "qt_h.phe", "--assoc"] + mods
            + ["--allow-no-sex", "--out", f"t_{tag}", "--silent"],
            str(d))
    _cmp(d, f"o_{tag}.qassoc", f"t_{tag}.qassoc")
    if mods:
        _cmp(d, f"o_{tag}.qassoc.means", f"t_{tag}.qassoc.means")

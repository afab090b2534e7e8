"""SFMT19937 + --make-perm-pheno differential tests vs plink 1.9."""

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
def pp_panel(tmp_path_factory):
    """150 samples x 40 markers, cc + qt phenos, cluster file."""
    d = tmp_path_factory.mktemp("pp")
    rng = np.random.default_rng(3)
    S, M = 150, 40
    with open(d / "p.map", "w") as f:
        for j in range(M):
            f.write(f"1 snp{j} 0 {100000 + j * 1500}\n")
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            g = " ".join(
                al[rng.binomial(2, 0.4) if rng.random() > 0.03 else 3]
                for _ in range(M))
            ph = -9 if i % 17 == 5 else 1 + i % 2
            f.write(f"F{i} I{i} 0 0 {1 + i % 2} {ph} {g}\n")
    qt = ["#FID IID QT"]
    qto = []
    for i in range(S):
        v = f"{rng.normal(50, 8):.4f}"
        qt.append(f"F{i} I{i} {v}")
        qto.append(f"F{i} I{i} {v}")
    (d / "qt.phe").write_text("\n".join(qt) + "\n")
    (d / "qto.phe").write_text("\n".join(qto) + "\n")
    with open(d / "cl.txt", "w") as f:
        for i in range(S):
            if i % 13 == 4:
                continue
            f.write(f"F{i} I{i} g{i % 6}\n")
    run19(["--file", "p", "--make-bed", "--allow-no-sex",
           "--out", "pb"], str(d))
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


def test_sfmt_stream():
    """First draws for seed 21 (generated from reference SFMT.c)."""
    from plink_tpu.stats.sfmt import Sfmt

    s = Sfmt(21)
    assert [s.genrand_uint32() for _ in range(6)] == [
        669358906, 918318802, 2041720170, 2085671284,
        4258283803, 309276207]


@pytest.mark.parametrize("extra,threads", [
    ([], 1), ([], 3), (["--within", "cl.txt"], 1),
])
def test_make_perm_pheno_cc(pp_panel, extra, threads):
    d = pp_panel
    tag = f"cc{threads}_{len(extra)}"
    base = ["--bfile", "pb", "--make-perm-pheno", "7", "--seed", "21",
            "--threads", str(threads), "--allow-no-sex"] + extra
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.pphe", f"t_{tag}.pphe")


@pytest.mark.parametrize("extra,threads", [
    ([], 2), (["--within", "cl.txt"], 2),
])
def test_make_perm_pheno_qt(pp_panel, extra, threads):
    d = pp_panel
    tag = f"qt{threads}_{len(extra)}"
    base = ["--bfile", "pb", "--make-perm-pheno", "5", "--seed", "77",
            "--threads", str(threads), "--allow-no-sex"] + extra
    run19(base + ["--pheno", "qto.phe", "--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--pheno", "qt.phe", "--out", f"t_{tag}",
                    "--silent"], str(d))
    _cmp(d, f"o_{tag}.pphe", f"t_{tag}.pphe")


def test_ibs_test(pp_panel):
    d = pp_panel
    args = ["--bfile", "pb", "--ibs-test", "1024", "--seed", "11",
            "--threads", "1", "--allow-no-sex"]
    run19(args + ["--out", "o_ibs"], str(d))
    run_tpu(args + ["--out", "t_ibs", "--silent"], str(d))

    def block(p):
        txt = (d / p).read_text().splitlines()
        i = txt.index("--ibs-test results:")
        j = next(k for k in range(i, len(txt)) if "T12" in txt[k])
        return txt[i:j + 1]

    assert block("o_ibs.log") == block("t_ibs.log")


def _log_block(d, p, start, endpat):
    txt = (d / p).read_text().splitlines()
    i = next(k for k, ln in enumerate(txt) if start in ln)
    j = next(k for k in range(i, len(txt)) if endpat in txt[k])
    return txt[i:j + 1]


def test_groupdist(pp_panel):
    d = pp_panel
    args = ["--bfile", "pb", "--groupdist", "1200", "--seed", "21",
            "--threads", "2", "--allow-no-sex"]
    run19(args + ["--out", "o_gd"], str(d))
    run_tpu(args + ["--out", "t_gd", "--silent"], str(d))
    assert _log_block(d, "o_gd.log", "Setting d=", "AU mean - UU") \
        == _log_block(d, "t_gd.log", "Setting d=", "AU mean - UU")


def test_regress_distance(pp_panel):
    d = pp_panel
    args = ["--bfile", "pb", "--regress-distance", "1000", "--seed",
            "7", "--threads", "1", "--allow-no-sex"]
    run19(args + ["--pheno", "qto.phe", "--out", "o_rd"], str(d))
    run_tpu(args + ["--pheno", "qt.phe", "--out", "t_rd", "--silent"],
            str(d))
    assert _log_block(d, "o_rd.log", "Phenotype stdev",
                      "Jackknife s.e. (y") \
        == _log_block(d, "t_rd.log", "Phenotype stdev",
                      "Jackknife s.e. (y")


@pytest.mark.parametrize("flags", [
    ["--thin", "0.4"], ["--thin-count", "17"],
    ["--thin-indiv", "0.6"], ["--thin-indiv-count", "100"],
])
def test_thin_sets(pp_panel, flags):
    """Same kept variant/sample SET as 1.9 under a fixed --seed
    (formatting of make-bed outputs is plink2-parity by design)."""
    d = pp_panel
    base = ["--bfile", "pb", "--seed", "21", "--make-bed",
            "--allow-no-sex"] + flags
    run19(base + ["--out", "o_thin"], str(d))
    run_tpu(base + ["--out", "t_thin", "--silent"], str(d))

    def ids(p, col=2):
        return [ln.split()[col - 1] for ln in
                (d / p).read_text().splitlines()]

    assert ids("o_thin.bim") == ids("t_thin.bim")
    assert ids("o_thin.fam", 1) == ids("t_thin.fam", 1)


@pytest.mark.parametrize("flags", [
    ["--assoc", "perm"],
    ["--assoc", "perm", "perm-count", "--threads", "3"],
    ["--assoc", "fisher", "perm"],
    ["--assoc", "fisher-midp", "perm"],
    ["--assoc", "perm", "--within", "cl.txt"],
])
def test_assoc_perm(pp_panel, flags):
    d = pp_panel
    tag = "ap" + str(abs(hash(tuple(flags))) % 10000)
    base = ["--bfile", "pb", "--seed", "21", "--allow-no-sex",
            "--aperm", "10", "300", "0.01", "0.001", "2", "0.002"]
    if "--threads" not in flags:
        base += ["--threads", "1"]
    run19(base + flags + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + flags + ["--out", f"t_{tag}", "--silent"], str(d))
    sfx = ".assoc.fisher" if ("fisher" in flags
                              or "fisher-midp" in flags) else ".assoc"
    _cmp(d, f"o_{tag}{sfx}", f"t_{tag}{sfx}")
    _cmp(d, f"o_{tag}{sfx}.perm", f"t_{tag}{sfx}.perm")


@pytest.mark.parametrize("mp,mods,extra", [
    ("mperm=300", [], []),
    ("mperm=900", ["perm-count"], ["--threads", "2"]),
])
def test_assoc_mperm(pp_panel, mp, mods, extra):
    d = pp_panel
    tag = "mt" + mp.split("=")[1] + str(len(extra))
    base = ["--bfile", "pb", "--assoc", mp] + mods \
        + ["--seed", "21", "--allow-no-sex"] + extra
    if "--threads" not in extra:
        base += ["--threads", "1"]
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.assoc.mperm", f"t_{tag}.assoc.mperm")


@pytest.mark.parametrize("mods", [
    ["perm"],                      # best (chi)
    ["perm", "dom"],
    ["perm", "rec"],
    ["perm", "trend"],
    ["perm", "gen"],
    ["fisher", "perm"],            # best (fisher)
    ["fisher", "perm", "dom"],
    ["fisher-midp", "perm", "rec"],
])
def test_model_perm(pp_panel, mods):
    d = pp_panel
    tag = "mo" + str(abs(hash(tuple(mods))) % 100000)
    base = ["--bfile", "pb", "--model"] + mods \
        + ["--aperm", "8", "250", "0.02", "0.002", "2", "0.002",
           "--seed", "11", "--threads", "1", "--allow-no-sex"]
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    import glob

    pf = sorted(glob.glob(str(d / f"o_{tag}.model*.perm")))[0]
    tf = pf.replace(f"o_{tag}", f"t_{tag}")
    assert open(pf, "rb").read() == open(tf, "rb").read(), pf


@pytest.mark.parametrize("mods", [
    ["mperm=120", "dom"],
    ["mperm=120", "rec"],
    ["mperm=120", "trend"],
    ["mperm=120", "gen"],
    ["fisher", "mperm=120", "dom"],
    ["fisher-midp", "mperm=120", "rec"],
    ["fisher", "mperm=120", "gen"],
    ["fisher", "perm", "gen"],
    ["mperm=120"],
    ["fisher", "mperm=120"],
    ["fisher-midp", "mperm=120"],
])
def test_model_mperm(pp_panel, mods):
    d = pp_panel
    tag = "mm" + str(abs(hash(tuple(mods))) % 100000)
    base = ["--bfile", "pb", "--model"] + mods \
        + ["--aperm", "8", "250", "0.02", "0.002", "2", "0.002",
           "--seed", "11", "--threads", "2", "--allow-no-sex"]
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    import glob

    pf = sorted(glob.glob(str(d / f"o_{tag}.model*perm")))[0]
    tf = pf.replace(f"o_{tag}", f"t_{tag}")
    assert open(pf, "rb").read() == open(tf, "rb").read(), pf


@pytest.mark.parametrize("mp,mods", [
    ("mperm=150", ["fisher"]),
    ("mperm=150", ["fisher-midp"]),
])
def test_assoc_fisher_mperm(pp_panel, mp, mods):
    d = pp_panel
    tag = "fm" + str(abs(hash((mp, tuple(mods)))) % 100000)
    base = ["--bfile", "pb", "--assoc", mp] + mods \
        + ["--seed", "21", "--threads", "2", "--allow-no-sex"]
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.assoc.fisher.mperm", f"t_{tag}.assoc.fisher.mperm")


@pytest.mark.parametrize("mods", [
    [], ["fisher"], ["fisher-midp"], ["trend-only"],
])
def test_model_base(pp_panel, mods):
    d = pp_panel
    tag = "mb" + str(len("".join(mods)))
    run19(["--bfile", "pb", "--model"] + mods
          + ["--allow-no-sex", "--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--model"] + mods
            + ["--allow-no-sex", "--out", f"t_{tag}", "--silent"],
            str(d))
    _cmp(d, f"o_{tag}.model", f"t_{tag}.model")


@pytest.mark.parametrize("mods", [
    ["perm"], ["perm", "midp", "perm-count"],
])
def test_testmiss_perm(pp_panel, mods):
    d = pp_panel
    tag = "tm" + str(len(mods))
    base = ["--bfile", "pb", "--test-missing"] + mods \
        + ["--aperm", "8", "250", "0.02", "0.002", "2", "0.002",
           "--seed", "21", "--threads", "1", "--allow-no-sex"]
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.missing.perm", f"t_{tag}.missing.perm")


@pytest.mark.parametrize("flags,oflags,ext", [
    (["--assoc", "perm"], None, "qassoc.perm"),
    (["--assoc", "perm", "perm-count", "--within", "cl.txt"],
     None, "qassoc.perm"),
    (["--assoc", "lin", "perm"], None, "qassoc.perm"),
    (["--assoc", "mperm=300"], None, "qassoc.mperm"),
    (["--assoc", "mperm=1200", "--threads", "4"], None,
     "qassoc.mperm"),
    (["--assoc", "lin", "mperm=500", "perm-count"], None,
     "qassoc.mperm"),
    (["--assoc", "mperm=400", "--within", "cl.txt"], None,
     "qassoc.mperm"),
])
def test_qassoc_perm(pp_panel, flags, oflags, ext):
    d = pp_panel
    tag = "qp" + str(abs(hash(tuple(flags))) % 10000)
    base = ["--bfile", "pb", "--seed", "77", "--allow-no-sex",
            "--aperm", "10", "400", "0.01", "0.001", "2", "0.002"]
    if "--threads" not in flags:
        base += ["--threads", "1"]
    run19(base + ["--pheno", "qto.phe"] + flags
          + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--pheno", "qt.phe"] + flags
            + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.qassoc", f"t_{tag}.qassoc")
    _cmp(d, f"o_{tag}.{ext}", f"t_{tag}.{ext}")

"""--test-missing / --twolocus differential tests vs plink 1.9."""

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
def cc_panel(tmp_path_factory):
    """200 samples x 320 markers over chr1/chr2/chrX, 4% missing,
    case/control phenos, mixed sexes."""
    d = tmp_path_factory.mktemp("m19")
    rng = np.random.default_rng(23)
    S, M_a, M_x = 200, 260, 60
    M = M_a + M_x
    chrom = [1] * 130 + [2] * 130 + [23] * M_x
    pos = (list(range(100000, 100000 + 130 * 2000, 2000)) * 2
           + list(range(500000, 500000 + M_x * 3000, 3000)))
    with open(d / "p.map", "w") as f:
        for j in range(M):
            f.write(f"{chrom[j]} snp{j} 0 {pos[j]}\n")
    freqs = rng.uniform(0.1, 0.9, M)
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            g = []
            for j in range(M):
                v = rng.binomial(2, freqs[j])
                if rng.random() < 0.04 + 0.06 * (i % 2):
                    v = 3
                g.append(al[v])
            ph = 1 + i % 2
            f.write(f"F{i} I{i} 0 0 {1 + i % 2} {ph} "
                    + " ".join(g) + "\n")
    run19(["--file", "p", "--make-bed", "--out", "pb"], str(d))
    return d


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.mark.parametrize("mods", [[], ["midp"]])
def test_test_missing(cc_panel, mods):
    d = cc_panel
    tag = "_".join(mods) or "def"
    run19(["--bfile", "pb", "--test-missing"] + mods
          + ["--allow-no-sex", "--out", f"o_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--test-missing"] + mods
            + ["--allow-no-sex", "--out", f"t_{tag}", "--silent"],
            str(d))
    _cmp(d, f"o_{tag}.missing", f"t_{tag}.missing")


@pytest.mark.parametrize("pair", [("snp5", "snp17"),
                                  ("snp261", "snp280"),
                                  ("snp3", "snp300")])
def test_twolocus(cc_panel, pair):
    d = cc_panel
    tag = "_".join(pair)
    run19(["--bfile", "pb", "--twolocus", *pair, "--allow-no-sex",
           "--out", f"o2_{tag}"], str(d))
    run_tpu(["--bfile", "pb", "--twolocus", *pair, "--allow-no-sex",
             "--out", f"t2_{tag}", "--silent"], str(d))
    _cmp(d, f"o2_{tag}.twolocus", f"t2_{tag}.twolocus")


def test_flipscan(cc_panel):
    d = cc_panel
    run19(["--bfile", "pb", "--flip-scan", "--allow-no-sex", "--out",
           "ofs"], str(d))
    run_tpu(["--bfile", "pb", "--flip-scan", "--allow-no-sex", "--out",
             "tfs", "--silent"], str(d))
    _cmp(d, "ofs.flipscan", "tfs.flipscan")


def test_flipscan_verbose(cc_panel):
    d = cc_panel
    args = ["--flip-scan", "verbose", "--flip-scan-window", "5",
            "--flip-scan-threshold", "0.2", "--allow-no-sex"]
    run19(["--bfile", "pb"] + args + ["--out", "ofv"], str(d))
    run_tpu(["--bfile", "pb"] + args + ["--out", "tfv", "--silent"],
            str(d))
    _cmp(d, "ofv.flipscan", "tfv.flipscan")
    _cmp(d, "ofv.flipscan.verbose", "tfv.flipscan.verbose")


def test_show_tags_all(cc_panel):
    d = cc_panel
    run19(["--bfile", "pb", "--show-tags", "all", "--allow-no-sex",
           "--out", "ost"], str(d))
    run_tpu(["--bfile", "pb", "--show-tags", "all", "--allow-no-sex",
             "--out", "tst", "--silent"], str(d))
    _cmp(d, "ost.tags.list", "tst.tags.list")


def test_show_tags_file(cc_panel):
    d = cc_panel
    (d / "tg.txt").write_text("snp5\nsnp40\nsnp261\nsnp300\n")
    args = ["--show-tags", "tg.txt", "--tag-r2", "0.5", "--tag-kb",
            "30", "--list-all", "--allow-no-sex"]
    run19(["--bfile", "pb"] + args + ["--out", "ost2"], str(d))
    run_tpu(["--bfile", "pb"] + args + ["--out", "tst2", "--silent"],
            str(d))
    _cmp(d, "ost2.tags", "tst2.tags")
    _cmp(d, "ost2.tags.list", "tst2.tags.list")


@pytest.fixture(scope="module")
def dense_miss_panel(tmp_path_factory):
    """150 samples x 80 chr1 markers with 12% missingness (for
    --test-mishap, which needs >=5 missing calls per site)."""
    d = tmp_path_factory.mktemp("mh19")
    rng = np.random.default_rng(31)
    S, M = 150, 80
    al = {0: "A A", 1: "A B", 2: "B B", 3: "0 0"}
    with open(d / "p.map", "w") as f:
        for j in range(M):
            f.write(f"1 v{j} 0 {1000 + j * 500}\n")
    with open(d / "p.ped", "w") as f:
        for i in range(S):
            g = []
            for j in range(M):
                v = rng.binomial(2, 0.4)
                if rng.random() < 0.12:
                    v = 3
                g.append(al[v])
            f.write(f"F{i} I{i} 0 0 1 {1 + i % 2} " + " ".join(g)
                    + "\n")
    run19(["--file", "p", "--make-bed", "--out", "pb"], str(d))
    return d


def test_test_mishap(dense_miss_panel):
    d = dense_miss_panel
    run19(["--bfile", "pb", "--test-mishap", "--allow-no-sex", "--out",
           "omh"], str(d))
    run_tpu(["--bfile", "pb", "--test-mishap", "--allow-no-sex",
             "--out", "tmh", "--silent"], str(d))
    _cmp(d, "omh.missing.hap", "tmh.missing.hap")


def test_gxe(cc_panel):
    d = cc_panel
    rng = np.random.default_rng(19)
    fam = [ln.split() for ln in (d / "pb.fam").read_text().splitlines()]
    body = "".join(f"{r[0]} {r[1]} {rng.normal(0, 1):.5f}\n"
                   for r in fam)
    (d / "qt_o.phe").write_text("FID IID PHENO\n" + body)
    (d / "qt_t.phe").write_text("#FID IID PHENO\n" + body)
    (d / "g.cov").write_text("".join(
        f"{r[0]} {r[1]} {[1, 2, 1, 2, -9][i % 5]}\n"
        for i, r in enumerate(fam)))
    run19(["--bfile", "pb", "--pheno", "qt_o.phe", "--covar", "g.cov",
           "--gxe", "--allow-no-sex", "--out", "og"], str(d))
    run_tpu(["--bfile", "pb", "--pheno", "qt_t.phe", "--covar", "g.cov",
             "--gxe", "--allow-no-sex", "--out", "tg", "--silent"],
            str(d))
    _cmp(d, "og.qassoc.gxe", "tg.qassoc.gxe")


def test_gene_report(cc_panel, tmp_path):
    d = cc_panel
    run19(["--bfile", "pb", "--assoc", "--allow-no-sex",
           "--out", "ga"], str(d))
    rows = [
        "1 99000 150000 GENE_A",
        "1 160000 200000 GENE_A",
        "1 150000 165000 GENE_A",   # overlapping -> merged
        "1 250000 260000 geneB",
        "2 100000 180000 GENE10",
        "2 150000 300000 GENE2",    # natural order GENE2 < GENE10
        "23 500000 560000 XG1",
        "5 1 1000 NOHIT",
    ]
    (d / "glist.txt").write_text("\n".join(rows) + "\n")
    (d / "gsub.txt").write_text("GENE_A\nGENE2\nXG1\n")
    for extra, tag in ((["--gene-list-border", "20"], "b"),
                       (["--gene-subset", "gsub.txt",
                         "--pfilter", "0.5"], "s")):
        run19(["--gene-report", "ga.assoc", "glist.txt"] + extra
              + ["--out", f"o_g{tag}"], str(d))
        run_tpu(["--gene-report", "ga.assoc", "glist.txt"] + extra
                + ["--out", f"t_g{tag}", "--silent"], str(d))
        _cmp(d, f"o_g{tag}.range.report", f"t_g{tag}.range.report")


ANNOT_CASES = [
    ("r1", ["ranges=glist.txt"]),
    ("r2", ["ranges=glist.txt", "--border", "15"]),
    ("r3", ["ranges=glist.txt", "distance", "--border", "15"]),
    ("r4", ["ranges=glist.txt", "subset=gsub.txt", "prune"]),
    ("r5", ["attrib=attr.txt"]),
    ("r6", ["attrib=attr.txt", "ranges=glist.txt", "NA"]),
    ("r7", ["attrib=attr.txt", "ranges=glist.txt", "block"]),
    ("r8", ["attrib=attr.txt", "ranges=glist.txt", "minimal",
            "filter=flist.txt"]),
    ("r9", ["attrib=attr.txt", "snps=snps.txt", "ranges=glist.txt",
            "distance", "--border", "10"]),
    ("r10", ["ranges=glist.txt", "block", "--border", "25"]),
    ("r11", ["attrib=attr.txt", "ranges=glist.txt", "block",
             "distance", "--border", "25"]),
    ("r12", ["attrib=attr.txt", "--pfilter", "0.4"]),
    ("r15", ["ranges=glist.txt", "distance", "prune",
             "--border", "40"]),
    ("r16", ["ranges=glist.txt", "subset=gsub.txt", "block",
             "distance", "filter=flist.txt", "--border", "30",
             "--pfilter", "0.9"]),
]


@pytest.fixture(scope="module")
def annot_inputs(cc_panel):
    d = cc_panel
    run19(["--bfile", "pb", "--assoc", "--allow-no-sex",
           "--out", "ga"], str(d))
    rows = [
        "1 99000 150000 GENE_A",
        "1 160000 200000 GENE_A",
        "1 150000 165000 GENE_A",
        "1 250000 260000 geneB",
        "2 100000 180000 GENE10",
        "2 150000 300000 GENE2",
        "23 500000 560000 XG1",
        "5 1 1000 NOHIT",
    ]
    (d / "glist.txt").write_text("\n".join(rows) + "\n")
    (d / "flist.txt").write_text(
        "1 100000 300000 KEEP1\n2 200000 999999 KEEP2\n")
    (d / "gsub.txt").write_text("GENE_A\nGENE2\nXG1\n")
    with open(d / "attr.txt", "w") as f:
        for j in range(0, 320, 3):
            ats = []
            if j % 2 == 0:
                ats.append(f"tag{j % 7}")
            if j % 5 == 0:
                ats.append("rare")
            if j % 4 == 0:
                ats.append("LoF10")
            if j % 4 == 2:
                ats.append("LoF2")
            if ats:
                f.write(f"snp{j} " + " ".join(ats) + "\n")
    with open(d / "snps.txt", "w") as f:
        for j in range(0, 320, 2):
            f.write(f"snp{j}\n")
    return d


@pytest.mark.parametrize("tag,args", ANNOT_CASES,
                         ids=[c[0] for c in ANNOT_CASES])
def test_annotate(annot_inputs, tag, args):
    d = annot_inputs
    run19(["--annotate", "ga.assoc"] + args + ["--out", f"o_a{tag}"],
          str(d))
    run_tpu(["--annotate", "ga.assoc"] + args
            + ["--out", f"t_a{tag}", "--silent"], str(d))
    _cmp(d, f"o_a{tag}.annot", f"t_a{tag}.annot")


@pytest.mark.parametrize("mods", [["perm"], ["midp", "perm"]])
def test_test_missing_perm(cc_panel, mods):
    """--test-missing perm (testmiss_adapt_thread,
    1.9/plink_assoc.c:9690): byte-identical."""
    d = cc_panel
    tag = "p" + "_".join(mods).replace("=", "")
    base = (["--bfile", "pb", "--test-missing"] + mods
            + ["--aperm", "6", "200", "0.02", "0.002", "2", "0.002",
               "--seed", "23", "--threads", "1", "--allow-no-sex"])
    run19(base + ["--out", f"o_{tag}"], str(d))
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    _cmp(d, f"o_{tag}.missing.perm", f"t_{tag}.missing.perm")


@pytest.mark.parametrize("mods", [["mperm=200"], ["midp", "mperm=200"]])
def test_test_missing_mperm(cc_panel, mods):
    """--test-missing mperm= max(T).  The 1.9 oracle's
    testmiss_maxt_thread corrupts half of every run's permutations
    (exactly 50% of permuted p-values collapse to one extreme value at
    any mperm count, contradicting its own adaptive estimates), so this
    validates structure + statistical agreement with the byte-exact
    adaptive mode instead of byte-diffing."""
    d = cc_panel
    tag = "m" + "_".join(mods).replace("=", "")
    base = (["--bfile", "pb", "--test-missing"] + mods
            + ["--seed", "23", "--threads", "1", "--allow-no-sex"])
    run_tpu(base + ["--out", f"t_{tag}", "--silent"], str(d))
    lines = (d / f"t_{tag}.missing.mperm").read_text().splitlines()
    assert lines[0].split() == ["CHR", "SNP", "EMP1", "EMP2"]
    # adaptive reference (forced to full scan) for EMP1 agreement
    run_tpu(["--bfile", "pb", "--test-missing", "perm"]
            + (["midp"] if "midp" in mods else [])
            + ["--aperm", "198", "200", "0", "0.0001", "1", "0.001",
               "--seed", "23", "--threads", "1", "--allow-no-sex",
               "--out", f"a_{tag}", "--silent"], str(d))
    alines = (d / f"a_{tag}.missing.perm").read_text().splitlines()
    emp1 = {l.split()[1]: float(l.split()[2]) for l in lines[1:]}
    aemp1 = {l.split()[1]: float(l.split()[2]) for l in alines[1:]}
    import math

    for snp, v in list(emp1.items())[:50]:
        av = aemp1[snp]
        # same seed, near-identical perm sets (adaptive stops at 199 of
        # the 200): estimates must agree closely
        assert abs(v - av) < 0.05, (snp, v, av)
        e2 = float([l for l in lines[1:] if l.split()[1] == snp][0]
                   .split()[3])
        assert v <= e2 + 1e-12


def test_allelexxxx_recode(tmp_path):
    """--allele1234/--alleleACGT [multichar] (1.9/plink.c:208-261
    allelexxxx_recode): byte-diff .bim/.bed vs the 1.9 oracle."""
    import subprocess

    from plink_tpu.cli import main

    d = tmp_path
    (d / "m.map").write_text(
        "1 v1 0 100\n1 v2 0 200\n1 v3 0 300\n2 v4 0 100\n")
    (d / "m.ped").write_text(
        "f1 i1 0 0 1 1 A C 1 4 AT A C G\n"
        "f1 i2 0 0 2 2 C C 4 4 TTG A G G\n"
        "f2 i3 0 0 1 1 A A 1 1 AT AT C C\n")
    subprocess.run([ORACLE19, "--file", str(d / "m"), "--make-bed",
                    "--out", str(d / "base")], check=True,
                   capture_output=True)
    for flags, tag in [(["--allele1234"], "a"),
                       (["--allele1234", "multichar"], "b"),
                       (["--alleleACGT"], "c"),
                       (["--alleleACGT", "multichar"], "d")]:
        src = str(d / ("base" if tag in "ab" else "b_o"))
        subprocess.run([ORACLE19, "--bfile", src] + flags
                       + ["--make-bed", "--out", str(d / f"{tag}_o")],
                       check=True, capture_output=True)
        assert main(["--bfile", src] + flags
                    + ["--make-bed", "--out", str(d / f"{tag}_t"),
                       "--silent"]) == 0
        for ext in (".bim", ".bed"):
            assert (d / f"{tag}_o{ext}").read_bytes() == \
                (d / f"{tag}_t{ext}").read_bytes(), (tag, ext)

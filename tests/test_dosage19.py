"""1.9 --dosage association differential tests: cc logistic (bit-exact
float IRLS), qt linear, format=1/2/3, skip columns, noheader, map,
case-control-freqs, sex covariate, occur mode."""

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


def _cmp(d, a, b):
    assert (d / a).read_bytes() == (d / b).read_bytes(), (a, b)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("dos19")
    rng = np.random.default_rng(19)
    S, M = 170, 30
    with open(d / "d.fam", "w") as f:
        for i in range(S):
            ph = -9 if i % 23 == 7 else 1 + i % 2
            f.write(f"F{i} I{i} 0 0 {1 + (i % 3 == 0)} {ph}\n")
    with open(d / "d.map", "w") as f:
        for j in range(M):
            f.write(f"{1 + (j >= 20)} snp{j} 0 {10000 + j * 777}\n")
    qt = ["F%d I%d %.4f" % (i, i, rng.normal(3, 1.2)) for i in range(S)]
    (d / "qt.phe").write_text("\n".join(qt) + "\n")
    # format=2 dosage file (P(hom A1), P(het)); header with shuffled,
    # partial sample set
    order = rng.permutation(S)[: S - 9]
    hdr = "SNP A1 A2 " + " ".join(f"F{i} I{i}" for i in order)
    lines2 = [hdr]
    lines1 = ["SNP A1 A2 " + " ".join(f"F{i} I{i}" for i in order)]
    for j in range(M):
        p_a1 = rng.random() * 0.8 + 0.1
        cells2, cells1 = [], []
        for i in order:
            ph = rng.random(2)
            phom = round(p_a1 * ph[0], 3)
            phet = round(min(1.0 - phom, ph[1] * 0.5), 3)
            cells2.append(f"{phom} {phet}")
            cells1.append(f"{round(2 * phom + phet, 3)}")
        lines2.append(f"snp{j} A B " + " ".join(cells2))
        lines1.append(f"snp{j} A B " + " ".join(cells1))
    (d / "dose2.txt").write_text("\n".join(lines2) + "\n")
    (d / "dose1.txt").write_text("\n".join(lines1) + "\n")
    with gzip.open(d / "dose2.txt.gz", "wt") as f:
        f.write("\n".join(lines2) + "\n")
    return d


def test_dosage_cc_logistic(panel):
    d = panel
    args = ["--dosage", "dose2.txt", "--fam", "d.fam", "--map", "d.map",
            "--allow-no-sex"]
    run19(args + ["--out", "o_cc"], str(d))
    run_tpu(args + ["--out", "t_cc", "--silent"], str(d))
    _cmp(d, "o_cc.assoc.dosage", "t_cc.assoc.dosage")


def test_dosage_cc_nomap(panel):
    d = panel
    args = ["--dosage", "dose2.txt", "--fam", "d.fam", "--allow-no-sex"]
    run19(args + ["--out", "o_nm"], str(d))
    run_tpu(args + ["--out", "t_nm", "--silent"], str(d))
    _cmp(d, "o_nm.assoc.dosage", "t_nm.assoc.dosage")


def test_dosage_format1_dose1_gz(panel):
    d = panel
    args = ["--dosage", "dose1.txt", "format=1", "dose1", "--fam",
            "d.fam", "--map", "d.map", "--allow-no-sex"]
    run19(args + ["--out", "o_f1"], str(d))
    run_tpu(args + ["--out", "t_f1", "--silent"], str(d))
    _cmp(d, "o_f1.assoc.dosage", "t_f1.assoc.dosage")
    # gzip-compressed input
    args = ["--dosage", "dose2.txt.gz", "--fam", "d.fam",
            "--allow-no-sex"]
    run19(args + ["--out", "o_gz"], str(d))
    run_tpu(args + ["--out", "t_gz", "--silent"], str(d))
    _cmp(d, "o_gz.assoc.dosage", "t_gz.assoc.dosage")


def test_dosage_qt_linear(panel):
    d = panel
    args = ["--dosage", "dose2.txt", "--fam", "d.fam", "--map", "d.map",
            "--pheno", "qt.phe", "--allow-no-sex"]
    run19(args + ["--out", "o_qt"], str(d))
    run_tpu(args + ["--out", "t_qt", "--silent"], str(d))
    _cmp(d, "o_qt.assoc.dosage", "t_qt.assoc.dosage")


def test_dosage_freqcc_and_sex(panel):
    d = panel
    args = ["--dosage", "dose2.txt", "case-control-freqs", "--fam",
            "d.fam", "--map", "d.map", "--allow-no-sex"]
    run19(args + ["--out", "o_fc"], str(d))
    run_tpu(args + ["--out", "t_fc", "--silent"], str(d))
    _cmp(d, "o_fc.assoc.dosage", "t_fc.assoc.dosage")
    args = ["--dosage", "dose2.txt", "sex", "--fam", "d.fam",
            "--allow-no-sex"]
    run19(args + ["--out", "o_sx"], str(d))
    run_tpu(args + ["--out", "t_sx", "--silent"], str(d))
    _cmp(d, "o_sx.assoc.dosage", "t_sx.assoc.dosage")


def test_dosage_occur(panel):
    d = panel
    args = ["--dosage", "dose2.txt", "occur", "--fam", "d.fam",
            "--allow-no-sex"]
    run19(args + ["--out", "o_oc"], str(d))
    run_tpu(args + ["--out", "t_oc", "--silent"], str(d))
    _cmp(d, "o_oc.occur.dosage", "t_oc.occur.dosage")


@pytest.fixture(scope="module")
def list_panel(tmp_path_factory):
    """Multi-file batches: one unnumbered batch (samples split across two
    files) and two numbered batches with disjoint variant sets, plus
    sepheader variants (plink_dosage.c:1190-1345)."""
    import numpy as np

    d = tmp_path_factory.mktemp("dlist")
    rng = np.random.default_rng(5)
    n = 30
    with open(d / "d.fam", "w") as f:
        for i in range(n):
            f.write(f"f{i} i{i} 0 0 {1 + i % 2} {1 + (i % 3 == 0)}\n")
    ids = [(f"f{i}", f"i{i}") for i in range(n)]

    def write_dosage(path, sample_slice, vids, seed):
        r = np.random.default_rng(seed)
        with open(path, "w") as f:
            f.write("SNP A1 A2 " + " ".join(
                f"{a} {b}" for a, b in sample_slice) + "\n")
            for v in vids:
                probs = []
                for _ in sample_slice:
                    p1 = r.uniform(0, 1)
                    p2 = r.uniform(0, 1 - p1)
                    probs += [round(p1, 3), round(p2, 3)]
                f.write(f"{v} A B "
                        + " ".join(str(x) for x in probs) + "\n")

    vids1 = [f"rs{k}" for k in range(12)]
    vids2 = [f"rx{k}" for k in range(9)]
    write_dosage(d / "fA.dose", ids[:14], vids1, 11)
    write_dosage(d / "fB.dose", ids[14:], vids1, 12)
    write_dosage(d / "fC.dose", ids[:20], vids2, 13)
    write_dosage(d / "fD.dose", ids[20:], vids2, 14)
    (d / "list1.txt").write_text("fA.dose\nfB.dose\n")
    (d / "list2.txt").write_text(
        "2 fC.dose\n1 fA.dose\n1 fB.dose\n2 fD.dose\n")
    for tag in ("fA", "fB"):
        lines = (d / f"{tag}.dose").read_text().splitlines()
        hdr = lines[0].split()[3:]
        (d / f"{tag}.hdr").write_text("".join(
            f"{hdr[k]} {hdr[k + 1]}\n" for k in range(0, len(hdr), 2)))
        (d / f"{tag}.nh").write_text("\n".join(lines[1:]) + "\n")
    (d / "list3.txt").write_text("fA.nh fA.hdr\nfB.nh fB.hdr\n")
    return d


LIST_CASES = [
    (["list1.txt", "list"], "l1", "assoc.dosage"),
    (["list2.txt", "list"], "l2", "assoc.dosage"),
    (["list3.txt", "list", "sepheader"], "l3", "assoc.dosage"),
    (["list2.txt", "list", "occur"], "oc", "occur.dosage"),
]


@pytest.mark.parametrize("mods,tag,ext", LIST_CASES,
                         ids=[c[1] for c in LIST_CASES])
def test_dosage_list(list_panel, mods, tag, ext):
    import subprocess

    from plink_tpu.cli import main

    d = list_panel
    args = ["--fam", "d.fam", "--dosage"] + mods
    subprocess.run([ORACLE19] + args + ["--out", f"o_{tag}"], cwd=d,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(args + ["--out", f"t_{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"o_{tag}.{ext}").read_bytes() == \
        (d / f"t_{tag}.{ext}").read_bytes()


def test_write_dosage(list_panel):
    """--write-dosage merge/reformat: all-fam-sample header, NA padding
    for uncovered samples, raw p1/p2 retention for format 2/3
    (plink_dosage.c:1553-1566, 2100-2185)."""
    import subprocess

    from plink_tpu.cli import main

    d = list_panel
    for tag, mods in (("w1", ["fA.dose"]),
                      ("w2", ["list1.txt", "list"]),
                      ("w3", ["list2.txt", "list"])):
        args = ["--fam", "d.fam", "--dosage"] + mods + ["--write-dosage"]
        subprocess.run([ORACLE19] + args + ["--out", f"o_{tag}"], cwd=d,
                       check=True, capture_output=True)
        old = os.getcwd()
        os.chdir(d)
        try:
            assert main(args + ["--out", f"t_{tag}", "--silent"]) == 0
        finally:
            os.chdir(old)
        assert (d / f"o_{tag}.out.dosage").read_bytes() == \
            (d / f"t_{tag}.out.dosage").read_bytes(), tag

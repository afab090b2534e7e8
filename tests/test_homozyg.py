"""--homozyg differential tests: byte-diffed against plink 1.9."""

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
def roh_panel(tmp_path_factory):
    """120 samples x 4000 markers over chr1/chr2/chrX with implanted
    homozygous stretches, realistic spacing, missingness, and sexes."""
    d = tmp_path_factory.mktemp("roh")
    rng = np.random.default_rng(42)
    S, M = 120, 4000
    chrom = np.concatenate(
        [np.full(1600, 1), np.full(1600, 2), np.full(800, 23)])
    pos = np.zeros(M, np.int64)
    for c in (1, 2, 23):
        idx = np.flatnonzero(chrom == c)
        pos[idx] = np.cumsum(rng.integers(200, 3000, idx.size)) + 10000
    maf = rng.uniform(0.05, 0.5, M)
    g = np.zeros((M, S), np.int8)
    for v in range(M):
        p = maf[v]
        g[v] = rng.choice([0, 1, 2], size=S,
                          p=[(1 - p) ** 2, 2 * p * (1 - p), p * p])
    for s in range(S):
        for _ in range(rng.integers(1, 5)):
            c = rng.choice([1, 2, 23])
            idx = np.flatnonzero(chrom == c)
            ln = rng.integers(80, 600)
            a = rng.integers(0, max(1, idx.size - ln))
            sel = idx[a:a + ln]
            hom = np.where(rng.random(sel.size) < maf[sel], 2, 0)
            hom = np.where(rng.random(sel.size) < 0.01, 1, hom)
            g[sel, s] = hom
    g[rng.random((M, S)) < 0.015] = -1
    code = np.where(g < 0, 1, np.where(g == 0, 0,
                                       np.where(g == 1, 2, 3))).astype(
        np.uint8)
    nb = (S + 3) // 4
    packed = np.zeros((M, nb), np.uint8)
    for k in range(4):
        cols = code[:, k::4]
        packed[:, : cols.shape[1]] |= cols << (2 * k)
    (d / "syn.bed").write_bytes(bytes([0x6C, 0x1B, 0x01])
                                + packed.tobytes())
    with open(d / "syn.bim", "w") as f:
        for v in range(M):
            f.write(f"{chrom[v]}\tsnp{v}\t0\t{pos[v]}\tA\tB\n")
    with open(d / "syn.fam", "w") as f:
        for s in range(S):
            sex = 1 if s % 2 == 0 else 2
            phe = -9 if s % 11 == 0 else (1 + (s % 3 == 0))
            f.write(f"fam{s} ind{s} 0 0 {sex} {phe}\n")
    return d


CASES = [
    ("def", []),
    ("dens", ["--homozyg-snp", "30", "--homozyg-kb", "50",
              "--homozyg-density", "2"]),
    ("gap", ["--homozyg-snp", "30", "--homozyg-kb", "50",
             "--homozyg-gap", "3"]),
    ("het0", ["--homozyg-snp", "30", "--homozyg-kb", "50",
              "--homozyg-het", "0"]),
    ("het2", ["--homozyg-snp", "30", "--homozyg-kb", "50",
              "--homozyg-het", "2"]),
    ("win", ["--homozyg-window-snp", "20", "--homozyg-window-het", "2",
             "--homozyg-window-missing", "3",
             "--homozyg-window-threshold", "0.1",
             "--homozyg-snp", "25", "--homozyg-kb", "20"]),
]


@pytest.mark.parametrize("name,extra", CASES, ids=[c[0] for c in CASES])
def test_homozyg_matches_19(roh_panel, name, extra):
    d = roh_panel
    run19(["--bfile", "syn", "--homozyg"] + extra + ["--out", f"o_{name}"],
          str(d))
    run_tpu(["--bfile", "syn", "--homozyg"] + extra
            + ["--out", f"t_{name}", "--silent"], str(d))
    for ext in ("hom", "hom.indiv", "hom.summary"):
        assert (d / f"o_{name}.{ext}").read_bytes() == \
            (d / f"t_{name}.{ext}").read_bytes(), (name, ext)


MOD_CASES = [
    ("extend", ["extend"], ["--homozyg-snp", "30", "--homozyg-kb", "50"]),
    ("extend-het0", ["extend"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50", "--homozyg-het", "0"]),
    ("extend-gap", ["extend"],
     ["--homozyg-snp", "25", "--homozyg-kb", "20", "--homozyg-gap", "3",
      "--homozyg-window-threshold", "0.03"]),
    ("sub1", ["subtract-1-from-lengths"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50"]),
]


@pytest.mark.parametrize("tag,mods,extra", MOD_CASES,
                         ids=[c[0] for c in MOD_CASES])
def test_homozyg_modifiers(roh_panel, tag, mods, extra):
    d = roh_panel
    run19(["--bfile", "syn", "--homozyg"] + mods + extra
          + ["--out", f"om_{tag}"], str(d))
    run_tpu(["--bfile", "syn", "--homozyg"] + mods + extra
            + ["--out", f"tm_{tag}", "--silent"], str(d))
    for ext in ("hom", "hom.indiv", "hom.summary"):
        assert (d / f"om_{tag}.{ext}").read_bytes() == \
            (d / f"tm_{tag}.{ext}").read_bytes(), (tag, ext)


def test_homozyg_sample_filter(roh_panel):
    """--keep subsets change the filtered male-skip word-boundary path."""
    d = roh_panel
    fam = (d / "syn.fam").read_text().splitlines()
    with open(d / "keep81.txt", "w") as f:
        for ln in fam[39:120]:
            p = ln.split()
            f.write(f"{p[0]} {p[1]}\n")
    args = ["--bfile", "syn", "--keep", "keep81.txt", "--homozyg",
            "--homozyg-snp", "30", "--homozyg-kb", "50"]
    run19(args + ["--out", "ok81"], str(d))
    run_tpu(args + ["--out", "tk81", "--silent"], str(d))
    for ext in ("hom", "hom.indiv", "hom.summary"):
        assert (d / f"ok81.{ext}").read_bytes() == \
            (d / f"tk81.{ext}").read_bytes(), ext


GROUP_CASES = [
    ("grp", ["group"], ["--homozyg-snp", "30", "--homozyg-kb", "50"]),
    ("grp-pool3", ["group"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50", "--pool-size", "3"]),
    ("grp-match", ["group"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50",
      "--homozyg-match", "0.99"]),
    ("grp-con", ["group", "consensus-match"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50"]),
    ("grp-ext", ["group", "extend"],
     ["--homozyg-snp", "30", "--homozyg-kb", "50"]),
    ("grp-win", ["group"],
     ["--homozyg-window-snp", "20", "--homozyg-window-het", "2",
      "--homozyg-window-missing", "3", "--homozyg-window-threshold",
      "0.1", "--homozyg-snp", "25", "--homozyg-kb", "20"]),
]


@pytest.mark.parametrize("tag,mods,extra", GROUP_CASES,
                         ids=[c[0] for c in GROUP_CASES])
def test_homozyg_group(roh_panel, tag, mods, extra):
    d = roh_panel
    run19(["--bfile", "syn", "--homozyg"] + mods + extra
          + ["--out", f"og_{tag}"], str(d))
    run_tpu(["--bfile", "syn", "--homozyg"] + mods + extra
            + ["--out", f"tg_{tag}", "--silent"], str(d))
    for ext in ("hom", "hom.overlap"):
        assert (d / f"og_{tag}.{ext}").read_bytes() == \
            (d / f"tg_{tag}.{ext}").read_bytes(), (tag, ext)


def test_homozyg_group_verbose(roh_panel):
    d = roh_panel
    extra = ["--homozyg-snp", "30", "--homozyg-kb", "50"]
    run19(["--bfile", "syn", "--homozyg", "group-verbose"] + extra
          + ["--out", "ogv"], str(d))
    run_tpu(["--bfile", "syn", "--homozyg", "group-verbose"] + extra
            + ["--out", "tgv", "--silent"], str(d))
    assert (d / "ogv.hom.overlap").read_bytes() == \
        (d / "tgv.hom.overlap").read_bytes()
    import glob

    o_files = sorted(glob.glob(str(d / "ogv.hom.overlap.S*.verbose")))
    t_files = sorted(glob.glob(str(d / "tgv.hom.overlap.S*.verbose")))
    assert len(o_files) > 0
    assert [os.path.basename(p)[4:] for p in o_files] == \
        [os.path.basename(p)[4:] for p in t_files]
    for op, tp in zip(o_files, t_files):
        with open(op, "rb") as fo, open(tp, "rb") as ft:
            assert fo.read() == ft.read(), os.path.basename(op)

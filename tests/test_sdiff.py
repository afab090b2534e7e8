"""--sample-diff differential battery vs the plink2 oracle.

Covers ids=/base=/file= pair specs, pairwise per-pair files, counts-only,
include-missing, cols=/counts-cols= sets, zs (content compare), sex-aware
chrX/chrY accounting, and dosage[=tol] mode incl. the subset-dependent
AllGenoEqual shortcut (SdiffMainBatch, 2.0/plink2_misc.cc:8730)."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panels(tmp_path_factory):
    d = tmp_path_factory.mktemp("sdiff")
    subprocess.run([ORACLE, "--dummy", "60", "120", "0.08", "--seed", "44",
                    "--out", "d"], cwd=d, check=True, capture_output=True)
    subprocess.run([ORACLE, "--dummy", "50", "80", "0.04",
                    "dosage-freq=0.7", "--seed", "13", "--out", "dd"],
                   cwd=d, check=True, capture_output=True)
    subprocess.run([ORACLE, "--dummy", "40", "100", "0.06", "--seed", "9",
                    "--out", "xy"], cwd=d, check=True, capture_output=True)
    lines = (d / "xy.pvar").read_text().splitlines()
    out = []
    k = -1
    for ln in lines:
        if ln.startswith("#"):
            out.append(ln)
            continue
        k += 1
        t = ln.split("\t")
        t[0] = ("1" if k < 60 else "23" if k < 80 else "24" if k < 92
                else "26")
        out.append("\t".join(t))
    (d / "xy.pvar").write_text("\n".join(out) + "\n")
    ps = (d / "xy.psam").read_text().splitlines()
    out = [ps[0]]
    for i, ln in enumerate(ps[1:]):
        t = ln.split("\t")
        t[1] = "1" if i % 2 == 0 else "2"
        out.append("\t".join(t))
    (d / "xy.psam").write_text("\n".join(out) + "\n")
    (d / "pf.txt").write_text("per1\tper3\nper5\tper1\nper2\tper4\n")
    return d


CASES = [
    ("d", ["ids=per1", "per3", "per5", "per7"], "ids"),
    ("d", ["pairwise", "ids=per1", "per3", "per5", "per7"], "pw"),
    ("d", ["counts-only",
           "counts-cols=fid,sid,nobs,nobsibs,ibs0,ibs1,ibs2,halfmiss,diff",
           "ids=per1", "per3", "per5", "per7"], "ccols"),
    ("d", ["include-missing", "ids=per1", "per3", "per5"], "incmiss"),
    ("d", ["base=per2", "per4", "per6"], "base"),
    ("d", ["file={PF}"], "file"),
    ("d", ["cols=chrom,pos,id,ref,alt,provref,fid,sid,geno",
           "ids=per1", "per3"], "cols"),
    ("xy", ["counts-cols=nobs,nobsibs,ibs0,ibs1,ibs2,diff",
            "ids=per0", "per2", "per4"], "xy_mm"),
    ("xy", ["ids=per1", "per3", "per5"], "xy_ff"),
    ("xy", ["include-missing", "base=per0", "per2", "per4"], "xy_im"),
    ("dd", ["dosage=0.12", "ids=per1", "per3", "per5"], "dos_tol"),
    ("dd", ["dosage", "counts-only",
            "counts-cols=nobs,nobsibs,ibs0,ibs1,ibs2,diff",
            "ids=per1", "per3", "per5", "per7"], "dos_cc"),
    ("dd", ["dosage=0.3", "include-missing", "ids=per2", "per4"], "dos_im"),
]


@pytest.mark.parametrize("panel,mods,tag", CASES, ids=[c[2] for c in CASES])
def test_sdiff_parity(panels, panel, mods, tag):
    import glob

    from plink_tpu.cli import main

    d = panels
    mods = [m.replace("{PF}", str(d / "pf.txt")) for m in mods]
    args = ["--pfile", str(d / panel), "--sample-diff"] + mods
    subprocess.run([ORACLE] + args + ["--out", str(d / f"o_{tag}")],
                   check=True, capture_output=True, cwd=d)
    assert main(args + ["--out", str(d / f"t_{tag}"), "--silent"]) == 0
    ofiles = sorted(glob.glob(str(d / f"o_{tag}.*sdiff*")))
    assert ofiles
    for of in ofiles:
        tf = of.replace(f"o_{tag}", f"t_{tag}", 1)
        assert open(of, "rb").read() == open(tf, "rb").read(), \
            os.path.basename(of)


def test_sdiff_zs_content(panels):
    """zs outputs compared decompressed (zstd streams differ byte-wise)."""
    import glob

    import zstandard

    from plink_tpu.cli import main

    d = panels
    args = ["--pfile", str(d / "d"), "--sample-diff", "zs", "pairwise",
            "fname-id-delim=-", "ids=per1", "per3", "per5"]
    subprocess.run([ORACLE] + args + ["--out", str(d / "o_zs")],
                   check=True, capture_output=True, cwd=d)
    assert main(args + ["--out", str(d / "t_zs"), "--silent"]) == 0
    ofiles = sorted(glob.glob(str(d / "o_zs.*.sdiff.zst")))
    assert len(ofiles) == 3
    dctx = zstandard.ZstdDecompressor()
    for of in ofiles:
        tf = of.replace("o_zs", "t_zs", 1)
        assert dctx.decompress(
            open(of, "rb").read(), max_output_size=1 << 26) == \
            dctx.decompress(open(tf, "rb").read(), max_output_size=1 << 26)
    assert (d / "o_zs.sdiff.summary").read_bytes() == \
        (d / "t_zs.sdiff.summary").read_bytes()

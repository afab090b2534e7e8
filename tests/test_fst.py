"""--fst differential tests (Hudson + Weir-Cockerham, byte-identical)."""

import os
import random
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("fst")
    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.05", "--seed", "41", "--out", "fp"],
        cwd=d, check=True, capture_output=True,
    )
    rng = random.Random(6)
    lines = (d / "fp.psam").read_text().splitlines()
    with open(d / "fp.psam", "w") as f:
        f.write(lines[0] + "\tPOP\n")
        for l in lines[1:]:
            f.write(l + "\t" + rng.choice(["AFR", "EUR", "EAS"]) + "\n")
    return d


@pytest.mark.parametrize("method", ["hudson", "wc"])
def test_fst_differential(panel, method):
    from plink_tpu.cli import main

    flags = ["--pfile", "fp", "--fst", "POP"]
    if method == "wc":
        flags.append("method=wc")
    subprocess.run([ORACLE] + flags + ["--out", f"o{method}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{method}"]) == 0
    finally:
        os.chdir(old)
    assert (panel / f"o{method}.fst.summary").read_bytes() == (
        panel / f"t{method}.fst.summary"
    ).read_bytes()


@pytest.fixture(scope="module")
def xpanel(tmp_path_factory):
    """chr1 + chrX panel with sexes and 3 populations."""
    d = tmp_path_factory.mktemp("fstx")
    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.05", "--seed", "42", "--out", "fx"],
        cwd=d, check=True, capture_output=True,
    )
    rng = random.Random(7)
    lines = (d / "fx.psam").read_text().splitlines()
    with open(d / "fx.psam", "w") as f:
        f.write("#IID\tSEX\tPHENO1\tPOP\n")
        for i, l in enumerate(lines[1:]):
            iid, _sex, ph = l.split("\t")
            f.write(f"{iid}\t{1 + i % 2}\t{ph}\t"
                    + rng.choice(["AFR", "EUR", "EAS"]) + "\n")
    plines = (d / "fx.pvar").read_text().splitlines()
    with open(d / "fx.pvar", "w") as f:
        f.write(plines[0] + "\n")
        body = plines[1:]
        half = len(body) // 2
        for i, l in enumerate(body):
            cols = l.split("\t")
            cols[0] = "1" if i < half else "X"
            f.write("\t".join(cols) + "\n")
    return d


def test_fst_chrx_differential(xpanel):
    """Hudson chrX pass: .x.fst.summary + .x per-variant files byte-match."""
    from plink_tpu.cli import main

    flags = ["--pfile", "fx", "--fst", "POP", "report-variants"]
    subprocess.run([ORACLE] + flags + ["--out", "ox"], cwd=xpanel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(xpanel)
    try:
        assert main(flags + ["--out", "tx"]) == 0
    finally:
        os.chdir(old)
    outs = sorted(p.name[2:] for p in xpanel.glob("ox*") if not
                  p.name.endswith(".log"))
    assert any(s.startswith(".x.") for s in outs)
    for s in outs:
        assert (xpanel / ("ox" + s)).read_bytes() == (
            xpanel / ("tx" + s)
        ).read_bytes(), s


@pytest.mark.parametrize("mods,exts", [
    (["blocksize=37"], [".fst.summary"]),
    (["blocksize=37", "cols=nobs"], [".fst.summary"]),
    # blocksize values that divide the valid-variant count exactly hit an
    # upstream out-of-bounds read (plink2_misc.cc:12209 block loop runs
    # n_block+1 times when nobs %% blocksize == 0, reading a phantom
    # block), so the oracle's SE is garbage there; test the well-defined
    # remainder case
    (["method=wc", "blocksize=23"], [".fst.summary"]),
    (["base=AFR"], [".fst.summary"]),
    (["base=AFR", "EUR"], [".fst.summary"]),
    (["ids=AFR", "EAS"], [".fst.summary"]),
    (["report-variants", "vcols=chrom,pos,ref,alt,nobs,fstfrac,fst"],
     [".fst.summary", ".AFR.EAS.fst.var"]),
    (["report-variants", "vcols=+nallele"],
     [".fst.summary", ".AFR.EAS.fst.var"]),
], ids=lambda x: "_".join(x) if isinstance(x, list) and x and not x[0].startswith(".") else None)
def test_fst_modifiers(panel, mods, exts):
    """blocksize=/cols=/vcols=/base=/ids= (--fst grammar,
    2.0/plink2_help.cc:896; jackknife 2.0/plink2_misc.cc:12190-12240)."""
    from plink_tpu.cli import main

    tag = "m" + str(abs(hash(tuple(mods))) % 100000)
    flags = ["--pfile", "fp", "--fst", "POP"] + mods
    subprocess.run([ORACLE] + flags + ["--out", f"o{tag}"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", f"t{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    for ext in exts:
        assert (panel / f"o{tag}{ext}").read_bytes() == \
            (panel / f"t{tag}{ext}").read_bytes(), ext


def test_fst_pair_file(panel):
    from plink_tpu.cli import main

    (panel / "pairs.txt").write_text("AFR EUR\nEAS EUR\n")
    flags = ["--pfile", "fp", "--fst", "POP", "file=pairs.txt"]
    subprocess.run([ORACLE] + flags + ["--out", "opf"], cwd=panel,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(panel)
    try:
        assert main(flags + ["--out", "tpf", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (panel / "opf.fst.summary").read_bytes() == \
        (panel / "tpf.fst.summary").read_bytes()

"""--cfile/--cnv-make-map differential tests vs the PLINK 1.9 dev build.

The CNV module's analysis stages are unimplemented UPSTREAM (plink_cnv.c
prints "(Subsequent functions have not been implemented yet.)" after
loading the map, :1040); map generation + its segment filters and
interval intersect/exclude machinery are the implemented surface, and
the .cnv.map outputs here are byte-diffed against the dev-build oracle
(the stable build gates CNV flags behind UNSTABLE)."""

import os
import subprocess

import pytest

ORACLE19DEV = os.environ.get("PLINK19DEV_ORACLE", "/tmp/oracle19dev/plink")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE19DEV), reason="plink 1.9 dev oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("cnv")
    segs = [
        ("f1", "i1", "1", 100, 20000, 1, 7.5, 10),
        ("f1", "i1", "1", 15000, 400000, 3, 9.0, 12),
        ("f2", "i2", "2", 500, 900, 0, 5.0, 4),
        ("f2", "i2", "2", 5000, 95000, 4, 2.5, 40),
        ("f3", "i3", "1", 250000, 260000, 1, 11.0, 3),
        ("f3", "i3", "23", 7000, 9000, 3, 1.0, 2),
    ]
    with open(d / "c.cnv", "w") as f:
        f.write("FID IID CHR BP1 BP2 TYPE SCORE SITES\n")
        for s in segs:
            f.write(" ".join(str(x) for x in s) + "\n")
    with open(d / "c.fam", "w") as f:
        for tag in ("f1 i1", "f2 i2", "f3 i3"):
            f.write(f"{tag} 0 0 1 1\n")
    with open(d / "regions.txt", "w") as f:
        f.write("1 10000 30000 geneA\n1 255000 258000 geneB\n"
                "2 400 600 geneC\n")
    return d


def _both(d, flags, tag):
    from plink_tpu.cli import main

    subprocess.run([ORACLE19DEV, "--cfile", "c"] + flags
                   + ["--out", f"o_{tag}"], cwd=d, capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        try:
            main(["--cfile", "c"] + flags + ["--out", f"t_{tag}",
                                             "--silent"])
        except FileNotFoundError:
            pass  # upstream also errors post-generation when c.cnv.map
            # does not exist; the .cnv.map comparison below is the test
    finally:
        os.chdir(old)
    a = (d / f"o_{tag}.cnv.map")
    b = (d / f"t_{tag}.cnv.map")
    assert a.exists() and b.exists(), tag
    assert a.read_bytes() == b.read_bytes(), tag


CASES = [
    (["--cnv-make-map"], "plain"),
    (["--cnv-make-map", "short"], "short"),
    (["--cnv-make-map", "--cnv-kb", "50"], "kb"),
    (["--cnv-make-map", "--cnv-max-kb", "100"], "maxkb"),
    (["--cnv-make-map", "--cnv-score", "5"], "score"),
    (["--cnv-make-map", "--cnv-max-score", "8"], "maxscore"),
    (["--cnv-make-map", "--cnv-sites", "5"], "sites"),
    (["--cnv-make-map", "--cnv-max-sites", "11"], "maxsites"),
    (["--cnv-make-map", "--cnv-del"], "del"),
    (["--cnv-make-map", "--cnv-dup"], "dup"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt"], "isect"),
    (["--cnv-make-map", "--cnv-exclude", "regions.txt"], "excl"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt",
      "--cnv-overlap", "0.5"], "ovl"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt",
      "--cnv-region-overlap", "0.5"], "rovl"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt",
      "--cnv-union-overlap", "0.1"], "uovl"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt",
      "--cnv-disrupt"], "disrupt"),
    (["--cnv-make-map", "--cnv-intersect", "regions.txt",
      "--cnv-subset", "subset.txt"], "subset"),
]


@pytest.mark.parametrize("flags,tag", CASES, ids=[c[1] for c in CASES])
def test_cnv_make_map(panel, flags, tag):
    if tag == "subset":
        (panel / "subset.txt").write_text("geneA\ngeneC\n")
    _both(panel, flags, tag)


def test_cnv_autogen_and_load(panel, capfd):
    """Map autogeneration (short format, unfiltered) + the upstream
    'subsequent functions unimplemented' surface."""
    from plink_tpu.cli import main

    d = panel
    if (d / "c.cnv.map").exists():
        (d / "c.cnv.map").unlink()
    subprocess.run([ORACLE19DEV, "--cfile", "c", "--out", "o_auto"],
                   cwd=d, check=True, capture_output=True)
    oracle_map = (d / "c.cnv.map").read_bytes()
    (d / "c.cnv.map").unlink()
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--cfile", "c", "--out", "t_auto", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "c.cnv.map").read_bytes() == oracle_map
    out = capfd.readouterr().out
    assert "Subsequent functions have not been" in out

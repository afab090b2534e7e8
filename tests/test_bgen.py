"""BGEN 1.2/1.3 import/export tests (Bgen13GenoToPgenThread /
ExportBgen13, 2.0/plink2_import.cc:12074, 2.0/plink2_export.cc:1943):
importing oracle-written BGEN matches the oracle's own import
byte-for-byte (afreq/vmiss), and oracle re-imports our BGEN exports with
identical frequencies."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("bgen")
    subprocess.run(
        [ORACLE, "--dummy", "90", "70", "0.05", "scalar-pheno", "--seed",
         "23", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    for ver in ("1.2", "1.3"):
        subprocess.run(
            [ORACLE, "--pfile", "gq", "--export", f"bgen-{ver}", "--out",
             f"ob{ver.replace('.', '')}"],
            cwd=d, check=True, capture_output=True,
        )
    return d


@pytest.mark.parametrize("ver", ["1.2", "1.3"])
def test_bgen_import(panel, ver):
    from plink_tpu.cli import main

    d = panel
    f = f"ob{ver.replace('.', '')}.bgen"
    subprocess.run(
        [ORACLE, "--bgen", f, "ref-last", "--freq", "--missing", "--out",
         "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--bgen", f, "ref-last", "--freq", "--missing",
                     "--out", "t_i", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_i.afreq").read_text() == (d / "t_i.afreq").read_text()
    assert (d / "o_i.vmiss").read_text() == (d / "t_i.vmiss").read_text()


@pytest.mark.parametrize("ver", ["1.2", "1.3"])
def test_bgen_export_roundtrip(panel, ver):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "gq", "--export", f"bgen-{ver}", "--out",
                     "t_e", "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run(
        [ORACLE, "--bgen", "t_e.bgen", "ref-last", "--freq", "--out", "o_r"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "gq", "--freq", "--out", "g_f"],
        cwd=d, check=True, capture_output=True,
    )
    a = [l.split("\t") for l in (d / "g_f.afreq").read_text().splitlines()[1:]]
    b = [l.split("\t") for l in (d / "o_r.afreq").read_text().splitlines()[1:]]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x[1] == y[1] and x[-2:] == y[-2:]


@pytest.fixture(scope="module")
def dosage_panel(tmp_path_factory):
    """Dosage + phased panels exported to BGEN by the oracle."""
    d = tmp_path_factory.mktemp("bgend")
    subprocess.run(
        [ORACLE, "--dummy", "120", "60", "0.04", "dosage-freq=0.6",
         "--seed", "31", "--out", "dp"],
        cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--dummy", "120", "60", "0.04", "phase-freq=0.7",
         "dosage-freq=0.5", "--seed", "37", "--out", "pp"],
        cwd=d, check=True, capture_output=True,
    )
    for src, out, bits in (("dp", "e16", "16"), ("dp", "e8", "8"),
                           ("pp", "ep16", "16"), ("pp", "ep12", "12")):
        subprocess.run(
            [ORACLE, "--pfile", src, "--export", "bgen-1.3", f"bits={bits}",
             "--out", out],
            cwd=d, check=True, capture_output=True,
        )
    return d


def _dump_pgen(pfx):
    import numpy as np

    from plink_tpu.pgenlib import PgenReader

    r = PgenReader((str(pfx) + ".pgen").encode())
    M, N = r.get_variant_ct(), r.get_raw_sample_ct()
    out = []
    for v in range(M):
        al = np.empty(2 * N, np.int32)
        pp = np.empty(N, bool)
        r.read_alleles_and_phasepresent(v, al, pp)
        db = np.empty(N, np.float32)
        r.read_dosages(v, db, allele_idx=1)
        g = np.empty(N, np.int8)
        r.read(v, g)
        out.append((g.copy(), db.copy(), al.copy(), pp.copy()))
    return out


def _assert_pgen_equal(d, oracle_pfx, ours_pfx):
    import numpy as np

    a, b = _dump_pgen(d / oracle_pfx), _dump_pgen(d / ours_pfx)
    assert len(a) == len(b)
    for (go, do_, alo, ppo), (gt, dt, alt_, ppt) in zip(a, b):
        assert np.array_equal(go, gt)
        assert np.allclose(do_, dt, equal_nan=True)
        assert np.array_equal(alo, alt_)
        assert np.array_equal(ppo, ppt)


@pytest.mark.parametrize("bgen,mode", [
    ("e16", "ref-last"), ("e8", "ref-last"), ("e16", "ref-first"),
    ("ep16", "ref-last"), ("ep16", "ref-first"), ("ep12", "ref-last"),
])
def test_bgen_dosage_phase_import(dosage_panel, bgen, mode):
    """Dosage/phased/multi-bit BGEN import is bit-exact vs the oracle's
    import of the same file (hardcalls, 16384-scale dosages, hardcall
    phase, dphase; Bgen13ConvertBiallelicPhased semantics incl. the
    no-phaseinfo-flip ref-first rule, 2.0/plink2_import.cc:12544)."""
    from plink_tpu.cli import main

    d = dosage_panel
    subprocess.run(
        [ORACLE, "--bgen", f"{bgen}.bgen", mode, "--make-pgen",
         "--out", f"o_{bgen}_{mode}"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--bgen", f"{bgen}.bgen", mode, "--make-pgen",
                     "--out", f"t_{bgen}_{mode}", "--silent"]) == 0
    finally:
        os.chdir(old)
    _assert_pgen_equal(d, f"o_{bgen}_{mode}", f"t_{bgen}_{mode}")


def test_bgen_multiallelic_skip(tmp_path):
    """Multiallelic BGEN variants are skipped with the reference's warning
    (2.0/plink2_import.cc:14135).  The reference's own skip path then dies
    with a decompress error on the NEXT variant (broken "temporary
    kludge"), so the differential check imports an equivalent
    biallelic-only file through the oracle instead."""
    import struct
    import zlib

    import numpy as np

    from plink_tpu.cli import main

    N, B = 8, 8

    def geno_block(K, rows):
        body = struct.pack("<IH", N, K) + bytes([2, 2])
        body += bytes([2] * N) + bytes([0, B])
        for r in rows:
            body += bytes(r)
        blob = zlib.compress(body)
        return struct.pack("<II", len(blob) + 4, len(body)) + blob

    def variant(vid, K, alleles, rows):
        out = struct.pack("<H", 0)
        out += struct.pack("<H", len(vid)) + vid.encode()
        out += struct.pack("<H", 1) + b"1"
        out += struct.pack("<I", 100)
        out += struct.pack("<H", K)
        for a in alleles:
            out += struct.pack("<I", len(a)) + a.encode()
        return out + geno_block(K, rows)

    def write_bgenf(path, variants_blob, M):
        ids = b"".join(struct.pack("<H", 2) + f"s{i}".encode()
                       for i in range(N))
        sb = struct.pack("<II", 8 + len(ids), N) + ids
        hdr = (struct.pack("<III", 20, M, N) + b"bgen"
               + struct.pack("<I", (1 << 31) | (2 << 2) | 1))
        path.write_bytes(struct.pack("<I", 20 + len(sb)) + hdr + sb
                         + variants_blob)

    rng = np.random.default_rng(3)

    def birow():
        # numerators must satisfy sum <= 2^B - 1
        a = int(rng.integers(0, 256))
        return [a, int(rng.integers(0, 256 - a))]

    bi1 = [birow() for _ in range(N)]
    bi2 = [birow() for _ in range(N)]
    tri = []
    for _ in range(N):
        vals, left = [], 255
        for _k in range(5):
            v = int(rng.integers(0, max(1, left // 3)))
            vals.append(v)
            left -= v
        tri.append(vals)
    v0 = variant("v0", 2, ["A", "C"], bi1)
    vma = variant("vMA", 3, ["A", "C", "G"], tri)
    v2 = variant("v2", 2, ["T", "G"], bi2)
    write_bgenf(tmp_path / "ma.bgen", v0 + vma + v2, 3)
    write_bgenf(tmp_path / "nm.bgen", v0 + v2, 2)
    subprocess.run(
        [ORACLE, "--bgen", "nm.bgen", "ref-last", "--make-pgen",
         "--out", "onm"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--bgen", "ma.bgen", "ref-last", "--make-pgen",
                     "--out", "tma", "--silent"]) == 0
    finally:
        os.chdir(old)
    t_ids = [l.split("\t")[2] for l in
             (tmp_path / "tma.pvar").read_text().splitlines()
             if not l.startswith("#")]
    assert t_ids == ["v0", "v2"]
    assert "1 multiallelic variant skipped" in \
        (tmp_path / "tma.log").read_text()
    _assert_pgen_equal(tmp_path, "onm", "tma")

"""2.0 --import-dosage: PLINK 1.x-style allele dosage files -> pgen with a
dosage track (ref Plink1DosageToPgen area, 2.0/plink2_import.cc).
Hardcalls + 16384-scale dosages diffed vs the oracle's import."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def _dump(prefix):
    from plink_tpu.pgenlib import PgenReader

    r = PgenReader((str(prefix) + ".pgen").encode())
    M, N = r.get_variant_ct(), r.get_raw_sample_ct()
    out = []
    for v in range(M):
        g = np.empty(N, np.int8)
        r.read(v, g)
        db = np.empty(N, np.float32)
        r.read_dosages(v, db, allele_idx=1)
        out.append((g.copy(), db.copy()))
    return out


@pytest.mark.parametrize("fmt", ["2", "1"])
def test_import_dosage(tmp_path, fmt):
    from plink_tpu.cli import main

    rng = np.random.default_rng(7)
    n, m = 20, 15
    with open(tmp_path / "p.psam", "w") as f:
        f.write("#FID\tIID\tSEX\n")
        for i in range(n):
            f.write(f"f{i}\ts{i}\t1\n")
    with open(tmp_path / "d.dose", "w") as f:
        hdr = ["SNP", "A1", "A2"] + [x for i in range(n)
                                     for x in (f"f{i}", f"s{i}")]
        f.write(" ".join(hdr) + "\n")
        for v in range(m):
            row = [f"snp{v}", "A", "B"]
            for i in range(n):
                if fmt == "2":
                    paa = rng.random()
                    pab = rng.random() * (1 - paa)
                    row += [f"{paa:.4f}", f"{pab:.4f}"]
                else:
                    row += [f"{rng.random():.4f}"]
            f.write(" ".join(row) + "\n")
    with open(tmp_path / "d.map", "w") as f:
        for v in range(m):
            f.write(f"1 snp{v} 0 {v+10}\n")
    mods = [] if fmt == "2" else ["format=1", "dose1"]
    args = ["--import-dosage", "d.dose"] + mods + [
        "--psam", "p.psam", "--map", "d.map", "--make-pgen"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(args + ["--out", "t", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (tmp_path / "o.pvar").read_text() == \
        (tmp_path / "t.pvar").read_text()
    a, b = _dump(tmp_path / "o"), _dump(tmp_path / "t")
    for (go, do_), (gt, dt) in zip(a, b):
        assert np.array_equal(go, gt)
        assert np.allclose(do_, dt, equal_nan=True, atol=1e-4)

"""Public pgenlib-style bindings (plink_tpu.pgenlib), spec:
2.0/Python/python_api.txt.  Round-trips verified internally and written
files structurally validated by the plink2 oracle."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
HAVE_ORACLE = os.path.exists(ORACLE)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    if not HAVE_ORACLE:
        pytest.skip("oracle not built")
    d = tmp_path_factory.mktemp("pgl")
    subprocess.run(
        [ORACLE, "--dummy", "37", "50", "0.1", "dosage-freq=0.4",
         "--seed", "5", "--out", "dp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def test_pvar_reader(panel):
    from plink_tpu import pgenlib

    with pgenlib.PvarReader(bytes(panel / "dp.pvar")) as pv:
        assert pv.get_variant_ct() == 50
        assert pv.get_variant_id(0) == "snp0"
        assert pv.get_allele_ct(0) == 2
        offs = pv.get_allele_idx_offsets()
        assert offs.shape == (51,)
        assert offs[-1] == 100
        assert pv.get_max_allele_ct() == 2


def test_reader_codes_vs_export(panel):
    from plink_tpu import pgenlib

    subprocess.run(
        [ORACLE, "--pfile", "dp", "--export", "A-transpose",
         "--out", "tr"], cwd=panel, check=True, capture_output=True,
    )
    # .traw rows: variant-major COUNTED-allele dosages after 6 meta cols;
    # COUNTED is the row's REF allele (plink2 A-transpose default), so
    # compare against allele_idx=0 reads
    lines = (panel / "tr.traw").read_text().splitlines()[1:]
    counted = [ln.split("\t")[4] for ln in lines]
    rows = [ln.split("\t")[6:] for ln in lines]
    exp = np.array(
        [[-9.0 if x == "NA" else float(x) for x in row] for row in rows],
        np.float64,
    )
    pv = pgenlib.PvarReader(bytes(panel / "dp.pvar"))
    assert all(
        counted[v] == pv.get_allele_code(v, 0) for v in range(len(counted))
    )
    pv.close()
    with pgenlib.PgenReader(bytes(panel / "dp.pgen")) as r:
        n, M = r.get_raw_sample_ct(), r.get_variant_ct()
        got = np.empty((M, n), np.float64)
        r.read_dosages_range(0, M, got, allele_idx=0)
    assert np.abs(got - exp).max() < 1e-4


def test_reader_allele0_counts_and_count(panel):
    from plink_tpu import pgenlib

    with pgenlib.PgenReader(bytes(panel / "dp.pgen")) as r:
        n = r.get_raw_sample_ct()
        alt = np.empty(n, np.int32)
        ref = np.empty(n, np.int64)
        r.read(7, alt)
        r.read(7, ref, allele_idx=0)
        ok = alt >= 0
        assert np.array_equal(ref[ok], 2 - alt[ok])
        assert (ref[~ok] == -9).all()
        cnt = np.empty(4, np.uint32)
        r.count(7, cnt)
        assert cnt[0] == (alt == 0).sum()
        assert cnt[3] == (alt == -9).sum()
        assert cnt.sum() == n


def test_reader_subset(panel):
    from plink_tpu import pgenlib

    with pgenlib.PgenReader(bytes(panel / "dp.pgen")) as r:
        n = r.get_raw_sample_ct()
        full = np.empty(n, np.int8)
        r.read(3, full)
        r.change_sample_subset(np.array([1, 4, 9, 20], np.uint32))
        sub = np.empty(4, np.int8)
        r.read(3, sub)
        assert np.array_equal(sub, full[[1, 4, 9, 20]])
        with pytest.raises(ValueError):
            r.change_sample_subset(np.array([4, 1], np.uint32))


def test_reader_dosages(panel):
    from plink_tpu import pgenlib

    with pgenlib.PgenReader(bytes(panel / "dp.pgen")) as r:
        n = r.get_raw_sample_ct()
        d = np.empty(n, np.float32)
        r.read_dosages(3, d)
        ok = d >= 0
        assert ok.any()
        assert (d[ok] <= 2.0).all()
        g = np.empty(n, np.int8)
        r.read(3, g)
        # a missing dosage implies a missing hardcall; the reverse is false
        # (mid-range dosages hardcall-threshold to missing)
        assert (g[d == -9] == -9).all()


def _roundtrip(path, n, M, writer_kwargs, append, read_check):
    from plink_tpu import pgenlib

    with pgenlib.PgenWriter(bytes(path), n, **writer_kwargs) as w:
        append(w)
    with pgenlib.PgenReader(bytes(path)) as r:
        assert r.get_raw_sample_ct() == n
        assert r.get_variant_ct() == M
        read_check(r)


def test_writer_biallelic_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    n, M = 23, 40
    G = rng.integers(0, 3, size=(M, n)).astype(np.int8)
    G[rng.random((M, n)) < 0.1] = -9

    def check(r):
        out = np.empty((M, n), np.int8)
        r.read_range(0, M, out)
        assert np.array_equal(out, G)

    _roundtrip(tmp_path / "w1.pgen", n, M, dict(variant_ct=M),
               lambda w: w.append_biallelic_batch(G), check)


def test_writer_phase_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    n, M = 19, 25
    G = rng.integers(0, 3, size=(M, n)).astype(np.int8)
    AC = np.zeros((M, 2 * n), np.int32)
    PP = np.zeros((M, n), np.uint8)
    for v in range(M):
        for s in range(n):
            g = G[v, s]
            if g == 1:
                ph = rng.random() < 0.5
                PP[v, s] = ph
                AC[v, 2 * s: 2 * s + 2] = (
                    (1, 0) if (ph and rng.random() < 0.5) else (0, 1)
                )
            else:
                AC[v, 2 * s: 2 * s + 2] = (g // 2, g // 2)

    def check(r):
        assert r.hardcall_phase_present()
        a = np.empty(2 * n, np.int32)
        p = np.empty(n, np.uint8)
        for v in range(M):
            r.read_alleles_and_phasepresent(v, a, p)
            for s in range(n):
                pair = (a[2 * s], a[2 * s + 1])
                if G[v, s] == 1 and PP[v, s]:
                    assert pair == tuple(AC[v, 2 * s: 2 * s + 2])
                    assert p[s]
                elif G[v, s] == 1:
                    assert sorted(pair) == [0, 1] and not p[s]
                else:
                    assert pair == (G[v, s] // 2, G[v, s] // 2) and p[s]

    _roundtrip(tmp_path / "w2.pgen", n, M,
               dict(variant_ct=M, hardcall_phase_present=True),
               lambda w: w.append_partially_phased_batch(AC, PP), check)


def test_writer_dosage_and_ct_limit(tmp_path):
    rng = np.random.default_rng(13)
    n, M = 17, 12
    D = np.clip(rng.random((M, n)) * 2, 0, 2)
    D[rng.random((M, n)) < 0.05] = -9

    def check(r):
        buf = np.empty(n, np.float64)
        for v in range(M):
            r.read_dosages(v, buf)
            exp = np.where(
                D[v] < 0, -9.0, np.rint(np.clip(D[v], 0, 2) * 16384) / 16384
            )
            assert np.allclose(buf, exp)

    # variant_ct_limit path: count only known at close
    _roundtrip(tmp_path / "w3.pgen", n, M,
               dict(variant_ct_limit=64, dosage_present=True),
               lambda w: w.append_dosages_batch(D), check)


def test_writer_multiallelic_roundtrip(tmp_path):
    from plink_tpu import pgenlib

    n, M = 11, 6
    rng = np.random.default_rng(17)
    AC = rng.integers(0, 4, size=(M, 2 * n)).astype(np.int32)
    AC[0, :2] = (-9, -9)
    with pgenlib.PgenWriter(bytes(tmp_path / "w4.pgen"), n, variant_ct=M,
                            allele_ct_limit=4) as w:
        w.append_alleles_batch(AC, allele_cts=np.full(M, 4, np.uint32))
    offs = np.arange(M + 1, dtype=np.uintp) * 4
    with pgenlib.PgenReader(bytes(tmp_path / "w4.pgen"),
                            allele_idx_offsets=offs) as r:
        a = np.empty(2 * n, np.int32)
        for v in range(M):
            r.read_alleles(v, a)
            for s in range(n):
                exp = sorted(AC[v, 2 * s: 2 * s + 2])
                if exp[0] < 0:
                    assert (a[2 * s], a[2 * s + 1]) == (-9, -9)
                else:
                    assert sorted((a[2 * s], a[2 * s + 1])) == exp
        # allele-specific count: allele 2 dosage per sample
        cnt2 = np.empty(n, np.int8)
        r.read(1, cnt2, allele_idx=2)
        exp2 = (AC[1].reshape(-1, 2) == 2).sum(axis=1)
        assert np.array_equal(cnt2, exp2)


@pytest.mark.skipif(not HAVE_ORACLE, reason="oracle not built")
def test_written_pgen_oracle_validate(tmp_path):
    from plink_tpu import pgenlib

    rng = np.random.default_rng(21)
    n, M = 23, 40
    G = rng.integers(0, 3, size=(M, n)).astype(np.int8)
    with pgenlib.PgenWriter(bytes(tmp_path / "w.pgen"), n,
                            variant_ct=M) as w:
        w.append_biallelic_batch(G)
    with open(tmp_path / "w.psam", "w") as f:
        f.write("#IID\tSEX\n")
        for i in range(n):
            f.write(f"s{i}\tNA\n")
    with open(tmp_path / "w.pvar", "w") as f:
        f.write("#CHROM\tPOS\tID\tREF\tALT\n")
        for v in range(M):
            f.write(f"1\t{v + 1}\tv{v}\tA\tC\n")
    res = subprocess.run(
        [ORACLE, "--pgen", "w.pgen", "--psam", "w.psam", "--pvar", "w.pvar",
         "--validate", "--out", "vv"],
        cwd=tmp_path, capture_output=True, text=True,
    )
    assert res.returncode == 0
    assert "Validating w.pgen... done." in res.stdout


def test_reader_dosages_sample_major(panel):
    """sample_maj=True transposed dosage reads (upstream pgenlib
    read_dosages_range/list sample-major layout)."""
    from plink_tpu import pgenlib

    with pgenlib.PgenReader(bytes(panel / "dp.pgen")) as r:
        n, M = r.get_raw_sample_ct(), r.get_variant_ct()
        vmaj = np.empty((M, n), np.float64)
        r.read_dosages_range(0, M, vmaj, allele_idx=0)
        smaj = np.empty((n, M), np.float64)
        r.read_dosages_range(0, M, smaj, allele_idx=0, sample_maj=True)
        np.testing.assert_array_equal(smaj, vmaj.T)
        idxs = np.array([2, 0, 3], np.uint32)
        smaj2 = np.empty((n, 3), np.float64)
        r.read_dosages_list(idxs, smaj2, allele_idx=0, sample_maj=True)
        np.testing.assert_array_equal(smaj2, vmaj[idxs].T)

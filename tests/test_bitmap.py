"""plink2_bitmap codec (format ref: 2.0/include/plink2_bitmap.h:20-36):
header layout, all four row record types, difflist caps, roundtrips."""

import numpy as np
import pytest


@pytest.mark.parametrize("col_ct", [5, 64, 1000, 4097])
def test_bitmap_roundtrip(tmp_path, col_ct):
    from plink_tpu.io.bitmap import BitmapReader, BitmapWriter

    rng = np.random.default_rng(col_ct)
    rows = []
    # dense random rows (direct), sparse rows (type 2), near-full rows
    # (type 3), and small perturbations of a prior row (type 1)
    rows.append(rng.random(col_ct) < 0.5)
    sparse = np.zeros(col_ct, bool)
    sparse[rng.integers(0, col_ct, max(1, col_ct // 40))] = True
    rows.append(sparse)
    rows.append(~sparse)
    pert = rows[0].copy()
    pert[rng.integers(0, col_ct, max(1, col_ct // 60))] ^= True
    rows.append(pert)
    pert2 = pert.copy()
    pert2[0] ^= True
    rows.append(pert2)  # chained prevdiff
    rows.append(np.zeros(col_ct, bool))
    rows.append(np.ones(col_ct, bool))
    path = str(tmp_path / f"b{col_ct}.bitmap")
    with BitmapWriter(path, len(rows), col_ct) as w:
        for r in rows:
            w.append(r)
    rd = BitmapReader(path)
    assert rd.row_ct == len(rows) and rd.col_ct == col_ct
    for i, r in enumerate(rows):
        assert np.array_equal(rd.read(i), r), i
    # header spec: magic + dims
    raw = open(path, "rb").read(11)
    assert raw[:2] == b"\x6c\x1c"
    import struct

    rr, cc = struct.unpack_from("<II", raw, 2)
    assert (rr, cc) == (len(rows), col_ct)


def test_bitmap_encodings_used(tmp_path):
    from plink_tpu.io.bitmap import BitmapReader, BitmapWriter

    col_ct = 2000
    rng = np.random.default_rng(0)
    dense = rng.random(col_ct) < 0.5
    sparse = np.zeros(col_ct, bool)
    sparse[:10] = True
    pert = dense.copy()
    pert[5] ^= True
    path = str(tmp_path / "enc.bitmap")
    with BitmapWriter(path, 4, col_ct) as w:
        w.append(dense)   # direct
        w.append(pert)    # prevdiff
        w.append(sparse)  # base-0 difflist
        w.append(~sparse)  # base-1 difflist
    rd = BitmapReader(path)
    assert list(rd._rrtypes) == [0, 1, 2, 3]
    for i, r in enumerate((dense, pert, sparse, ~sparse)):
        assert np.array_equal(rd.read(i), r)

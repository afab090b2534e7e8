"""Compressed-bitmap file support (.pgb-style sidecars).

Format reference: 2.0/include/plink2_bitmap.{h,cc} —
  magic 0x6c 0x1c, row_ct/col_ct little-endian uint32s, one byte giving
  the per-row record-length width (1..4), .pgen-style 2^16-row blocks:
  a uint64 file offset per block, then per block an alternation of 2-bit
  row record types and fixed-width row record lengths.
Row record types: 0 = direct bit storage, 1 = difference-from-base-row
difflist (base = most recent non-type-1 row), 2 = difflist with base
value 0, 3 = difflist with base value 1.  Difflists use the pgen group
encoding (vint31 length, 64-entry groups, fixed-width leaders + delta
varints) without a genovals track, capped at col_ct/16 entries
(kPglMaxBitmapDifflistLenDivisor).
"""

from __future__ import annotations

import struct

import numpy as np

from .varint import decode_difflist, encode_difflist

_MAGIC = b"\x6c\x1c"
_RBLOCK = 65536
_DIFFLIST_DIVISOR = 16


def _bytes_for(n: int) -> int:
    return max(1, (int(n).bit_length() + 7) // 8)


class BitmapWriter:
    """Streaming row-major bitmap writer (role of BitmapWriterInitPhase*/
    BwAppend*/BitmapWriterFinish)."""

    def __init__(self, path: str, row_ct: int, col_ct: int):
        self.path = path
        self.row_ct = row_ct
        self.col_ct = col_ct
        self._nbytes_direct = (col_ct + 7) // 8
        self._rrec_len_byte_ct = _bytes_for(self._nbytes_direct)
        self._f = open(path, "wb")
        self._f.write(_MAGIC)
        self._f.write(struct.pack("<II", row_ct, col_ct))
        self._f.write(bytes([self._rrec_len_byte_ct]))
        rblock_ct = -(-row_ct // _RBLOCK)
        self._header_bytes = (rblock_ct * 8
                              + row_ct * self._rrec_len_byte_ct
                              + -(-row_ct // 4))
        self._f.write(bytes(self._header_bytes))
        self._fpos = 11 + self._header_bytes
        self._rblock_fpos: list[int] = []
        self._rrtypes: list[int] = []
        self._rrec_lens: list[int] = []
        self._base: np.ndarray | None = None
        self._ridx = 0

    def append(self, row: np.ndarray) -> None:
        """row: [col_ct] bool/0-1 array."""
        row = np.asarray(row, bool)
        assert row.size == self.col_ct
        if self._ridx % _RBLOCK == 0:
            self._rblock_fpos.append(self._fpos)
        max_dl = self.col_ct // _DIFFLIST_DIVISOR
        ones = np.flatnonzero(row).astype(np.uint32)
        zeros_ct = self.col_ct - ones.size
        candidates: list[tuple[int, int, bytes]] = []
        direct = np.packbits(row, bitorder="little").tobytes()
        candidates.append((len(direct), 0, direct))
        if ones.size <= max_dl:
            body = encode_difflist(ones, None, self.col_ct)
            candidates.append((len(body), 2, body))
        if zeros_ct <= max_dl:
            zid = np.flatnonzero(~row).astype(np.uint32)
            body = encode_difflist(zid, None, self.col_ct)
            candidates.append((len(body), 3, body))
        if self._base is not None:
            diff = np.flatnonzero(row != self._base).astype(np.uint32)
            if diff.size <= max_dl:
                body = encode_difflist(diff, None, self.col_ct)
                candidates.append((len(body), 1, body))
        ln, rrtype, body = min(candidates, key=lambda t: (t[0], t[1]))
        if rrtype != 1:
            self._base = row.copy()
        self._f.write(body)
        self._fpos += len(body)
        self._rrtypes.append(rrtype)
        self._rrec_lens.append(len(body))
        self._ridx += 1

    def close(self) -> None:
        assert self._ridx == self.row_ct
        f = self._f
        f.seek(11)
        for fp in self._rblock_fpos:
            f.write(struct.pack("<Q", fp))
        w = self._rrec_len_byte_ct
        for b0 in range(0, self.row_ct, _RBLOCK):
            b1 = min(b0 + _RBLOCK, self.row_ct)
            # 2-bit rrtypes, low bits first
            packed = bytearray(-(-(b1 - b0) // 4))
            for k in range(b0, b1):
                packed[(k - b0) // 4] |= self._rrtypes[k] << (2 * ((k - b0) % 4))
            f.write(bytes(packed))
            for k in range(b0, b1):
                f.write(int(self._rrec_lens[k]).to_bytes(w, "little"))
        f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if not exc[0]:
            self.close()
        else:
            self._f.close()


class BitmapReader:
    """Random-access bitmap reader (role of BitmapReaderInitPhase*/
    BrGet)."""

    def __init__(self, path: str):
        self._buf = np.fromfile(path, np.uint8)
        raw = self._buf.tobytes()
        if raw[:2] != _MAGIC:
            raise ValueError(f"{path}: not a bitmap file (bad magic)")
        self.row_ct, self.col_ct = struct.unpack_from("<II", raw, 2)
        w = raw[10]
        rblock_ct = -(-self.row_ct // _RBLOCK)
        off = 11
        fpos = struct.unpack_from(f"<{rblock_ct}Q", raw, off)
        off += rblock_ct * 8
        self._rrtypes = np.empty(self.row_ct, np.uint8)
        lens = np.empty(self.row_ct, np.int64)
        for bi in range(rblock_ct):
            b0 = bi * _RBLOCK
            b1 = min(b0 + _RBLOCK, self.row_ct)
            nb = -(-(b1 - b0) // 4)
            packed = self._buf[off : off + nb]
            off += nb
            for shift in range(4):
                sel = np.arange(b0 + shift, b1, 4)
                self._rrtypes[sel] = (
                    packed[: (sel.size)] >> (2 * shift)) & 3
            lraw = self._buf[off : off + (b1 - b0) * w]
            off += (b1 - b0) * w
            lv = np.zeros(b1 - b0, np.int64)
            for k in range(w):
                lv |= lraw[k::w].astype(np.int64) << (8 * k)
            lens[b0:b1] = lv
        self._offsets = np.empty(self.row_ct + 1, np.int64)
        for bi in range(rblock_ct):
            b0 = bi * _RBLOCK
            b1 = min(b0 + _RBLOCK, self.row_ct)
            self._offsets[b0] = fpos[bi]
            self._offsets[b0 + 1 : b1 + 1] = fpos[bi] + np.cumsum(lens[b0:b1])

    def read(self, ridx: int) -> np.ndarray:
        """Returns row ridx as a bool [col_ct] array."""
        rrtype = int(self._rrtypes[ridx])
        if rrtype == 1:
            # base = most recent non-prevdiff row
            base_idx = ridx - 1
            while self._rrtypes[base_idx] == 1:
                base_idx -= 1
            row = self.read(base_idx)
            for k in range(base_idx + 1, ridx + 1):
                ids, _, _ = decode_difflist(
                    self._buf, int(self._offsets[k]), self.col_ct, False)
                row[ids] = ~row[ids]
            return row
        off = int(self._offsets[ridx])
        if rrtype == 0:
            nb = (self.col_ct + 7) // 8
            return np.unpackbits(
                self._buf[off : off + nb], bitorder="little"
            )[: self.col_ct].astype(bool)
        ids, _, _ = decode_difflist(self._buf, off, self.col_ct, False)
        row = np.full(self.col_ct, rrtype == 3, bool)
        row[ids] = rrtype == 2
        return row

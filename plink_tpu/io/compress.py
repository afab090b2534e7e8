"""Compressed stream helpers: zstd report writers, multithreaded BGZF.

Role of the reference's compressed-output layer (CompressStreamState,
2.0/plink2_compress_stream.h:39; mt BGZF, 2.0/include/plink2_bgzf.h:68-80):
report writers gain 'zs' (.zst) variants, VCF export gains 'bgz', and any
text input may be plain, gzip/BGZF, or zstd.
"""

from __future__ import annotations

import concurrent.futures as _fut
import gzip
import io
import os
import struct
import zlib


def open_text_auto(path: str):
    """Open a text file that may be plain, gzip/BGZF, or zstd."""
    with open(path, "rb") as probe:
        magic = probe.read(4)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(path, "rt")
    if magic == b"\x28\xb5\x2f\xfd":
        import zstandard

        fh = open(path, "rb")
        reader = zstandard.ZstdDecompressor().stream_reader(fh)
        return io.TextIOWrapper(reader)
    return open(path, "rt")


def open_out(path: str, zs: bool = False):
    """Text output handle; zs=True writes zstd frames to <path>.zst."""
    if not zs:
        return open(path, "w"), path
    import zstandard

    zpath = path + ".zst"
    fh = open(zpath, "wb")
    writer = zstandard.ZstdCompressor(level=3).stream_writer(fh)
    return io.TextIOWrapper(writer, write_through=True), zpath


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_BGZF_BLOCK = 0xFF00  # uncompressed payload bytes per block


def _bgzf_block(payload: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    data = co.compress(payload) + co.flush()
    bsize = len(data) + 25 + 1  # header(12) + XLEN extra(6) + data + crc/isize(8)
    header = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)
        + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1)
    )
    return (header + data
            + struct.pack("<I", zlib.crc32(payload))
            + struct.pack("<I", len(payload) & 0xFFFFFFFF))


class BgzfWriter:
    """Multithreaded BGZF writer: 64KB blocks deflate in a thread pool while
    the caller keeps formatting (plink2_bgzf.cc:573 compressor+writer
    threads)."""

    def __init__(self, path: str, threads: int | None = None):
        self._f = open(path, "wb")
        self._buf = bytearray()
        self._pool = _fut.ThreadPoolExecutor(
            max_workers=threads or min(4, os.cpu_count() or 1)
        )
        self._pending: list = []

    def write(self, data):
        if isinstance(data, str):
            data = data.encode()
        self._buf += data
        while len(self._buf) >= _BGZF_BLOCK:
            chunk = bytes(self._buf[:_BGZF_BLOCK])
            del self._buf[:_BGZF_BLOCK]
            self._pending.append(self._pool.submit(_bgzf_block, chunk))
            if len(self._pending) >= 16:
                self._drain(8)

    def _drain(self, keep: int = 0):
        while len(self._pending) > keep:
            self._f.write(self._pending.pop(0).result())

    def close(self):
        if self._buf:
            self._pending.append(
                self._pool.submit(_bgzf_block, bytes(self._buf))
            )
            self._buf = bytearray()
        self._drain(0)
        self._f.write(_BGZF_EOF)
        self._f.close()
        self._pool.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def zst_decompress(path: str, out: str | None) -> int:
    """--zst-decompress fast path (ref: plink2.cc:3504-3526)."""
    import sys

    import zstandard

    dctx = zstandard.ZstdDecompressor()
    dst = open(out, "wb") if out else sys.stdout.buffer
    try:
        with open(path, "rb") as src:
            dctx.copy_stream(src, dst)
    finally:
        if out:
            dst.close()
    return 0

"""Standalone pgen_compress utility (ref: 2.0/pgen_compress.cc).

Usage:
  python -m plink_tpu.pgen_compress <input .bed or .pgen> <output> [sample_ct]
      * sample_ct is required when loading a .bed file
  python -m plink_tpu.pgen_compress -u <input .pgen> <output .bed>

Compress mode re-encodes any readable genotype file (PLINK1 .bed or any
pgen storage mode) as a standard variable-width .pgen; -u decompresses a
.pgen back to .bed.  The -i separate-index mode of the reference binary
(.pgen.pgi sidecar) is not implemented.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if args and args[0] == "-i":
        sys.stderr.write(
            "pgen_compress: -i (separate index) is not implemented.\n")
        return 2
    decompress = bool(args) and args[0] == "-u"
    if decompress:
        args = args[1:]
    if len(args) < 2 or len(args) > 3:
        sys.stdout.write(
            "Usage:\n"
            "pgen_compress <input .bed or .pgen> <output filename> "
            "[sample_ct]\n"
            "  * sample_ct is required when loading a .bed file\n"
            "pgen_compress -u <input .pgen> <output .bed>\n"
        )
        return 2
    in_path, out_path = args[0], args[1]
    sample_ct = int(args[2]) if len(args) == 3 else None

    from .io.pgen_read import PgenReader
    from .io.pgen_write import PgenWriter, write_bed

    reader = PgenReader(in_path, sample_ct=sample_ct)
    M, N = reader.variant_ct, reader.sample_ct
    if decompress:
        packed = reader.read_packed(0, M)
        write_bed(out_path, packed, N)
        sys.stderr.write(f"{M} variants x {N} samples written to "
                         f"{out_path} (.bed).\n")
        return 0
    with PgenWriter(out_path, N, M) as w:
        block = 4096
        from .ops.pairwise import _unpack_np

        for v0 in range(0, M, block):
            vct = min(block, M - v0)
            codes = _unpack_np(reader.read_packed(v0, vct))[:, :N]
            w.append_codes(codes)
    sys.stderr.write(f"{M} variants x {N} samples written to "
                     f"{out_path} (.pgen).\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

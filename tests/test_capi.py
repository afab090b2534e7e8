"""C FFI API (pgen_capi_*) tests: decode parity with the Python reader.

The C API (native/pgen_decode.cc, role of the reference's
pgenlib_ffi_support.cc + 2.0/pgenlibr/src/pgenlibr.cpp) is what the R
package under bindings/pgenlibr wraps; these tests drive it through
ctypes against the differential-tested Python reader on every storage
mode the writer produces.
"""

import ctypes
import os

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def _lib():
    from plink_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    lib.pgen_capi_open.restype = ctypes.c_void_p
    lib.pgen_capi_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                   ctypes.POINTER(ctypes.c_int)]
    lib.pgen_capi_close.argtypes = [ctypes.c_void_p]
    lib.pgen_capi_variant_ct.restype = ctypes.c_uint32
    lib.pgen_capi_variant_ct.argtypes = [ctypes.c_void_p]
    lib.pgen_capi_sample_ct.restype = ctypes.c_uint32
    lib.pgen_capi_sample_ct.argtypes = [ctypes.c_void_p]
    lib.pgen_capi_read_codes.restype = ctypes.c_int
    lib.pgen_capi_read_codes.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
        ctypes.c_int]
    return lib


def _codes_via_capi(path, sample_ct_hint=0):
    lib = _lib()
    err = ctypes.c_int(0)
    h = lib.pgen_capi_open(path.encode(), sample_ct_hint, ctypes.byref(err))
    assert h, f"open failed err={err.value}"
    try:
        M = lib.pgen_capi_variant_ct(h)
        N = lib.pgen_capi_sample_ct(h)
        out = np.empty((M, N), np.uint8)
        rc = lib.pgen_capi_read_codes(
            h, 0, M, out.ctypes.data_as(ctypes.c_void_p), 4)
        assert rc == 0, f"read rc={rc}"
        # also spot-check a mid-file range read (LD-chain rewind path)
        if M > 8:
            sub = np.empty((3, N), np.uint8)
            rc = lib.pgen_capi_read_codes(
                h, M // 2, 3, sub.ctypes.data_as(ctypes.c_void_p), 1)
            assert rc == 0
            np.testing.assert_array_equal(sub, out[M // 2 : M // 2 + 3])
        return out
    finally:
        lib.pgen_capi_close(h)


def _codes_via_python(prefix):
    from plink_tpu.dataset import load_dataset
    from plink_tpu.ops.pairwise import _unpack_np

    ds = load_dataset(prefix)
    pk = ds.all_packed()
    return _unpack_np(pk)[:, : ds.raw_sample_ct]


def test_capi_mode10(tmp_path):
    """Compressed mode-0x10 .pgen written by our writer."""
    from plink_tpu.cli import main

    pfx = str(tmp_path / "p")
    assert main(["--dummy", "97", "300", "0.07", "--seed", "5",
                 "--out", pfx, "--silent"]) == 0
    # force a compressed rewrite (difflist/LD records)
    assert main(["--pfile", pfx, "--make-pgen", "--out", pfx + "c",
                 "--silent"]) == 0
    got = _codes_via_capi(pfx + "c.pgen")
    want = _codes_via_python(pfx + "c")
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="no plink2 oracle")
def test_capi_oracle_pgen(tmp_path):
    """plink2-written compressed .pgen."""
    import subprocess

    pfx = str(tmp_path / "q")
    subprocess.run([ORACLE, "--dummy", "150", "500", "0.05", "--seed", "6",
                    "--out", pfx], check=True, capture_output=True)
    got = _codes_via_capi(pfx + ".pgen")
    want = _codes_via_python(pfx)
    np.testing.assert_array_equal(got, want)


def test_capi_bed(tmp_path):
    """PLINK1 .bed via sample-count hint."""
    from plink_tpu.cli import main

    pfx = str(tmp_path / "b")
    assert main(["--dummy", "61", "120", "0.05", "--seed", "7",
                 "--out", pfx, "--silent"]) == 0
    assert main(["--pfile", pfx, "--make-bed", "--out", pfx,
                 "--silent"]) == 0
    got = _codes_via_capi(pfx + ".bed", sample_ct_hint=61)
    want = _codes_via_python(pfx)
    np.testing.assert_array_equal(got, want)

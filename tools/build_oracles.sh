#!/bin/bash
# Build the three oracle binaries the differential test suite diffs against:
#   /tmp/oracle/2.0/build_dynamic/plink2        (NOLAPACK plink2)
#   /tmp/oracle_lapack/2.0/build_dynamic/plink2 (LAPACK plink2: --pca, --glm ...)
#   /tmp/oracle19/plink                         (plink 1.9)
# Sources come from the read-only reference checkout; nothing is modified
# in place.  Idempotent: existing binaries are kept unless -f is passed.
#
# Usage: bash tools/build_oracles.sh [-f]
set -u
REF=${REF:-/root/reference}
SHIM="$(cd "$(dirname "$0")/oracle_shim" && pwd)"
LIBDIR=/usr/lib/x86_64-linux-gnu
LAPACK_LIBS="$LIBDIR/liblapack.so.3 $LIBDIR/libblas.so.3"
FORCE=${1:-}

build20() {  # $1 = dest root, $2 = "nolapack" | "lapack"
  local dst=$1 mode=$2
  local bin="$dst/2.0/build_dynamic/plink2"
  if [ -x "$bin" ] && [ "$FORCE" != "-f" ]; then
    echo "[skip] $bin exists"
    return 0
  fi
  rm -rf "$dst"
  mkdir -p "$dst"
  cp -r "$REF/2.0" "$dst/2.0"
  chmod -R u+w "$dst/2.0"
  local mk="$dst/2.0/build_dynamic/Makefile"
  # Enable AVX2/SSE42 (this image's CPU has both).
  sed -i 's/^NO_AVX2 = 1/NO_AVX2 =/; s/^NO_SSE42 = 1/NO_SSE42 =/' "$mk"
  if [ "$mode" = nolapack ]; then
    sed -i 's/^NO_LAPACK =$/NO_LAPACK = 1/' "$mk"
    # NOLAPACK branch of plink2_matrix.h uses fabs() without including math.h.
    sed -i 's|#include "include/plink2_base.h"|#include <math.h>\n#include "include/plink2_base.h"|' \
        "$dst/2.0/plink2_matrix.h"
  else
    # No -dev BLAS/LAPACK packages on this image: link the .so.3 files
    # directly and pick up cblas.h/lapacke.h from the shim dir.
    sed -i "s|^BLASFLAGS=-llapacke.*|BLASFLAGS=$LAPACK_LIBS|" "$mk"
    sed -i "s|^  CXXFLAGS = -std=c++17|  CXXFLAGS = -std=c++17 -I$SHIM|" "$mk"
  fi
  # Note: the plink2 target is literally named plink2$(SFX) with SFX ?= ""
  # (two quote chars), so "make plink2" does not resolve; build the default
  # "all" target (plink2 + pgen_compress).
  ( cd "$dst/2.0/build_dynamic" && make -j"$(nproc)" ) \
      > "$dst/build.log" 2>&1
  if [ ! -x "$bin" ]; then
    echo "[FAIL] $mode plink2 build failed; tail of $dst/build.log:"
    tail -40 "$dst/build.log"
    return 1
  fi
  echo "[ok] $bin"
}

build19() {
  local dst=/tmp/oracle19
  local bin="$dst/plink"
  if [ -x "$bin" ] && [ "$FORCE" != "-f" ]; then
    echo "[skip] $bin exists"
    return 0
  fi
  rm -rf "$dst"
  mkdir -p "$dst"
  cp -r "$REF/1.9/." "$dst/"
  chmod -R u+w "$dst"
  # System zlib (>=1.2.4 required; image has 1.3) + direct .so.3 BLAS link +
  # cblas.h from the shim dir.  CFLAGS on the make command line overrides the
  # Makefile's +=, so -DSTABLE_BUILD must be repeated here.
  # -DNDEBUG matters: upstream release builds disable asserts, and e.g.
  # --homozyg group calls clear_bits() with len==0 (plink_common.c:3461),
  # which is harmless in release but SIGABRTs in an assert-enabled build.
  local flags="-Wall -O2 -g -DNDEBUG -I$REF/2.0/simde -I$SHIM -DSTABLE_BUILD -DDYNAMIC_ZLIB"
  ( cd "$dst" && make -j"$(nproc)" plink \
        CFLAGS="$flags" CXXFLAGS="$flags" \
        BLASFLAGS="$LAPACK_LIBS" ZLIB="-lz" ) > "$dst/build.log" 2>&1
  if [ ! -x "$bin" ]; then
    echo "[FAIL] plink 1.9 build failed; tail of $dst/build.log:"
    tail -40 "$dst/build.log"
    return 1
  fi
  echo "[ok] $bin"
}

rc=0
build20 /tmp/oracle nolapack || rc=1
build20 /tmp/oracle_lapack lapack || rc=1
build19dev() {
  # non-STABLE build: unlocks UNSTABLE-gated commands (--unrelated-heritability)
  local dst=/tmp/oracle19dev
  local bin="$dst/plink"
  if [ -x "$bin" ] && [ "$FORCE" != "-f" ]; then
    echo "[skip] $bin exists"
    return 0
  fi
  rm -rf "$dst"
  mkdir -p "$dst"
  cp -r "$REF/1.9/." "$dst/"
  chmod -R u+w "$dst"
  local flags="-Wall -O2 -g -I$REF/2.0/simde -I$SHIM -DDYNAMIC_ZLIB"
  ( cd "$dst" && make -j"$(nproc)" plink \
        CFLAGS="$flags" CXXFLAGS="$flags" \
        BLASFLAGS="$LAPACK_LIBS" ZLIB="-lz" ) > "$dst/build.log" 2>&1
  if [ ! -x "$bin" ]; then
    echo "[FAIL] plink 1.9 dev build failed; tail of $dst/build.log:"
    tail -40 "$dst/build.log"
    return 1
  fi
  echo "[ok] $bin"
}

build19 || rc=1
build19dev || rc=1
exit $rc

#!/bin/sh
# Assemble + build the R pgenlibr package (requires R on the machine; the
# CI image here has none, so the package is validated at the C-API level
# by tests/test_capi.py instead).
set -e
cd "$(dirname "$0")/.."
cp plink_tpu/native/pgen_decode.cc bindings/pgenlibr/src/
R CMD build bindings/pgenlibr
R CMD INSTALL pgenlibr_*.tar.gz

"""plink_tpu: a TPU-native statistical-genetics engine.

A from-scratch reimplementation of the capabilities of PLINK 1.9/2.0
(chrchang/plink-ng) designed for TPU hardware: genotype matrices are held as
2-bit-packed arrays that decode on-device into one-hot "planes", and every
popcount-style statistic of the reference (allele frequencies, missingness,
Hardy-Weinberg counts, KING-robust kinship, GRM, windowed r^2) becomes a
plane x plane matmul or reduction on the MXU.  Host-side I/O speaks the
reference's file formats (.pgen/.pvar/.psam/.bed/.bim/.fam and friends).

Layering (mirrors SURVEY.md section 1, re-architected for TPU):
  io/        .pgen codec, text-format parsers/writers        (ref: 2.0/include/pgenlib_*)
  ops/       device kernels: plane decode, Gram matmuls      (ref: plink2_bits/simd -> MXU)
  stats/     distribution functions, exact tests             (ref: 2.0/include/plink2_stats)
  models/    GLM linear/logistic/Firth, PCA                  (ref: plink2_glm*, matrix_calc)
  parallel/  device mesh + sharding policy                   (ref: plink2_thread -> pjit)
  commands/  per-command drivers producing report files      (ref: plink2_*.cc modules)
  cli.py     flag parsing -> typed config                    (ref: plink2_cmdline)
  pipeline   fixed-order command orchestration               (ref: plink2.cc Plink2Core)
"""

import os as _os

import jax as _jax

# Stats/GRM accumulators need real float64 (the reference is f64 end-to-end
# in these paths); kernels opt in to narrow dtypes explicitly everywhere.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first-compile latency on remote-attached
# TPUs is tens of seconds per kernel; cache survives across CLI invocations.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # per-platform cache dirs: the remote-TPU path compiles on a different
    # machine than local CPU runs, and mixing their AOT artifacts trips
    # machine-feature mismatches
    _plat = _os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
    _cache = _os.path.expanduser(f"~/.cache/plink_tpu/jaxcache-{_plat}")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

__version__ = "0.1.0"

"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Belt and suspenders: a pytest plugin may have imported jax before this
# conftest ran, in which case the env var above was read too late.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_codes(rng, variant_ct, sample_ct, missing_rate=0.1, maf_lo=0.0, maf_hi=0.5):
    """Random genotype code matrix [V, N] in pgen encoding (0/1/2=dosage, 3=missing)."""
    mafs = rng.uniform(maf_lo, maf_hi, size=(variant_ct, 1))
    g = (rng.random((variant_ct, sample_ct)) < mafs).astype(np.uint8) + (
        rng.random((variant_ct, sample_ct)) < mafs
    ).astype(np.uint8)
    miss = rng.random((variant_ct, sample_ct)) < missing_rate
    g[miss] = 3
    return g


@pytest.fixture
def geno_factory(rng):
    return lambda V, N, **kw: random_codes(rng, V, N, **kw)

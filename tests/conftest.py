"""Test environment: CPU JAX with 8 virtual devices and x64 enabled.

The reference's accuracy bars (1e-12 sparse / 1e-10 dense,
/root/reference/test/runtests.jl:25-26) require float64, and multi-chip
sharding tests run on a simulated CPU mesh (SURVEY.md §4 CI analogue).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may have been imported already by a sitecustomize hook with the TPU
# platform env; the config route still wins as long as no backend has been
# initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: repeated test shapes compile once across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_sparse_lu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # Seeded like the reference suite (MersenneTwister(47), runtests.jl:35)
    return np.random.default_rng(47)

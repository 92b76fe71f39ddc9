"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md section 4,
"multi-node without a real cluster").

jax may already be imported by the environment's sitecustomize, so setting
JAX_PLATFORMS in os.environ is not enough — we also force the platform via
jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fast tier's wall time is dominated by
# XLA-CPU compiles of interpret-mode Pallas kernels (the single assign-
# kernel smoke test costs ~60 s of compile alone).  Caching keyed on the
# HLO hash makes repeat laps < 5 min without hiding kernel changes (any
# edit produces a different hash and recompiles).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("FDN_TEST_JAX_CACHE",
                   os.path.join(os.path.dirname(__file__), ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

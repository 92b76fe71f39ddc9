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
#
# CAVEAT (round 4): XLA:CPU cache entries embed AOT code specialized to
# the compiling host's CPU features.  This sandbox's host can CHANGE
# between rounds; loading a feature-mismatched entry is pathologically
# slow (a 38 s compile became a >9 min hang on a 120 MB stale cache) and
# XLA only warns ("machine feature +prefer-no-scatter is not supported").
# If the tier suddenly crawls, delete tests/.jax_cache or set
# FDN_TEST_JAX_CACHE=off.
_cache = os.environ.get("FDN_TEST_JAX_CACHE",
                        os.path.join(os.path.dirname(__file__),
                                     ".jax_cache"))
if _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    # Second caveat (round 4): WRITING a big interpret-mode kernel program
    # to the persistent cache hangs outright (>14 min for a program that
    # JIT-compiles in 38 s — the cache's serializable-executable path; a
    # fresh cache dir and jax_persistent_cache_enable_xla_caches="none"
    # both reproduce it).  The big programs are exactly the slow tier's,
    # so any run that does not exclude ``slow`` goes uncached.
    expr = config.getoption("markexpr") or ""
    if "not slow" not in expr and _cache != "off":
        jax.config.update("jax_compilation_cache_dir", None)

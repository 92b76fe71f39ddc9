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

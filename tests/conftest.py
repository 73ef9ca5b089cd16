"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths (Mesh/pjit/shard_map) are exercised without TPU hardware
(SURVEY.md §4 test plan).

Note: this image's sitecustomize registers the 'axon' TPU plugin and forces
the platform AFTER env vars are read, so JAX_PLATFORMS=cpu in the
environment is NOT enough — the jax.config update below is what actually
pins the tests to CPU."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after XLA_FLAGS is set)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

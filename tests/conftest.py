"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that the multi-chip sharding
paths (mesh + collectives) can be exercised hermetically, without TPU
hardware and without contending for the remote TPU tunnel.

Note: this environment pre-imports jax and pins ``JAX_PLATFORMS=axon`` in a
``sitecustomize`` hook before pytest starts, so plain env-var overrides here
are too late. Backends initialize lazily, however, so flipping the jax
config (and XLA_FLAGS, which the CPU client reads at first use) still works
as long as it happens before any backend query — which this conftest
guarantees by running at collection time before any test imports.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

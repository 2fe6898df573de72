# -*- coding: utf-8 -*-
"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference test suite is float64 on CPU; we match it for parity tests
(``jax_enable_x64``) and give every test session 8 virtual CPU devices so the
multi-chip sharding paths (chain- and data-parallel) are exercised without TPU
hardware. NOTE: ``jax.config.update`` is required (not just the env var)
because the environment pins ``JAX_PLATFORMS=axon``.
"""

import os

# Must be set before the XLA backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test configuration: CPU backend with 8 virtual devices + float64.

Set BEFORE jax import (SURVEY.md §4): sharding correctness is validated on
8 fake CPU devices (no pod needed), and float64 enables exact-trajectory
parity against the NumPy oracle.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

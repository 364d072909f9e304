"""Test configuration: CPU backend with 8 virtual devices + float64.

Set BEFORE jax import (SURVEY.md §4): sharding correctness is validated on
8 fake CPU devices (no pod needed), and float64 enables exact-trajectory
parity against the NumPy oracle.
"""

import os

# FORCE the CPU backend: the ambient environment may pin JAX_PLATFORMS to
# a real accelerator (e.g. a tunneled TPU), which must never serve the
# test suite — sharding tests need 8 virtual CPU devices and parity needs
# float64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the tunneled TPU (axon) backend in
# every interpreter and rewrites jax_platforms to "axon,cpu", ignoring
# the env var — override the *config* after import so the suite really
# runs on the CPU backend with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles dozens of solver
# variants; on this 1-core host each compile costs tens of seconds, so
# cache across runs (first run is slow, reruns are minutes).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

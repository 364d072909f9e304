"""Tracing / profiling utilities (SURVEY.md §5).

The reference records wall-clock plus per-iteration arrays; the TPU-native
equivalents here are:

  * ``trace(...)`` — context manager around ``jax.profiler`` writing an
    XProf/TensorBoard trace of the jitted solve;
  * ``roofline_report(...)`` — measured matvec bandwidth per chip vs the
    HBM roofline (the BASELINE.json "matvec GB/s per chip" metric);
  * per-iteration diagnostics are already device-side arrays in the
    result pytree (capability C5), so no separate tracer is needed.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "roofline_report", "device_memory_stats",
           "time_blocking"]

# Advertised HBM bandwidth per chip for known TPU generations (GB/s).
_HBM_ROOFLINE_GBPS = {
    "v4": 1200.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fasta_tpu_trace"):
    """Profile a block into an XProf/TensorBoard trace directory."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_blocking(fn, *args, repeats: int = 3, warmup: int = 1,
                  subtract_barrier: bool = True) -> float:
    """Best wall time of ``fn(*args)`` with a HOST-READBACK completion
    barrier: a scalar reduced from the output is fetched to the host
    each repetition.  On remote/tunneled backends ``block_until_ready``
    returns at dispatch time, which silently produces impossible timings
    — always time through this helper.

    The barrier itself costs one tunnel round trip (measured 1–28 ms
    depending on the day — docs/PERF.md methodology); by default its
    cost is measured on the warm result (a FRESH ``jnp.sum`` each
    probe) and subtracted, so the returned wall is compute, not network
    latency."""
    import jax.numpy as jnp

    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf, float(jnp.real(jnp.sum(leaf)))

    leaf = None
    for _ in range(max(warmup, 1)):
        leaf, _ = run()
    barrier = 0.0
    if subtract_barrier:
        barrier = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.real(jnp.sum(leaf)))
            barrier = min(barrier, time.perf_counter() - t0)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return max(best - barrier, 1e-12)


def _chip_roofline() -> Optional[float]:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, bw in _HBM_ROOFLINE_GBPS.items():
        if key in kind:
            return bw
    return None


def roofline_report(bytes_per_call: int, fn, *args, repeats: int = 5,
                    warmup: int = 1) -> dict:
    """Time ``fn(*args)`` (host-readback barriered) and report achieved
    GB/s vs the chip's HBM roofline."""
    best = time_blocking(fn, *args, repeats=repeats, warmup=warmup)
    gbps = bytes_per_call / best / 1e9
    roof = _chip_roofline()
    return {
        "seconds": best,
        "achieved_GBps": gbps,
        "roofline_GBps": roof,
        "fraction_of_roofline": (gbps / roof) if roof else None,
        "device_kind": jax.devices()[0].device_kind,
    }


def device_memory_stats() -> dict:
    """Per-device memory statistics where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out

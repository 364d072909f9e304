"""Smoke tests for the tracing/profiling utilities (SURVEY.md §5) —
CPU-backend coverage of the API surface; rates themselves are a
hardware concern."""

import jax
import jax.numpy as jnp

from fasta_tpu import profiling


def test_time_blocking_positive_and_barrier_subtracted():
    fn = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    t = profiling.time_blocking(fn, x, repeats=2)
    assert t > 0
    t_raw = profiling.time_blocking(fn, x, repeats=2,
                                    subtract_barrier=False)
    assert t_raw >= t * 0.5  # raw includes the barrier; both positive


def test_roofline_report_fields():
    fn = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    rep = profiling.roofline_report(64 * 64 * 8 * 2, fn, x, repeats=2)
    assert rep["seconds"] > 0 and rep["achieved_GBps"] > 0
    assert "device_kind" in rep


def test_trace_context_manager(tmp_path):
    logdir = str(tmp_path / "trace")
    fn = jax.jit(lambda x: jnp.sum(x * x))
    with profiling.trace(logdir) as d:
        float(fn(jnp.ones(128)))
    assert d == logdir


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())

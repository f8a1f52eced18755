"""Profiling helpers (SURVEY.md §5: the TPU equivalent of the reference's
ticks/s meter plus proper tracing).

The reference's only profiling is the printed ticks/s with REALTIME
commented out (`pi_sph_fluid.c:10,680-687`).  Here:

* ``trace(path)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of whatever runs inside;
* ``throughput(fn, state, *args)`` — wall-clock particle-steps/s of a
  compiled multi-step, warmed and block_until_ready'd correctly (the only
  honest way to time dispatches through the async runtime);
* ``device_memory()`` — live/peak HBM usage where the backend reports it.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "throughput", "device_memory"]


@contextlib.contextmanager
def trace(path: str = "/tmp/sph_trace"):
    """Capture a device trace viewable in TensorBoard or Perfetto."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def throughput(multi_step, sim, g_trace, n_particles: int, repeats: int = 3):
    """Median particle-steps/s of ``multi_step(sim, g_trace)``.

    Compiles/warms on the first call, then times ``repeats`` dispatches.
    Returns (particle_steps_per_s, seconds_per_step).
    """
    steps = g_trace.shape[0]
    sim, _ = multi_step(sim, g_trace)
    jax.block_until_ready(jax.tree_util.tree_leaves(sim)[0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sim, _ = multi_step(sim, g_trace)
        jax.block_until_ready(jax.tree_util.tree_leaves(sim)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]
    return n_particles * steps / t, t / steps


def device_memory() -> dict:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out

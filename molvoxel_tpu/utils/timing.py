"""Deferred-execution-safe device timing helpers.

The axon TPU tunnel (and async dispatch in general) makes naive timing loops
lie: ``block_until_ready`` can return before device work completes, and
repeated identical calls may never execute at all.  ``measure_device_fn``
implements the pattern bench.py uses (documented there): run N iterations
inside one jitted ``lax.fori_loop`` whose iterations consume fresh PRNG keys
and fold into a scalar that is fetched to host, then subtract a 1-iteration
dispatch baseline.
"""

from __future__ import annotations

import functools
import os
import time
from collections.abc import Callable


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (first TPU compile through
    the remote tunnel can take minutes; cached recompiles are instant)."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser("~/.molvoxel_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def measure_device_fn(
    step: Callable,
    *,
    iters: int = 33,
    repeats: int = 3,
    key=None,
) -> float:
    """Seconds per call of ``step(key) -> array`` with real device execution.

    ``step`` must be jit-traceable; it is called with a fresh fold_in'd key
    every iteration so no two iterations can be deduplicated.

    Caution: the loop consumes ``step``'s output with a full sum.  If the
    output is produced by foldable XLA ops (matmuls, elementwise), XLA may
    collapse the computation into the sum without materializing the result —
    pass ``materialize=True`` to the voxelize ops (or fence with
    ``jax.lax.optimization_barrier`` inside ``step``) when the measurement
    must include producing the array (CLAUDE.md "benchmark-consumer trap").
    """
    import jax
    import jax.numpy as jnp

    if key is None:
        key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(k, n):
        def body(i, acc):
            out = step(jax.random.fold_in(k, i))
            return acc + jnp.sum(out) * 1e-6

        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(key, n))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(repeats))
    best = min(run(iters) for _ in range(repeats))
    return (best - base) / (iters - 1)


def trace(path: str = "/tmp/molvoxel_tpu_trace"):
    """Context manager: capture a jax.profiler trace viewable in Perfetto/XProf."""
    import jax

    class _Trace:
        def __enter__(self):
            jax.profiler.start_trace(path)
            return path

        def __exit__(self, *exc):
            jax.profiler.stop_trace()
            return False

    return _Trace()

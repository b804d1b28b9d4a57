"""Probe: VMEM->HBM output bandwidth of pallas out blocks vs XLA writes.

Run: timeout 580 python benchmarks/experiments/write_bw_probe.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from molvoxel_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache(".jax_cache")

B, CP, DL, HW = 64, 8, 64, 4096  # 8MB per b -> 512MB total


def measure(step, iters=17):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(k, n):
        def body(i, acc):
            out = step(jax.random.fold_in(k, i))
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)
    def run(n):
        t0 = time.time(); float(loop(jax.random.PRNGKey(7), n)); return time.time() - t0
    run(1); run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    return (best - base) / (iters - 1)


def pallas_write(db, hwb, semantics=None):
    """Kernel writes scalar into out blocks of (1, CP, db, hwb)."""
    nd, nh = DL // db, HW // hwb
    def kernel(s_ref, o_ref):
        o_ref[0] = jnp.full((CP, db, hwb), s_ref[0], jnp.float32)
    def step(key):
        s = jax.random.uniform(key, (1,))
        params = {}
        if semantics:
            params["compiler_params"] = pltpu.CompilerParams(dimension_semantics=semantics)
        out = pl.pallas_call(
            kernel,
            grid=(B, nd, nh),
            in_specs=[pl.BlockSpec((1,), lambda b, d, h: (0,), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, CP, db, hwb), lambda b, d, h: (b, 0, d, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, CP, DL, HW), jnp.float32),
            **params,
        )(s)
        return out[:, :1, ::16, ::512]
    return step


def xla_compute_write(key):
    a = jax.random.uniform(key, (B, CP, DL, 1))
    c = jax.random.uniform(key, (1, 1, 1, HW))
    out = a + c  # genuinely element-computed 512MB write
    return out[:, :1, ::16, ::512]


if __name__ == "__main__":
    total = B * CP * DL * HW * 4
    for name, step in [
        ("pallas 8MB blocks", pallas_write(DL, HW)),
        ("pallas 2MB blocks", pallas_write(16, HW)),
        ("pallas 1MB blocks", pallas_write(DL, 512)),
        ("pallas 8MB arbit.", pallas_write(DL, HW, ("arbitrary", "arbitrary", "arbitrary"))),
        ("xla broadcast-add", xla_compute_write),
    ]:
        try:
            t = measure(step)
            print(f"{name:20s} {t*1e6:9.1f} us/iter -> {total/t/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

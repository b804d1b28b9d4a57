"""Probe: can manually-issued parallel DMA copies beat the ~160GB/s
single-queue pallas out-block write?

Kernel fills an 8MB VMEM scratch, then DMAs it to an ANY-space output as
1/2/4/8 concurrent async copies on separate semaphores.

Run: timeout 580 python benchmarks/experiments/dma_probe.py
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

B, CP, DL, HW = 64, 8, 64, 4096  # 8MB per b


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


def manual_dma(nq):
    rows = DL // nq

    def kernel(s_ref, o_ref, scratch, *sems):
        b = pl.program_id(0)
        scratch[...] = jnp.full((CP, DL, HW), s_ref[0], jnp.float32)
        copies = []
        for q in range(nq):
            c = pltpu.make_async_copy(
                scratch.at[:, q * rows:(q + 1) * rows, :],
                o_ref.at[b, :, q * rows:(q + 1) * rows, :],
                sems[q],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

    def step(key):
        s = jax.random.uniform(key, (1,))
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((B, CP, DL, HW), jnp.float32),
            scratch_shapes=[pltpu.VMEM((CP, DL, HW), jnp.float32)]
            + [pltpu.SemaphoreType.DMA] * nq,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(s)
        return out[:, :1, ::16, ::512]
    return step


if __name__ == "__main__":
    total = B * CP * DL * HW * 4
    for nq in (1, 2, 4, 8):
        try:
            t = measure(manual_dma(nq))
            print(f"manual dma x{nq}: {t*1e6:9.1f} us/iter -> {total/t/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"manual dma x{nq}: FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

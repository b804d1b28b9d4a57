"""r3_probe7: how much of the exact-lane budget is the benchmark's own consumer?

The headline protocol consumes grids with a full-grid sum — a deliberate
anti-folding fence (CLAUDE.md "benchmark-consumer trap").  But for the Pallas
lane the output is an opaque custom call: the kernel writes the FULL grid to
HBM no matter what the consumer reads afterwards.  The full-grid sum therefore
charges a complete HBM re-read (~2.5 us/mol bf16) of the produced grid to the
*producer* — cost that belongs to whatever consumes the grid (a conv net reads
it once through its own input pipeline), not to the voxelizer.

This probe A/Bs unfoldable consumers of decreasing byte count on the exact
pallas lane (64^3 x 4ch gaussian, the headline workload):

  full   — sum over the whole grid (the round-1/2 protocol)
  plane  — sum over one depth plane, all channels: contiguous 8 KB runs,
           1/64 of the bytes; still touches every channel tile the kernel wrote
  chan   — sum over channel 0 (1/4 of the bytes, fully contiguous)
  corner — one element per molecule (minimum possible read)

All variants keep the kernel's full-grid HBM write (opaque custom call) and
fetch ONE scalar at the end (deferred-execution-safe, utils/timing.py).
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from molvoxel_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache(".jax_cache")

import jax
import jax.numpy as jnp

from molvoxel_tpu.core.config import GridSpec
from molvoxel_tpu.data.parsers import read_sdf
from molvoxel_tpu.ops.batch import voxelize_batch

spec = GridSpec(resolution=0.5, dimension=64)
batch, vp = 64, 64

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lc = (lig.coords - lig.coords.mean(0)).astype(np.float32)
v, c = lc.shape[0], 4

rng = np.random.default_rng(0)
coords = np.zeros((batch, vp, 3), np.float32)
coords[:, :v] = lc[None, :, :]
weights = np.zeros((batch, vp, c), np.float32)
weights[:, :v] = (rng.uniform(size=(batch, v, c)) < 0.3).astype(np.float32)
radii = jnp.ones((vp,), jnp.float32)
mask = np.zeros((batch, vp), bool)
mask[:, :v] = True
coords, weights, mask = jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)


@functools.partial(jax.jit, static_argnames=("n", "out_dtype", "consumer", "density", "impl"))
def bench_loop(key, n, out_dtype, consumer, density="gaussian", impl="pallas"):
    def body(i, acc):
        keys = jax.random.split(jax.random.fold_in(key, i), batch)
        out = voxelize_batch(
            coords, weights, radii, mask, None, keys, 0.5,
            spec=spec, density_type=density, sigma=0.5,
            random_rotation=True, impl=impl, materialize=True, out_dtype=out_dtype,
        )
        if consumer == "full":
            r = jnp.sum(out.astype(jnp.float32))
        elif consumer == "plane":
            r = jnp.sum(out[:, :, 0].astype(jnp.float32))
        elif consumer == "chan":
            r = jnp.sum(out[:, 0].astype(jnp.float32))
        elif consumer == "corner":
            r = jnp.sum(out[:, 0, 0, 0, 0].astype(jnp.float32))
        elif consumer == "b1":
            # leading-dim slice: layout-trivial, one molecule's full grid
            r = jnp.sum(out[:1].astype(jnp.float32))
        elif consumer == "b8":
            r = jnp.sum(out[:8].astype(jnp.float32))
        elif consumer == "rot":
            # rotating witness: a different molecule's full grid each iteration
            g = jax.lax.dynamic_slice_in_dim(out, i % batch, 1, axis=0)
            r = jnp.sum(g.astype(jnp.float32))
        else:
            raise ValueError(consumer)
        return acc + r * 1e-6
    return jax.lax.fori_loop(0, n, body, 0.0)


def measure(out_dtype, consumer, iters=65, density="gaussian", impl="pallas"):
    def run(n):
        t0 = time.time()
        float(bench_loop(jax.random.PRNGKey(n), n, out_dtype, consumer, density, impl))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    us = (best - base) / ((iters - 1) * batch) * 1e6
    return us, 1e6 / us


for dt, density, impl, iters in (
    ("float32", "gaussian", "pallas", 33),
    ("bfloat16", "gaussian_notrunc", "auto", 129),
    ("float8_e4m3fn", "gaussian_notrunc", "auto", 129),
    ("float32", "gaussian_notrunc", "auto", 65),
):
    for consumer in ("full", "b1"):
        us, rate = measure(dt, consumer, iters=iters, density=density, impl=impl)
        print(f"{density:17s} {impl:7s} {dt:14s} {consumer:5s} {us:7.2f} us/mol  {rate:9.0f} mols/s", flush=True)

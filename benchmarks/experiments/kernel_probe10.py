"""Probe 10: bf16 output tiles vs the f32 output-write wall (round 2).

Round-1 finale (docs/DESIGN.md): the exact ligand path is bound by the
out-block VMEM->HBM copy — 4.19 MB of f32 grid at ~160 GB/s = 21.3 us/mol.
This probe A/Bs the production f32 path against the new out_dtype="bfloat16"
variant (f32 VMEM scratch accumulator, one aligned full-tile cast-store, and
a single-pass bf16 matmul replacing 6 HIGHEST passes), on the bench.py
workload (10gs ligand, 64^3 x 4ch, random rigid transforms, batch 64).

Run: timeout 580 python benchmarks/experiments/kernel_probe10.py
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")
from molvoxel_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache(".jax_cache")

import jax
import jax.numpy as jnp

from molvoxel_tpu.core.config import GridSpec
from molvoxel_tpu.data.parsers import read_sdf
from molvoxel_tpu.ops.batch import voxelize_batch

spec = GridSpec(resolution=0.5, dimension=64)
BATCH, VP = 64, 64

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lc = (lig.coords - lig.coords.mean(0)).astype(np.float32)
v, c = lc.shape[0], 4
rng = np.random.default_rng(0)
coords = np.zeros((BATCH, VP, 3), np.float32)
coords[:, :v] = lc[None]
weights = np.zeros((BATCH, VP, c), np.float32)
weights[:, :v] = (rng.uniform(size=(BATCH, v, c)) < 0.3).astype(np.float32)
mask = np.zeros((BATCH, VP), bool)
mask[:, :v] = True
coords, weights, mask = jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)
radii = jnp.ones((VP,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("n", "density", "out_dtype"))
def bench_loop(key, n, density, out_dtype):
    def body(i, acc):
        keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
        out = voxelize_batch(
            coords, weights, radii, mask, None, keys, 0.5,
            spec=spec, density_type=density, sigma=0.5,
            random_rotation=True, impl="auto", materialize=True, out_dtype=out_dtype,
        )
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
    return jax.lax.fori_loop(0, n, body, 0.0)


def measure(density, out_dtype, iters=65):
    import time

    def run(n):
        t0 = time.time()
        float(bench_loop(jax.random.PRNGKey(n), n, density, out_dtype))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    per = (best - base) / ((iters - 1) * BATCH)
    return per * 1e6, 1.0 / per


def check_parity():
    keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
    kw = dict(spec=spec, density_type="gaussian", sigma=0.5, random_rotation=True,
              impl="auto", materialize=True)
    f32 = voxelize_batch(coords, weights, radii, mask, None, keys, 0.5, **kw)
    bf = voxelize_batch(coords, weights, radii, mask, None, keys, 0.5, **kw, out_dtype="bfloat16")
    err = float(jnp.max(jnp.abs(bf.astype(jnp.float32) - f32)))
    mx = float(jnp.max(jnp.abs(f32)))
    print(f"on-chip bf16-vs-f32: maxabs={mx:.4f} err={err:.5f} rel={err / mx:.5f}")


if __name__ == "__main__":
    check_parity()
    for density in ("gaussian", "gaussian_notrunc"):
        for dt in ("float32", "bfloat16"):
            us, rate = measure(density, dt)
            print(f"{density:18s} {dt:9s}: {us:7.2f} us/mol  {rate:9.0f} mols/s")

"""Round-3 probe 2: fp8 (e4m3) output lane — rate + on-chip parity.

The exact ligand path is write-bound at the output's byte count
(docs/DESIGN.md): bf16 halved the f32 wall; fp8 halves it again.  Probe 1
confirmed Mosaic accepts fp8 cast-stores; this measures the full lane.

Run: timeout 580 python benchmarks/experiments/r3_probe2.py
"""

import functools
import sys
import time

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


def check_parity(density, out_dtype):
    keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
    kw = dict(spec=spec, density_type=density, sigma=0.5, random_rotation=True,
              impl="auto", materialize=True)
    f32 = voxelize_batch(coords, weights, radii, mask, None, keys, 0.5, **kw)
    lo = voxelize_batch(coords, weights, radii, mask, None, keys, 0.5, **kw, out_dtype=out_dtype)
    err = float(jnp.max(jnp.abs(lo.astype(jnp.float32) - f32)))
    mx = float(jnp.max(jnp.abs(f32)))
    print(f"{density} {out_dtype} vs f32: maxabs={mx:.4f} abs_err={err:.5f} rel={err / mx:.5f}")


if __name__ == "__main__":
    for density in ("gaussian", "gaussian_notrunc"):
        check_parity(density, "float8_e4m3fn")
        us, rate = measure(density, "float8_e4m3fn")
        print(f"{density:18s} fp8 : {us:7.2f} us/mol  {rate:9.0f} mols/s")

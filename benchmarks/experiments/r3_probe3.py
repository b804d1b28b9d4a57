"""Round-3 probe 3: decompose the exact-lane fp8/bf16 cost on the ligand.

Components per molecule (64^3 x 4ch, pack=2):
- floor: coords shifted 1000 A off-box -> every range empty -> the measured
  time is prep + zero-fill + out-block write + consumer read.
- full - floor: the in-range select/matmul/eyz work.
- hwt=512: finer h-granularity ranges (more grid steps, less boundary-tile
  select work) via monkeypatched _row_tile target.

Run: timeout 580 python benchmarks/experiments/r3_probe3.py
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
from molvoxel_tpu.ops import pallas_deposit

spec = GridSpec(resolution=0.5, dimension=64)
BATCH, VP = 64, 64

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lc = (lig.coords - lig.coords.mean(0)).astype(np.float32)
v, c = lc.shape[0], 4
rng = np.random.default_rng(0)
coords0 = np.zeros((BATCH, VP, 3), np.float32)
coords0[:, :v] = lc[None]
weights = np.zeros((BATCH, VP, c), np.float32)
weights[:, :v] = (rng.uniform(size=(BATCH, v, c)) < 0.3).astype(np.float32)
mask = np.zeros((BATCH, VP), bool)
mask[:, :v] = True
weights, mask = jnp.asarray(weights), jnp.asarray(mask)
radii = jnp.ones((VP,), jnp.float32)


def make_loop(coords, out_dtype):
    coords = jnp.asarray(coords)

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            out = voxelize_batch(
                coords, weights, radii, mask, None, keys, 0.5,
                spec=spec, density_type="gaussian", sigma=0.5,
                random_rotation=True, impl="auto", materialize=True, out_dtype=out_dtype,
            )
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    return bench_loop


def measure(loop, iters=129):
    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    per = (best - base) / ((iters - 1) * BATCH)
    return per * 1e6


if __name__ == "__main__":
    far = coords0 + 1000.0  # off-box: empty ranges, zero-fill + write only
    for dt in ("float8_e4m3fn", "bfloat16"):
        us_floor = measure(make_loop(far, dt))
        us_full = measure(make_loop(coords0, dt))
        print(f"{dt:14s}: full={us_full:6.2f}  floor={us_floor:6.2f}  in-range work={us_full - us_floor:6.2f} us/mol")

    # finer h tiles: target 512 instead of 1024
    orig = pallas_deposit._row_tile

    def small_row_tile(hw, w, target=1024):
        return orig(hw, w, target=512)

    pallas_deposit._row_tile = small_row_tile
    try:
        for dt in ("float8_e4m3fn", "bfloat16"):
            us = measure(make_loop(coords0, dt))
            print(f"hwt<=512 {dt:14s}: full={us:6.2f} us/mol")
    finally:
        pallas_deposit._row_tile = orig

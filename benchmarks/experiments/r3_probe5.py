"""Round-3 probe 5: batch-size scaling of the exact ligand lane + prep cost.

probe4 killed the kernel-variant levers (store-mode and 2-plane unroll both
lose; select=0.72, fill=0.60 us/mol are semantics-bound), so the remaining
per-mol overhead is XLA prep + launch, which amortizes with B.  B=64 was an
arbitrary round-1 choice; the production stream driver already scans 256-mol
chunks (parallel/stream.py), so B in {128, 256} is the more representative
workload, not a benchmark trick.  Also times a prep-only graph (everything
up to the pallas_call inputs) to pin the prep term directly.

Run: timeout 3000 python benchmarks/experiments/r3_probe5.py
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
from molvoxel_tpu.core.transform import do_random_transform
from molvoxel_tpu.data.parsers import read_sdf
from molvoxel_tpu.ops.batch import voxelize_batch
from molvoxel_tpu.ops.pallas_deposit import _plane_ranges_closed, _row_tile

spec = GridSpec(resolution=0.5, dimension=64)
VP = 64

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lc = (lig.coords - lig.coords.mean(0)).astype(np.float32)
v, c = lc.shape[0], 4
rng = np.random.default_rng(0)


def make_inputs(batch):
    coords = np.zeros((batch, VP, 3), np.float32)
    coords[:, :v] = lc[None]
    weights = np.zeros((batch, VP, c), np.float32)
    weights[:, :v] = (rng.uniform(size=(batch, v, c)) < 0.3).astype(np.float32)
    mask = np.zeros((batch, VP), bool)
    mask[:, :v] = True
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)


def make_loop(batch, out_dtype):
    coords, weights, mask = make_inputs(batch)
    radii = jnp.ones((VP,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            out = voxelize_batch(
                coords, weights, radii, mask, None, keys, 0.5,
                spec=spec, density_type="gaussian", sigma=0.5,
                random_rotation=True, impl="auto", materialize=True, out_dtype=out_dtype,
            )
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    return loop


def make_prep_loop(batch):
    """Same per-iteration prep (keys, transform, pack, ranges, rows) but the
    kernel call replaced by cheap reductions of its inputs."""
    coords, weights, mask = make_inputs(batch)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, coords)
            # pack 2 -> (B/2, 128, .)
            bp = batch // 2
            pc = crd.reshape(bp, 2 * VP, 3)
            pw = jnp.zeros((bp, 2 * VP, 2 * c), jnp.float32)
            wg = weights.reshape(bp, 2, VP, c)
            for j in range(2):
                pw = pw.at[:, j * VP : (j + 1) * VP, j * c : (j + 1) * c].set(wg[:, j])
            pm = mask.reshape(bp, 2 * VP)
            wt = jnp.where(pm[:, None, :], jnp.swapaxes(pw, 1, 2), 0.0)
            r2 = jnp.ones((bp, 2 * VP), jnp.float32)
            hwt = _row_tile(64 * 64, 64)
            ranges = _plane_ranges_closed(pc, r2, spec, 64, (64 * 64) // hwt, hwt // 64, 128)
            rows = jnp.stack([pc[..., 0], pc[..., 1], pc[..., 2], r2], axis=1)
            return acc + (jnp.sum(ranges) + jnp.sum(rows) + jnp.sum(wt)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    return loop


def measure(loop, batch, iters=129):
    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0
    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    return (best - base) / ((iters - 1) * batch) * 1e6


if __name__ == "__main__":
    for batch in (64, 128, 256):
        prep = measure(make_prep_loop(batch), batch)
        print(f"B={batch:3d} prep-only: {prep:6.2f} us/mol", flush=True)
    for dtype in ("bfloat16", "float8_e4m3fn"):
        for batch in (64, 128, 256):
            us = measure(make_loop(batch, dtype), batch, iters=65 if batch > 64 else 129)
            print(f"B={batch:3d} {dtype:14s}: {us:6.2f} us/mol ({1e6/us:,.0f} mols/s)", flush=True)

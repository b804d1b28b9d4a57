"""Protein-regime probe (round 2): where do the complex-path microseconds go?

Workloads: 10gs complex (ligand+protein, ~6.6k pts) at 48^3 x 13ch, and
protein-only at 48^3 x 4ch — the two BENCHMARKS.md protein rows.  Measures
the production path at f32 and bf16 output (the bf16 lane also switches the
per-plane matmul to a single bf16 MXU pass, which matters here: this path is
compute-bound, not write-bound like the ligand).

Run: timeout 580 python benchmarks/experiments/protein_probe.py
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

from molvoxel_tpu.core.config import GridSpec, round_up
from molvoxel_tpu.data.parsers import read_pdb, read_sdf
from molvoxel_tpu.ops.batch import voxelize_batch

BATCH = 8

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb")
center = lig.coords.mean(0)


def build(coords_np, c, seed=0):
    v = coords_np.shape[0]
    vp = round_up(v, 128)
    rng = np.random.default_rng(seed)
    coords = np.zeros((BATCH, vp, 3), np.float32)
    coords[:, :v] = coords_np[None]
    weights = np.zeros((BATCH, vp, c), np.float32)
    weights[:, :v] = (rng.uniform(size=(BATCH, v, c)) < 0.2).astype(np.float32)
    mask = np.zeros((BATCH, vp), bool)
    mask[:, :v] = True
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask), jnp.ones((vp,), jnp.float32)


def measure(name, coords, weights, mask, radii, dim, out_dtype, iters=17):
    spec = GridSpec(0.5, dim)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            out = voxelize_batch(coords, weights, radii, mask, None, keys, 0.5,
                                 spec=spec, density_type="gaussian", sigma=0.5,
                                 random_rotation=True, impl="auto", materialize=True,
                                 out_dtype=out_dtype)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    per = (best - base) / ((iters - 1) * BATCH)
    print(f"{name:34s} {out_dtype:9s}: {per * 1e6:8.1f} us/mol  {1.0 / per:8.0f} mols/s", flush=True)
    return per


if __name__ == "__main__":
    cplx = np.concatenate([lig.coords, prot.coords], 0) - center
    cc, cw, cm, cr = build(cplx, 13)
    pc, pw, pm, pr = build(prot.coords - center, 4, seed=1)
    for dt in ("float32", "bfloat16"):
        measure("complex 48^3 x13ch (6.6k pts)", cc, cw, cm, cr, 48, dt)
        measure("protein 48^3 x4ch (6.5k pts)", pc, pw, pm, pr, 48, dt)

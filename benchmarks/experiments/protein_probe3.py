"""Protein probe 3: cost of the XLA prep graph alone (no pallas_call).

Splits probe2's 234 us/mol floor into XLA prep (transform, spatial sort,
per-axis prep, ranges, chunk-row relayouts) vs kernel-side overhead.  Also
measures the prep without the spatial sort (argsort is a bitonic-network sort
on TPU — suspected dominant) and without the chunk-row relayouts.

Run: timeout 580 python benchmarks/experiments/protein_probe3.py
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
from molvoxel_tpu.core.transform import do_random_transform
from molvoxel_tpu.data.parsers import read_pdb, read_sdf
from molvoxel_tpu.ops import pallas_deposit as pd

SIGMA = 0.5
spec = GridSpec(0.5, 48)
BATCH = 8

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb")
center = lig.coords.mean(0)
coords_np = np.concatenate([lig.coords, prot.coords], 0) - center
v = coords_np.shape[0]
c = 13
vp = round_up(v, 128)
rng = np.random.default_rng(0)
coords0 = np.zeros((BATCH, vp, 3), np.float32)
coords0[:, :v] = coords_np[None]
weights0 = np.zeros((BATCH, vp, c), np.float32)
weights0[:, :v] = (rng.uniform(size=(BATCH, v, c)) < 0.2).astype(np.float32)
mask0 = np.zeros((BATCH, vp), bool)
mask0[:, :v] = True
coords0, weights0, mask0 = jnp.asarray(coords0), jnp.asarray(weights0), jnp.asarray(mask0)
radii = jnp.ones((vp,), jnp.float32)


def prep(crd, *, sort, rows):
    b = crd.shape[0]
    r = jnp.broadcast_to(radii[None], (b, vp))
    pm = mask0
    pw = weights0
    pc = crd
    if sort:
        pc, pw, r, pm = pd._sort_atoms_spatially(pc, pw, r, pm, spec, 0)
    dx2, dy2_t, dz2_t, wt, (b, vp_, c_, cp, dim, dl, hw, hwp) = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = pd._row_tile(hw, dim)
    a = 128
    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    acc = ranges.sum() * 1.0 + dy2_t.sum() + dz2_t.sum() + wt.sum()
    if rows:
        thresh_rows = pd._chunk_rows(thresh, a)
        ex_rows = pd._chunk_rows(jnp.exp(dx2 * coef[:, None, :]), a)
        acc = acc + thresh_rows.sum() + ex_rows.sum()
    else:
        acc = acc + thresh.sum() + jnp.exp(dx2 * coef[:, None, :]).sum()
    return acc


def measure(name, fn, iters=33):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, coords0)
            return acc + fn(crd) * 1e-9
        return jax.lax.fori_loop(0, n, body, 0.0)

    def go(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    go(1)
    go(iters)
    base = min(go(1) for _ in range(3))
    best = min(go(iters) for _ in range(3))
    per = (best - base) / ((iters - 1) * BATCH)
    print(f"{name:24s}: {per * 1e6:8.1f} us/mol", flush=True)


if __name__ == "__main__":
    measure("prep full", functools.partial(prep, sort=True, rows=True))
    measure("prep nosort", functools.partial(prep, sort=False, rows=True))
    measure("prep norows", functools.partial(prep, sort=True, rows=False))
    measure("prep bare", functools.partial(prep, sort=False, rows=False))

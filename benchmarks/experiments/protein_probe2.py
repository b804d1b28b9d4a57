"""Protein probe 2: decompose the 337 us/mol complex-path cost (bf16 lane).

Variants of the production cast kernel (complex 48^3 x13ch workload), each
isolating one term:

  prod     — production kernel (baseline)
  floor    — ranges forced empty: grid overhead + zero-fill + out write
  nosel    — per-plane select removed (dens = eyz): compare+select cost
  noloop   — one plane instead of the real range: per-plane loop cost
  nomm     — matmul replaced by a cheap reduce: MXU cost

Run: timeout 580 python benchmarks/experiments/protein_probe2.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _kernel(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, acc_ref, *,
            dl, a, ct, hwt, nvc, variant):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        acc_ref[...] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]
    if variant == "floor":
        d_hi = d_lo
    elif variant == "noloop":
        d_hi = jnp.minimum(d_lo + 1, d_hi)

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        coef = coef_ref[0]
        ey = jnp.exp(dy2 * coef).astype(jnp.bfloat16)
        ez = jnp.exp(dz2 * coef).astype(jnp.bfloat16)
        eyz = (ey[:, None, :] * ez[None, :, :]).reshape(hwt, a)

        def body(d, carry):
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            exr = ex_ref[0, 0:1, pl.ds(off, a)]
            if variant == "nosel":
                dens = eyz
            else:
                dens = jnp.where(dyz2 <= th, eyz, jnp.bfloat16(0.0))
            m = (wt_ref[0] * exr).astype(jnp.bfloat16)
            if variant == "nomm":
                acc = jnp.broadcast_to(jnp.sum(dens, axis=1, dtype=jnp.float32)[None, :], (ct, hwt))
            else:
                acc = jax.lax.dot_general(
                    m, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)

    @pl.when(vc == nvc - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(jnp.bfloat16)


def run(crd, *, variant):
    b = crd.shape[0]
    r = jnp.broadcast_to(radii[None], (b, vp))
    pc, pw, r, pm = pd._sort_atoms_spatially(crd, weights0, r, mask0, spec, 0)
    dx2, dy2_t, dz2_t, wt, (b, vp_, c_, cp, dim, dl, hw, hwp) = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = pd._row_tile(hw, dim)
    ct = pd._channel_tile(cp, dl, hwt)
    a = 128
    nvc = vp_ // a
    nhwt = hw // hwt
    hrows = hwt // dim
    grid = (b, cp // ct, nhwt, nvc)

    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)
    thresh_rows = pd._chunk_rows(thresh, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = pd._chunk_rows(jnp.exp(dx2 * coef[:, None, :]), a)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, 1, dl * a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, hrows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, dl=dl, a=a, ct=ct, hwt=hwt, nvc=nvc, variant=variant),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec, coef_spec, dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ct, dl, hwt), jnp.float32)],
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out


def measure(variant, iters=17):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, coords0)
            out = run(crd, variant=variant)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-6
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
    print(f"{variant:8s}: {per * 1e6:8.1f} us/mol", flush=True)


if __name__ == "__main__":
    for variant in ("prod", "floor", "noloop", "nosel", "nomm"):
        measure(variant)

"""Probe 9: SSA plane-stacked matmuls on the compute-bound complex workload.

The ligand path is output-write-bound (probe 4/8) so matmul stacking cannot
help it; the 6.6k-point complex path is compute-bound (write is ~34 of
~330 us/mol) and pays 6 HIGHEST dot_general passes per active plane.  This
probe A/Bs the production v4 kernel against v4 + pstack (SSA-built stacked
dens, o_ref `+=` RMW stores kept verbatim).

Run: timeout 580 python benchmarks/experiments/kernel_probe9.py
"""

import functools
import sys

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

HI = jax.lax.Precision.HIGHEST
SIGMA = 0.5
spec = GridSpec(resolution=0.5, dimension=48)
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


def transform(key):
    keys = jax.random.split(key, BATCH)
    crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, coords0)
    return crd


def _kernel(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, *,
            dl, a, ct, hwt, pstack):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        o_ref[0] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]
    lo = (d_lo // pstack) * pstack
    n = (d_hi - lo + pstack - 1) // pstack

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        eyz = jnp.exp(dyz2 * coef_ref[0])
        wt = wt_ref[0]

        def body(i, carry):
            d = pl.multiple_of(lo + i * pstack, pstack)
            if pstack == 1:
                th = thresh_ref[0, pl.ds(d, 1), :]
                exr = ex_ref[0, pl.ds(d, 1), :]
                dens = jnp.where(dyz2 <= th, eyz, 0.0)
                acc = jax.lax.dot_general(
                    wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
                o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]
            else:
                th = jnp.concatenate([thresh_ref[0, pl.ds(d + p, 1), :] for p in range(pstack)], axis=0)
                exr = jnp.concatenate([ex_ref[0, pl.ds(d + p, 1), :] for p in range(pstack)], axis=0)
                dens = jnp.where(
                    dyz2[None, :, :] <= th[:, None, :], eyz[None, :, :] * exr[:, None, :], 0.0
                ).reshape(pstack * hwt, a)
                acc = jax.lax.dot_general(
                    wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
                for p in range(pstack):
                    accp = jax.lax.slice_in_dim(acc, p * hwt, (p + 1) * hwt, axis=1)
                    o_ref[0, :, pl.ds(d + p, 1), :] += jnp.expand_dims(accp, 1)
            return carry

        jax.lax.fori_loop(0, n, body, 0)


def run(crd, *, pstack):
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
    from benchmarks.experiments.kernel_probe2 import _chunk_dl_a
    thresh_rows = _chunk_dl_a(thresh, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = _chunk_dl_a(jnp.exp(dx2 * coef[:, None, :]), a)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, dl, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, hrows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, dl=dl, a=a, ct=ct, hwt=hwt, pstack=pstack),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out


def measure(step, iters=9):
    import time
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(k, n):
        def body(i, acc):
            out = step(jax.random.fold_in(k, i))
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)
    def runn(n):
        t0 = time.time(); float(loop(jax.random.PRNGKey(7), n)); return time.time() - t0
    runn(1); runn(iters)
    base = min(runn(1) for _ in range(3))
    best = min(runn(iters) for _ in range(3))
    return (best - base) / ((iters - 1) * BATCH)


if __name__ == "__main__":
    if "check" in sys.argv:
        crd = transform(jax.random.PRNGKey(3))
        base = run(crd, pstack=1)
        for ps in (2, 4):
            err = float(jnp.max(jnp.abs(run(crd, pstack=ps) - base)))
            print(f"complex pstack={ps}: err {err:.2e}", flush=True)
        sys.exit(0)
    for ps in (1, 2, 4, 8):
        try:
            def step(key, ps=ps):
                return run(transform(key), pstack=ps)[:, :1, ::16, ::512]
            us = measure(step) * 1e6
            print(f"complex-p{ps}   {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"complex-p{ps}   FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

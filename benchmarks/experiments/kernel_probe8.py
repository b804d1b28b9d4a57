"""Probe 8: kernel v10 — v4 body verbatim, f32 accumulator scratch, one
full-block cast store per (cb, ht) tile.

Probe 7/6 lessons baked in:
- o_ref/scratch `+=` RMW is fast; explicit read+add+write costs ~0.7us/iter.
- bf16 out blocks crash the Mosaic compiler when written with 1-wide dynamic
  sublane stores; a single full-block store (aligned to the (16,128) bf16
  tiling) compiles and runs.
- dens must stay an SSA value (VMEM staging costs ~22us/mol).

Run: timeout 580 python benchmarks/experiments/kernel_probe8.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.experiments.kernel_probe2 import (  # noqa: E402
    BATCH, SIGMA, _chunk_dl_a, measure, pd, spec, transform_and_pack,
)

HI = jax.lax.Precision.HIGHEST


def _kernel_v10(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref,
                acc_ref, *, dl, a, ct, hwt, hrows, nvc, pstack, precision):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        acc_ref[...] = jnp.zeros((ct, dl, hwt), jnp.float32)

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
                    preferred_element_type=jnp.float32, precision=precision,
                )
                acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]
            else:
                th = jnp.concatenate([thresh_ref[0, pl.ds(d + p, 1), :] for p in range(pstack)], axis=0)
                exr = jnp.concatenate([ex_ref[0, pl.ds(d + p, 1), :] for p in range(pstack)], axis=0)
                dens = jnp.where(
                    dyz2[None, :, :] <= th[:, None, :], eyz[None, :, :] * exr[:, None, :], 0.0
                ).reshape(pstack * hwt, a)
                acc = jax.lax.dot_general(
                    wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                for p in range(pstack):
                    accp = jax.lax.slice_in_dim(acc, p * hwt, (p + 1) * hwt, axis=1)
                    acc_ref[:, pl.ds(d + p, 1), :] += jnp.expand_dims(accp, 1)
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    @pl.when(vc == nvc - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def run_v10(pc, pw, pr, pm, *, precision=HI, hwt_rows=16, pstack=1, out_dtype=jnp.float32):
    b, vp, c = pw.shape
    r = jnp.broadcast_to(pr[None], (b, vp))
    pc, pw, r, pm = pd._sort_atoms_spatially(pc, pw, r, pm, spec, 0)
    dx2, dy2_t, dz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = hwt_rows * dim
    ct = pd._channel_tile(cp, dl, hwt)
    a = 128
    nvc = vp // a
    nhwt = hw // hwt
    grid = (b, cp // ct, nhwt, nvc)

    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)
    thresh_rows = _chunk_dl_a(thresh, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = _chunk_dl_a(jnp.exp(dx2 * coef[:, None, :]), a)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, dl, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, hwt_rows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_v10, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hwt_rows,
                          nvc=nvc, pstack=pstack, precision=precision),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), out_dtype),
        scratch_shapes=[pltpu.VMEM((ct, dl, hwt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out.reshape(b, cp, dl, spec.dimension, spec.dimension)


def mk(pack=2, **kw):
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key, pack)
        out = run_v10(pc, pw, pr, pm, **kw)
        return out[:, :1, ::16, ::16, ::64].astype(jnp.float32)
    return step


if __name__ == "__main__":
    for name, fn in [
        ("v10-f32-p1", mk(pstack=1)),
        ("v10-bf16-p1", mk(pstack=1, out_dtype=jnp.bfloat16)),
        ("v10-bf16-p2", mk(pstack=2, out_dtype=jnp.bfloat16)),
        ("v10-bf16-p4", mk(pstack=4, out_dtype=jnp.bfloat16)),
        ("v10-f16-p1", mk(pstack=1, out_dtype=jnp.float16)),
    ]:
        try:
            us = measure(fn) * 1e6
            print(f"{name:14s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

"""Probe 4: decompose the 21us/mol pallas floor — zero-fill vs output DMA vs
input/grid/prep. All "floor" variants force empty plane ranges.

Run: timeout 580 python benchmarks/experiments/kernel_probe4.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.experiments.kernel_probe2 import (  # noqa: E402
    BATCH, measure, transform_and_pack, pd, spec, SIGMA,
)
import benchmarks.experiments.kernel_probe3 as p3  # installs range patch  # noqa: E402

HI = jax.lax.Precision.HIGHEST


def run_floor(pc, pw, pr, pm, *, zero_fill=True, tiny_out=False, hwt_rows=16):
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

    ranges = jnp.zeros((b * nhwt * nvc, 1, 2), jnp.int32)
    from benchmarks.experiments.kernel_probe2 import _chunk_dl_a
    thresh_rows = _chunk_dl_a(thresh, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = _chunk_dl_a(jnp.exp(dx2 * coef[:, None, :]), a)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    def kernel(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref):
        vc = pl.program_id(3)
        if zero_fill:
            @pl.when(vc == 0)
            def _():
                o_ref[0] = jnp.zeros_like(o_ref[0])
        d_lo = range_ref[0, 0, 0]
        d_hi = range_ref[0, 0, 1]

        @pl.when(d_hi > d_lo)
        def _():
            dy2 = dy2_ref[0]
            dz2 = dz2_ref[0]
            dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
            eyz = jnp.exp(dyz2 * coef_ref[0])
            wtb = wt_ref[0]

            def body(d, carry):
                th = thresh_ref[0, pl.ds(d, 1), :]
                exr = ex_ref[0, pl.ds(d, 1), :]
                dens = jnp.where(dyz2 <= th, eyz, 0.0)
                acc = jax.lax.dot_general(
                    wtb * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
                if tiny_out:
                    o_ref[0, 0, :, :] += acc
                else:
                    o_ref[0, pl.ds(d, 1), :, :] += acc[None]
                return carry

            jax.lax.fori_loop(d_lo, d_hi, body, 0)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, dl, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, hwt_rows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    if tiny_out:
        out_spec = pl.BlockSpec((1, 1, ct, hwt), lambda bb, cb, ht, vc: (bb, 0, cb, ht), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 1, cp, hw), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, dl, ct, hwt), lambda bb, cb, ht, vc: (bb, 0, cb, ht), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, dl, cp, hw), jnp.float32)

    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec, out_shape=out_shape, interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)


def mk(zero_fill, tiny_out):
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key, 2)
        out = run_floor(pc, pw, pr, pm, zero_fill=zero_fill, tiny_out=tiny_out)
        return out[:, :1, :1, ::128]
    return step


def xla_write(key):
    s = jax.random.uniform(key)
    out = jax.lax.optimization_barrier(jnp.full((BATCH, 4, 64, 64, 64), s))
    return out[:, :1, ::16, ::16, ::128]


if __name__ == "__main__":
    for name, fn in [
        ("floor", mk(True, False)),
        ("floor-nozero", mk(False, False)),
        ("floor-tinyout", mk(True, True)),
        ("xla-write-256MB", xla_write),
    ]:
        try:
            us = measure(fn) * 1e6
            print(f"{name:16s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

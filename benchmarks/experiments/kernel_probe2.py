"""Probe 2: attack the ~400ns/iteration loop machinery of the v4 kernel.

Variants (all parity-exact semantics unless noted):
  base        v4 layout (lane-sliced rows, out (ct, dl, hwt), per-plane RMW)
  subl        th/ex as (dl, a) blocks, sublane-sliced per plane
  dlout       out array (b, dl, cp, hw): per-plane store is a natural (ct, hwt) tile
  subl+dlout  both
  pack8       both + 8 molecules per system (Vp=512, Cp=32, ct=32, hwt varies)
  *, bf16     precision floor

Run: timeout 580 python benchmarks/experiments/kernel_probe2.py [names...]
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

from molvoxel_tpu.core.config import GridSpec
from molvoxel_tpu.core.transform import do_random_transform
from molvoxel_tpu.data.parsers import read_sdf
from molvoxel_tpu.ops import pallas_deposit as pd

spec = GridSpec(resolution=0.5, dimension=64)
BATCH, VP, C = 64, 64, 4
SIGMA = 0.5

lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lc = (lig.coords - lig.coords.mean(0)).astype(np.float32)
v = lc.shape[0]
rng = np.random.default_rng(0)
coords0 = np.zeros((BATCH, VP, 3), np.float32)
coords0[:, :v] = lc[None]
weights0 = np.zeros((BATCH, VP, C), np.float32)
weights0[:, :v] = (rng.uniform(size=(BATCH, v, C)) < 0.3).astype(np.float32)
mask0 = np.zeros((BATCH, VP), bool)
mask0[:, :v] = True
coords0, weights0, mask0 = jnp.asarray(coords0), jnp.asarray(weights0), jnp.asarray(mask0)
radii = jnp.ones((VP,), jnp.float32)


def transform_and_pack(key, pack):
    keys = jax.random.split(key, BATCH)
    crd = jax.vmap(lambda k, c: do_random_transform(k, c, None, 0.5, True))(keys, coords0)
    bp = BATCH // pack
    pc = crd.reshape(bp, pack * VP, 3)
    pw = jnp.zeros((bp, pack * VP, pack * C), jnp.float32)
    wg = weights0.reshape(bp, pack, VP, C)
    for i in range(pack):
        pw = pw.at[:, i * VP : (i + 1) * VP, i * C : (i + 1) * C].set(wg[:, i])
    pm = mask0.reshape(bp, pack * VP)
    pr = jnp.tile(radii, (pack,))
    return pc, pw, pr, pm


def _chunk_dl_a(x, a):
    """(B, Dl, Vp) -> (B*nvc, Dl, A) per-chunk blocks (sublane-sliceable)."""
    b, dl, vp = x.shape
    nvc = vp // a
    return x.reshape(b, dl, nvc, a).transpose(0, 2, 1, 3).reshape(b * nvc, dl, a)


def _kernel_v6(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, *,
               dl, a, ct, hwt, hrows, precision, subl, dlout):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        if dlout:
            o_ref[0] = jnp.zeros((dl, ct, hwt), jnp.float32)
        else:
            o_ref[0] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        eyz = jnp.exp(dyz2 * coef_ref[0])
        wt = wt_ref[0]

        def body(d, carry):
            if subl:
                th = thresh_ref[0, pl.ds(d, 1), :]  # (1, A) via sublane slice
                exr = ex_ref[0, pl.ds(d, 1), :]
            else:
                off = pl.multiple_of(d * a, 128)
                th = thresh_ref[0, 0:1, pl.ds(off, a)]
                exr = ex_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, eyz, 0.0)
            acc = jax.lax.dot_general(
                wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            if dlout:
                o_ref[0, pl.ds(d, 1), :, :] += acc[None]
            else:
                o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)


def run_v6(pc, pw, pr, pm, *, precision, subl, dlout, hwt_rows=16):
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
    hrows = hwt_rows
    grid = (b, cp // ct, nhwt, nvc)

    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_full = jnp.exp(dx2 * coef[:, None, :])
    if subl:
        thresh_rows = _chunk_dl_a(thresh, a)
        ex_rows = _chunk_dl_a(ex_full, a)
        row_spec = pl.BlockSpec((1, dl, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    else:
        thresh_rows = pd._chunk_rows(thresh, a)
        ex_rows = pd._chunk_rows(ex_full, a)
        row_spec = pl.BlockSpec((1, 1, dl * a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    dy2_spec = pl.BlockSpec((1, hrows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    if dlout:
        out_spec = pl.BlockSpec((1, dl, ct, hwt), lambda bb, cb, ht, vc: (bb, 0, cb, ht), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, dl, cp, hw), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, cp, dl, hw), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel_v6, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hrows,
                          precision=precision, subl=subl, dlout=dlout),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out


def make_step(pack=2, **kw):
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key, pack)
        out = run_v6(pc, pw, pr, pm, **kw)
        return out[:, :1, ::16, ::128]

    return step


def measure(step, iters=33):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(k, n):
        def body(i, acc):
            out = step(jax.random.fold_in(k, i))
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(7), n))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    return (best - base) / ((iters - 1) * BATCH)


HI = jax.lax.Precision.HIGHEST
BF = jax.lax.Precision.DEFAULT

variants = {
    "base": lambda: measure(make_step(precision=HI, subl=False, dlout=False)),
    "subl": lambda: measure(make_step(precision=HI, subl=True, dlout=False)),
    "dlout": lambda: measure(make_step(precision=HI, subl=False, dlout=True)),
    "subl+dlout": lambda: measure(make_step(precision=HI, subl=True, dlout=True)),
    "sd-bf16": lambda: measure(make_step(precision=BF, subl=True, dlout=True)),
    "pack8": lambda: measure(make_step(pack=8, precision=HI, subl=True, dlout=True)),
    "pack8-r8": lambda: measure(make_step(pack=8, precision=HI, subl=True, dlout=True, hwt_rows=8)),
    "pack8-bf16": lambda: measure(make_step(pack=8, precision=BF, subl=True, dlout=True)),
    "pack4": lambda: measure(make_step(pack=4, precision=HI, subl=True, dlout=True)),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(variants)
    for name in names:
        try:
            us = variants[name]() * 1e6
            print(f"{name:12s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

"""Probe: where do the ~27us/mol of the exact packed ligand path go?

Variants of the v4 kernel on the bench.py workload (10gs ligand, 64^3 x 4ch,
packed 2 mols/chunk -> B=32, Vp=128, Cp=8):

  prep      XLA-side work only (transform + pack + sort + axes + ranges)
  v4        current kernel (HIGHEST matmul, masked density)
  v4-high   precision=HIGH (timing only; parity would fail)
  v4-bf16   precision=DEFAULT bf16 (timing only)
  v4-nomask dens = eyz, no cutoff compare/select (timing only)
  v4-nomm   mask pass kept, matmul replaced by a cheap reduce (timing only)

Run: timeout 580 python benchmarks/experiments/kernel_probe.py
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
BATCH, VP, C, PACK = 64, 64, 4, 2
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


def transform_and_pack(key):
    keys = jax.random.split(key, BATCH)
    crd = jax.vmap(lambda k, c: do_random_transform(k, c, None, 0.5, True))(keys, coords0)
    bp = BATCH // PACK
    pc = crd.reshape(bp, PACK * VP, 3)
    pw = jnp.zeros((bp, PACK * VP, PACK * C), jnp.float32)
    wg = weights0.reshape(bp, PACK, VP, C)
    for i in range(PACK):
        pw = pw.at[:, i * VP : (i + 1) * VP, i * C : (i + 1) * C].set(wg[:, i])
    pm = mask0.reshape(bp, PACK * VP)
    pr = jnp.tile(radii, (PACK,))
    return pc, pw, pr, pm


def prep_only(key):
    pc, pw, pr, pm = transform_and_pack(key)
    b, vp, c = pw.shape
    r = jnp.broadcast_to(pr[None], (b, vp))
    pc, pw, r, pm = pd._sort_atoms_spatially(pc, pw, r, pm, spec, 0)
    dx2, dy2_t, dz2_t, wt, dims = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = pd._row_tile(64 * 64, 64)
    a = 128
    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = pd._chunk_rows(jnp.exp(dx2 * coef[:, None, :]), a)
    return (
        jnp.sum(wt) + jnp.sum(thresh) * 1e-3 + jnp.sum(ranges) * 1e-3 + jnp.sum(ex_rows) * 1e-3 + jnp.sum(dz2_t)
    )[None]


# ---- variant kernel: parameterized v4 gaussian


def _kernel_var(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, *,
                dl, a, ct, hwt, hrows, precision, apply_mask, do_matmul):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
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
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            exr = ex_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, eyz, 0.0) if apply_mask else eyz
            if do_matmul:
                acc = jax.lax.dot_general(
                    wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            else:
                red = jnp.sum(dens, axis=1, keepdims=True)  # (hwt, 1) -> broadcast
                acc = jnp.broadcast_to(red.reshape(1, hwt), (ct, hwt)) * exr[0, 0]
            o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)


def run_variant(pc, pw, pr, pm, *, precision, apply_mask=True, do_matmul=True, hwt_target=64):
    b, vp, c = pw.shape
    r = jnp.broadcast_to(pr[None], (b, vp))
    pc, pw, r, pm = pd._sort_atoms_spatially(pc, pw, r, pm, spec, 0)
    dx2, dy2_t, dz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = pd._row_tile(hw, dim, target=hwt_target * 16)
    ct = pd._channel_tile(cp, dl, hwt)
    a = pd._atom_chunk(vp, hwt, ct * dl * hwt * 4, streams=1)
    nvc = vp // a
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
    dy2_spec = pl.BlockSpec((1, hrows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_var, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hrows,
                          precision=precision, apply_mask=apply_mask, do_matmul=do_matmul),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dz2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), jnp.float32),
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out


def make_step(**kw):
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key)
        return run_variant(pc, pw, pr, pm, **kw)[:, :1, ::16, ::128]

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


H = jax.lax.Precision.HIGHEST

variants = {
    "prep": lambda: measure(prep_only),
    "v4": lambda: measure(make_step(precision=H)),
    "v4-high": lambda: measure(make_step(precision=jax.lax.Precision.HIGH)),
    "v4-bf16": lambda: measure(make_step(precision=jax.lax.Precision.DEFAULT)),
    "v4-nomask": lambda: measure(make_step(precision=H, apply_mask=False)),
    "v4-nomm": lambda: measure(make_step(precision=H, do_matmul=False)),
    "v4-hwt512": lambda: measure(make_step(precision=H, hwt_target=32)),
    "v4-hwt2048": lambda: measure(make_step(precision=H, hwt_target=128)),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(variants)
    for name in names:
        try:
            us = variants[name]() * 1e6
            print(f"{name:12s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

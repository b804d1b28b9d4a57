"""Round-3 probe 4: isolate the v5 in-range cost terms on the fp8 ligand lane.

Local kernel variants (timing-only, some correctness-breaking) toggle:
- fill:   the vc==0 full-tile zero-fill (skip = broken but times the fill)
- sel:    the per-plane where-select (skip = notrunc values, times the select)
- store:  plain stores instead of RMW on the scratch (+ explicit edge fills)
  — valid when nvc==1 (each plane touched once)
- pstack: 2-plane N-stacked matmul (halves matmul count; 2 selects kept)

Run: timeout 580 python benchmarks/experiments/r3_probe4.py
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
from molvoxel_tpu.data.parsers import read_sdf
from molvoxel_tpu.ops.pallas_deposit import _atom_chunk, _channel_tile, _plane_ranges_closed, _row_tile

spec = GridSpec(resolution=0.5, dimension=64)
BATCH, VP, C = 64, 64, 4
PACK = 2

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


def kernel_variant(range_ref, atom_ref, wt_ref, o_ref, acc_ref, *,
                   dl, a, ct, hwt, hrows, dim, res, half_width, nvc, out_dtype,
                   fill=True, sel=True, store=False, pstack=1):
    vc = pl.program_id(3)

    if fill and not store:
        @pl.when(vc == 0)
        def _():
            acc_ref[...] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]

    if store:
        # zero only the out-of-range planes (valid for nvc == 1)
        def zbody(d, carry):
            @pl.when(jnp.logical_or(d < d_lo, d >= d_hi))
            def _():
                acc_ref[:, pl.ds(d, 1), :] = jnp.zeros((ct, 1, hwt), jnp.float32)
            return carry
        jax.lax.fori_loop(0, dl, zbody, 0)

    @pl.when(d_hi > d_lo)
    def _():
        x = atom_ref[0, 0:1, :]
        y = atom_ref[0, 1:2, :]
        z = atom_ref[0, 2:3, :]
        r2 = atom_ref[0, 3:4, :]
        coef = atom_ref[0, 4:5, :]
        ht = pl.program_id(2)
        ay = (jax.lax.broadcasted_iota(jnp.int32, (hrows, 1), 0) + ht * hrows).astype(jnp.float32) * res - half_width
        az = jax.lax.broadcasted_iota(jnp.int32, (dim, 1), 0).astype(jnp.float32) * res - half_width
        dy2 = (ay - y) * (ay - y)
        dz2 = (az - z) * (az - z)
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        ey = jnp.exp(dy2 * coef).astype(jnp.bfloat16)
        ez = jnp.exp(dz2 * coef).astype(jnp.bfloat16)
        eyz = (ey[:, None, :] * ez[None, :, :]).reshape(hwt, a)
        wt = wt_ref[0]

        if pstack == 1:
            def body(d, carry):
                dxv = (d.astype(jnp.float32) * res - half_width) - x
                dx2v = dxv * dxv
                th = r2 - dx2v
                m = (wt * jnp.exp(dx2v * coef)).astype(jnp.bfloat16)
                if sel:
                    dens = jnp.where(dyz2 <= th, eyz, jnp.bfloat16(0.0))
                else:
                    dens = eyz
                acc = jax.lax.dot_general(
                    m, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if store:
                    acc_ref[:, pl.ds(d, 1), :] = acc[:, None, :]
                else:
                    acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]
                return carry
            jax.lax.fori_loop(d_lo, d_hi, body, 0)
        else:
            def body2(i, carry):
                d = d_lo + i * 2
                outs = []
                denss = []
                for k in range(2):
                    dk = d + k
                    dxv = (dk.astype(jnp.float32) * res - half_width) - x
                    dx2v = dxv * dxv
                    th = r2 - dx2v
                    mk = (wt * jnp.exp(dx2v * coef)).astype(jnp.bfloat16)
                    dk_ok = dk < d_hi
                    dens = jnp.where(jnp.logical_and(dyz2 <= th, dk_ok), eyz, jnp.bfloat16(0.0))
                    outs.append(mk)
                    denss.append(dens)
                m2 = jnp.concatenate(outs, axis=0)  # (2*ct, a)
                # one matmul, two N-blocks: concat dens on sublanes? both dens
                # share shape (hwt, a); stack as (hwt*2, a) then contract
                dens2 = jnp.concatenate(denss, axis=0)  # (2*hwt, a)
                acc = jax.lax.dot_general(
                    outs[0], denss[0], dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_b = jax.lax.dot_general(
                    outs[1], denss[1], dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                del m2, dens2
                acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]

                @pl.when(d + 1 < d_hi)
                def _():
                    acc_ref[:, pl.ds(d + 1, 1), :] += acc_b[:, None, :]
                return carry
            n2 = (d_hi - d_lo + 1) // 2
            jax.lax.fori_loop(0, n2, body2, 0)

    @pl.when(vc == nvc - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(out_dtype)


def run_variant(coords, weights, mask, out_dtype="float8_e4m3fn", **flags):
    b0, vp0, c0 = weights.shape
    # pack 2 molecules -> (B/2, 128, 8)
    bp = b0 // PACK
    pc = coords.reshape(bp, PACK * vp0, 3)
    pw = jnp.zeros((bp, PACK * vp0, PACK * c0), jnp.float32)
    wg = weights.reshape(bp, PACK, vp0, c0)
    for i in range(PACK):
        pw = pw.at[:, i * vp0 : (i + 1) * vp0, i * c0 : (i + 1) * c0].set(wg[:, i])
    pm = mask.reshape(bp, PACK * vp0)

    b, vp, c = pw.shape
    dim = spec.dimension
    dl = dim
    hw = dim * dim
    cp = round_up(c, 8)
    res = float(spec.resolution)
    half_width = float(spec.width / 2.0)
    hwt = _row_tile(hw, dim)
    wt = jnp.swapaxes(pw, 1, 2).astype(jnp.float32)
    wt = jnp.where(pm[:, None, :], wt, 0.0)
    radii = jnp.ones((b, vp), jnp.float32)
    r2 = jnp.where(pm, 1.0, 1.0)
    xs = pc[..., 0]
    coef = -(0.5 / 0.25) / r2
    zero = jnp.zeros_like(r2)
    atom_rows = jnp.stack([xs, pc[..., 1], pc[..., 2], r2, coef, zero, zero, zero], axis=1)

    odt = jnp.dtype(out_dtype)
    ct = _channel_tile(cp, dl, hwt)
    a = _atom_chunk(vp, hwt, ct * dl * hwt * (4 + odt.itemsize), streams=1)
    nvc = vp // a
    nhwt = hw // hwt
    hrows = hwt // dim
    grid = (b, cp // ct, nhwt, nvc)
    coords_shifted = jnp.stack([xs, pc[..., 1], pc[..., 2]], axis=-1)
    ranges = _plane_ranges_closed(coords_shifted, r2, spec, dl, nhwt, hrows, a)

    range_spec = pl.BlockSpec((1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    atom_spec = pl.BlockSpec((1, 8, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)
    kern = functools.partial(
        kernel_variant, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hrows, dim=dim,
        res=res, half_width=half_width, nvc=nvc, out_dtype=odt, **flags,
    )
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[range_spec, atom_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), odt),
        scratch_shapes=[pltpu.VMEM((ct, dl, hwt), jnp.float32)],
    )(ranges, atom_rows, wt)
    return out


def make_loop(**flags):
    coords = jnp.asarray(coords0)
    weights = jnp.asarray(weights0)
    mask = jnp.asarray(mask0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, coords)
            out = run_variant(crd, weights, mask, **flags)
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
    return (best - base) / ((iters - 1) * BATCH) * 1e6


if __name__ == "__main__":
    base = measure(make_loop())
    print(f"baseline (local v5 copy, fp8):      {base:6.2f} us/mol")
    nosel = measure(make_loop(sel=False))
    print(f"no-select (timing only):            {nosel:6.2f} us/mol  -> select = {base - nosel:5.2f}")
    nofill = measure(make_loop(fill=False))
    print(f"no-zero-fill (timing only):         {nofill:6.2f} us/mol  -> fill   = {base - nofill:5.2f}")
    st = measure(make_loop(store=True))
    print(f"store+edge-fill (valid nvc==1):     {st:6.2f} us/mol  -> RMW    = {base - st:5.2f}")
    p2 = measure(make_loop(pstack=2))
    print(f"2-plane unroll:                     {p2:6.2f} us/mol")

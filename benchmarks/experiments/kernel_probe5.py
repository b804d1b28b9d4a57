"""Probe 5: kernel v7 — whole-grid-resident contiguous output block +
4-plane-stacked HIGHEST matmuls.

Design, from probe3/4 measurements:
- The v4/v5 output path writes at ~220 GB/s (strided (1, ct, dl, hwt) blocks):
  ~19 us/mol of a 21 us/mol floor.  v7 makes the out block the whole per-item
  grid (1, Cp, Dl, HW) in API layout — one contiguous DMA, no transpose.
- Each HIGHEST dot_general costs ~6 setup-dominated passes (~430 ns); v7
  stacks 4 depth planes into one (Cp, A) @ (A, 4*HWt) matmul (ex folded into
  the dens N-side instead of the wt M-side).
- hw tiles loop *inside* the kernel (static); plane ranges per (tile, chunk)
  come from SMEM; the 4-plane groups are aligned so overshoot planes have
  reach == false and contribute exact zeros.

Run: timeout 580 python benchmarks/experiments/kernel_probe5.py [check]
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


def _kernel_v7(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, dens_ref, *,
               dl, a, cp, hwt, hrows, ntiles, pstack, precision):
    vc = pl.program_id(1)

    @pl.when(vc == 0)
    def _():
        o_ref[0] = jnp.zeros((cp, dl, hwt * ntiles), jnp.float32)

    wt = wt_ref[0]
    coef = coef_ref[0]

    for ht in range(ntiles):
        dy2 = dy2_ref[0, ht * hrows : (ht + 1) * hrows, :]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        eyz = jnp.exp(dyz2 * coef)
        d_lo = range_ref[0, ht, 0]
        d_hi = range_ref[0, ht, 1]
        lo = (d_lo // pstack) * pstack
        n = (d_hi - lo + pstack - 1) // pstack

        def body(i, carry, *, dyz2=dyz2, eyz=eyz, ht=ht):
            d = pl.multiple_of(lo + i * pstack, pstack)
            for p in range(pstack):
                th = thresh_ref[0, pl.ds(d + p, 1), :]  # (1, A)
                exr = ex_ref[0, pl.ds(d + p, 1), :]
                dens_ref[p * hwt : (p + 1) * hwt, :] = jnp.where(dyz2 <= th, eyz * exr, 0.0)
            acc = jax.lax.dot_general(
                wt, dens_ref[:, :], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (Cp, P*HWt)
            for p in range(pstack):
                # numpy-style acc[:, None, p*hwt:...] lowers to a gather, which
                # Mosaic rejects; explicit slice + expand_dims lowers cleanly.
                accp = jax.lax.slice_in_dim(acc, p * hwt, (p + 1) * hwt, axis=1)
                o_ref[0, :, pl.ds(d + p, 1), ht * hwt : (ht + 1) * hwt] += jnp.expand_dims(accp, 1)
            return carry

        jax.lax.fori_loop(0, n, body, 0)


def run_v7(pc, pw, pr, pm, *, precision=HI, hwt_rows=16, pstack=4):
    b, vp, c = pw.shape
    r = jnp.broadcast_to(pr[None], (b, vp))
    pc, pw, r, pm = pd._sort_atoms_spatially(pc, pw, r, pm, spec, 0)
    dx2, dy2_t, dz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = pd._prepare_axes(pc, pw, pm, spec, 0, None)
    r2 = jnp.where(pm, r * r, 1.0)
    thresh = r2[:, None, :] - dx2
    hwt = hwt_rows * dim
    a = 128
    nvc = vp // a
    ntiles = hw // hwt
    grid = (b, nvc)

    # per-(tile, chunk) ranges -> (B*nvc, ntiles, 2) SMEM blocks
    ranges = pd._plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)  # (B*ntiles*nvc, 1, 2)
    ranges = ranges.reshape(b, ntiles, nvc, 2).transpose(0, 2, 1, 3).reshape(b * nvc, ntiles, 2)
    thresh_rows = _chunk_dl_a(thresh, a)
    coef = -(0.5 / (SIGMA * SIGMA)) / r2
    ex_rows = _chunk_dl_a(jnp.exp(dx2 * coef[:, None, :]), a)
    coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)

    range_spec = pl.BlockSpec((1, ntiles, 2), lambda bb, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, dl, a), lambda bb, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, dim, a), lambda bb, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, cp, a), lambda bb, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, cp, dl, hw), lambda bb, vc: (bb, 0, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_v7, dl=dl, a=a, cp=cp, hwt=hwt, hrows=hwt_rows,
                          ntiles=ntiles, pstack=pstack, precision=precision),
        grid=grid,
        in_specs=[range_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, a), lambda bb, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                  dy2_spec, dy2_spec, wt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((pstack * hwt, a), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=pd._interpret(),
    )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    return out


def mk(pack=2, rep=1, **kw):
    """rep>1 tiles the batch rep x to probe amortization of fixed per-step costs."""
    def step(key):
        pc, pw, pr, pm = transform_and_pack(key, pack)
        if rep > 1:
            pc = jnp.tile(pc, (rep, 1, 1))
            # decorrelate the copies so no two batch entries are identical
            pc = pc + jax.random.normal(key, (pc.shape[0], 1, 3)) * 0.3
            pw = jnp.tile(pw, (rep, 1, 1))
            pm = jnp.tile(pm, (rep, 1))
        out = run_v7(pc, pw, pr, pm, **kw)
        return out[:, :1, ::16, ::128]
    return step


if __name__ == "__main__":
    if "check" in sys.argv:
        from benchmarks.experiments.kernel_probe2 import run_v6
        pc, pw, pr, pm = transform_and_pack(jax.random.PRNGKey(3), 2)
        base = run_v6(pc, pw, pr, pm, precision=HI, subl=False, dlout=False)
        for ps in (1, 2, 4, 8):
            out = run_v7(pc, pw, pr, pm, pstack=ps)
            print(f"v7 pstack={ps}: max err {float(jnp.max(jnp.abs(out - base))):.2e}", flush=True)
        sys.exit(0)
    import benchmarks.experiments.kernel_probe3 as p3  # installs range patch

    def floor_mk(**kw):
        def step(key):
            p3.MODE["mode"] = "floor"
            try:
                return mk(**kw)(key)
            finally:
                p3.MODE["mode"] = None
        return step

    todo = [
        ("v7-p4", mk(pstack=4), 1),
        ("v7-p2", mk(pstack=2), 1),
        ("v7-p8", mk(pstack=8), 1),
        ("v7-p4-x4", mk(pstack=4, rep=4), 4),
        ("v7-p4-x8", mk(pstack=4, rep=8), 8),
        ("v7-floor-x4", floor_mk(pstack=1, rep=4), 4),
        ("v7-p4-bf16", mk(pstack=4, precision=jax.lax.Precision.DEFAULT), 1),
    ]
    for name, fn, rep in todo:
        try:
            us = measure(fn) * 1e6 / rep
            print(f"{name:12s} {us:8.2f} us/mol  ({1e6 / us:,.0f} mols/s)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

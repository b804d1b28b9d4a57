"""Fused Pallas TPU deposit kernels.

The hot loop of the reference is cdist -> density -> matmul over a
materialized voxel meshgrid, staged through HBM-sized temporaries
(/root/reference/molvoxel/voxelizer/numpy/voxelizer.py:531-560 and the numba
triple loops, numba/func_features.py).  Here the whole pipeline is one fused
kernel built around five TPU-specific ideas (evolved through on-chip
measurement; see CLAUDE.md for the measurement discipline this hardware
requires):

1. **Transposed tiles.**  Per-atom data lives voxels-on-sublanes x
   atoms-on-lanes, so every per-atom scalar (cutoff threshold, gaussian plane
   factor) is a (1, A) row that broadcasts natively — no relayouts in the
   inner loop.
2. **Separable factorization.**  exp(coef*(dx^2+dy^2+dz^2)) splits into a
   per-plane factor ex[v,d] folded into the weight matrix (O(Ct*A) per plane)
   and a cross-plane factor eyz[v,hw]; the radius cutoff d^2 <= r^2 becomes
   dyz^2 <= thresh[v,d] with thresh = r^2 - dx^2 precomputed.  Per-element
   work: one compare + one select, then an MXU matmul.
3. **Nothing O(V*HW) ever exists.**  For whole-h-row tiles, dyz2 and eyz are
   rebuilt *inside* the kernel from dy2 (V,H) and dz2 (V,W) vectors — the
   distance/density matrices are never materialized in HBM nor streamed.
4. **Active plane ranges.**  The set of depth planes an atom chunk reaches is
   a contiguous interval (thresh is a downward parabola in d); each (tile,
   chunk) program zero-fills once and loops only its precomputed
   [d_lo, d_hi), skipping tile construction entirely when empty.
5. **Spatial atom sorting.**  Atoms are pre-sorted by (x-slab, y, z) cell so
   128-lane chunks are spatially local and the ranges are tight (deposition
   is permutation-invariant).  This is the TPU analog of the reference's
   host-side block binning (numpy/voxelizer.py:496-527) without its
   half-voxel boundary bug.

The depth loop lives in-kernel (grid = batch x channel-tile x hw-tile x
atom-chunk): per-grid-step pipeline overhead (~0.2us) otherwise dominates
this workload.  One program instance owns one output tile: race-free by
construction, no scatter/atomics (the torch backend's scatter_add_,
torch/voxelizer.py:378, becomes the same matmul via one-hot weights).  The
batch axis is a native leading grid dimension (vmap-of-pallas_call
miscompiles in this toolchain).

Padding: V pads to a multiple of 128 (core.config.atom_bucket) with weights
zeroed; C pads to a multiple of 8 with zero weight rows; grids whose H*W is
not a multiple of 128 fall back to a streamed-tile variant with the same
semantics.  Exactness: the cutoff compare is bit-for-bit the numpy-reference
semantics; exp(a)*exp(b) vs exp(a+b) differs ~1e-7 relative, far inside the
1e-5 parity budget (tests/test_parity_golden.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from molvoxel_tpu.core.config import GridSpec, round_up
from molvoxel_tpu.ops.dense import _axis_positions

BIG = 1e30  # padded-voxel squared distance: density underflows to exactly 0
_VMEM_BUDGET = 13 * 2**20
_OUT_BUDGET = 5 * 2**20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------- tiling


def _hw_tile(hwp: int, target: int = 1024) -> int:
    """Largest multiple-of-128 divisor of hwp that is <= target."""
    best = 128
    t = 128
    while t <= hwp:
        if hwp % t == 0 and t <= target:
            best = t
        t += 128
    return best


def _channel_tile(cp: int, dl: int, hwt: int) -> int:
    best = 8
    ct = 8
    while ct <= cp:
        if cp % ct == 0 and ct * dl * hwt * 4 <= _OUT_BUDGET:
            best = ct
        ct += 8
    return best


def _atom_chunk(vp: int, hwt: int, out_bytes: int, streams: int) -> int:
    """Largest atom chunk (multiple of 128, divides Vp) fitting VMEM."""
    budget = _VMEM_BUDGET - out_bytes
    a_max = max(128, budget // (streams * 2 * hwt * 4 + hwt * 4))  # double-buffered streams + dens temp
    best = 128
    a = 128
    while a <= vp:
        if vp % a == 0 and a <= a_max:
            best = a
        a += 128
    return best


def pallas_supported(spec: GridSpec, num_channels: int) -> bool:
    """True when some (8, Dl, hwt) output tile fits the VMEM budget.

    The v4 kernel (whole-row tiles) covers all standard dimensions; odd
    dimensions fall back to streamed tiles with the same ceiling.  Beyond it
    (very large depth), use depth-sharding (parallel.voxelize_depth_sharded)
    or impl="dense"."""
    return 8 * spec.dimension * 128 * 4 <= _OUT_BUDGET


def _tiles(vp: int, cp: int, dl: int, hwp: int, streams: int):
    hwt = _hw_tile(hwp)
    ct = _channel_tile(cp, dl, hwt)
    while ct == 8 and 8 * dl * hwt * 4 > _OUT_BUDGET and hwt > 128:
        hwt //= 2
        ct = _channel_tile(cp, dl, hwt)
    if 8 * dl * hwt * 4 > _OUT_BUDGET:
        raise ValueError(f"depth {dl} too large for the VMEM output budget")
    a = _atom_chunk(vp, hwt, ct * dl * hwt * 4, streams)
    return ct, a, hwt


def _sort_atoms_spatially(coords, weights, radii, mask, spec, d_offset):
    """Reorder atoms by (x-slab, y, z) cell so 128-lane chunks are spatially
    local.

    Deposition is permutation-invariant, but the skip flags test whole
    atom chunks: with arbitrary atom order a chunk of a protein spans the
    entire box and every (chunk, tile, plane) is flagged active.  Lexicographic
    cell sort makes chunks ~slab-local, so flags prune the vast majority of
    the V x N work (the useful pairs are ~0.1% for protein-scale inputs).
    Padded atoms sort to the end (key = +inf-ish).
    """
    b, vp, _ = coords.shape
    bits = 5
    cells = (1 << bits) - 1
    lb = jnp.asarray(spec.lower_bound, jnp.float32)
    scale = cells / jnp.asarray(max(spec.width, 1e-6), jnp.float32)
    cell = jnp.clip(((coords - lb) * scale), 0, cells).astype(jnp.int32)  # (B, Vp, 3)
    key = (cell[..., 0] << (2 * bits)) | (cell[..., 1] << bits) | cell[..., 2]
    if mask is not None:
        key = jnp.where(mask, key, jnp.int32(1 << 30))
    order = jnp.argsort(key, axis=1)  # (B, Vp)
    take = lambda arr: jnp.take_along_axis(arr, order[..., None], axis=1) if arr.ndim == 3 else jnp.take_along_axis(arr, order, axis=1)
    coords = take(coords)
    weights = take(weights)
    if radii.ndim == 2:
        radii = take(radii)
    if mask is not None:
        mask = take(mask)
    return coords, weights, radii, mask


# ------------------------------------------------------------------- prepare


def _prepare_axes(coords, weights, mask, spec, d_offset, d_count):
    """Per-axis precompute: dx2 (B, Dl, Vp), dy2_t (B, H, Vp), dz2_t (B, W, Vp),
    wt (B, Cp, Vp) — O(V*(D+H+W)) arrays only."""
    b, vp, c = weights.shape
    dim = spec.dimension
    dl = dim if d_count is None else d_count
    hw = dim * dim
    hwp = round_up(hw, 128)
    cp = round_up(max(c, 1), 8)
    dtype = jnp.float32

    ax = _axis_positions(spec, dtype)
    axd = _axis_positions(spec, dtype, d_offset, d_count) if d_count is not None else ax

    dx = axd[None, :, None] - coords[:, None, :, 0]
    dy = ax[None, :, None] - coords[:, None, :, 1]
    dz = ax[None, :, None] - coords[:, None, :, 2]

    wt = jnp.swapaxes(weights, 1, 2).astype(dtype)  # (B, C, Vp)
    if mask is not None:
        wt = jnp.where(mask[:, None, :], wt, 0.0)
    if cp != c:
        wt = jnp.pad(wt, ((0, 0), (0, cp - c), (0, 0)))
    return dx * dx, dy * dy, dz * dz, wt, (b, vp, c, cp, dim, dl, hw, hwp)


def _prepare_common(coords, weights, mask, spec, d_offset, d_count):
    """XLA-side precompute shared by all kernel variants (batched shapes).

    coords: (B, Vp, 3); weights: (B, Vp, C); mask: (B, Vp) or None.
    Returns dx2 (B, Dl, Vp), dyz2_t (B, HWp, Vp), wt (B, Cp, Vp), dims.
    """
    b, vp, c = weights.shape
    dim = spec.dimension
    dl = dim if d_count is None else d_count
    hw = dim * dim
    hwp = round_up(hw, 128)
    cp = round_up(max(c, 1), 8)
    dtype = jnp.float32

    ax = _axis_positions(spec, dtype)  # (dim,)
    axd = _axis_positions(spec, dtype, d_offset, d_count) if d_count is not None else ax  # (Dl,)

    # (B, Dl, Vp): depth-axis squared deltas, atoms on lanes
    dx = axd[None, :, None] - coords[:, None, :, 0]
    dx2 = dx * dx
    # (B, H, Vp) and (B, W, Vp) -> (B, HWp, Vp) cross-plane squared distance
    dy = ax[None, :, None] - coords[:, None, :, 1]
    dz = ax[None, :, None] - coords[:, None, :, 2]
    dyz2 = (dy * dy)[:, :, None, :] + (dz * dz)[:, None, :, :]  # (B, H, W, Vp)
    dyz2_t = dyz2.reshape(b, hw, vp)
    if hwp != hw:
        dyz2_t = jnp.pad(dyz2_t, ((0, 0), (0, hwp - hw), (0, 0)), constant_values=BIG)

    wt = jnp.swapaxes(weights, 1, 2).astype(dtype)  # (B, C, Vp)
    if mask is not None:
        wt = jnp.where(mask[:, None, :], wt, 0.0)
    if cp != c:
        wt = jnp.pad(wt, ((0, 0), (0, cp - c), (0, 0)))
    return dx2, dyz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp)


def _rows(x):
    """(B, Dl, Vp) -> (B, 1, Dl*Vp) row layout for (1, A) lane-blocked specs."""
    b = x.shape[0]
    return x.reshape(b, 1, -1)


# ------------------------------------------------------------------- kernels


def _kernel_gaussian(flag_ref, thresh_ref, ex_ref, dyz2_ref, eyz_ref, wt_ref, o_ref, *,
                     dl: int, a: int, ct: int, hwt: int):
    """Streamed-chunk kernel with the depth loop in-kernel.

    Grid = (batch, channel-tile, hw-tile, atom-chunk); all Dl depth planes of
    one (chunk, tile) pair run inside a fori_loop against resident blocks, so
    per-grid-step pipeline overhead is amortized over the whole depth axis
    (measured: this overhead, ~0.2us/step, dominated the V x N compute at
    ligand and protein scale alike).  Skip flags gate each plane: an inactive
    plane costs one SMEM read and, on the first chunk, a zero-fill."""
    vc = pl.program_id(3)
    dyz2 = dyz2_ref[0]  # (HWt, A)
    eyz = eyz_ref[0]
    wt = wt_ref[0]  # (Ct, A)
    first = vc == 0

    def body(d, carry):
        active = flag_ref[0, 0, d] > 0

        @pl.when(active)
        def _():
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]  # (1, A)
            exr = ex_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, eyz, 0.0)
            # measured on-chip: a manual bf16x4 split is only ~6% faster than
            # HIGHEST here (MXU overlaps the VPU mask pass) and costs accuracy
            acc = jax.lax.dot_general(
                wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )

            @pl.when(first)
            def _():
                o_ref[0, :, pl.ds(d, 1), :] = acc[:, None, :]

            @pl.when(jnp.logical_not(first))
            def _():
                o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]

        @pl.when(jnp.logical_and(first, jnp.logical_not(active)))
        def _():
            o_ref[0, :, pl.ds(d, 1), :] = jnp.zeros((ct, 1, hwt), jnp.float32)

        return carry

    jax.lax.fori_loop(0, dl, body, 0)


def _kernel_binary(flag_ref, thresh_ref, dyz2_ref, wt_ref, o_ref, *, dl: int, a: int, ct: int, hwt: int):
    vc = pl.program_id(3)
    dyz2 = dyz2_ref[0]
    wt = wt_ref[0]
    first = vc == 0

    def body(d, carry):
        active = flag_ref[0, 0, d] > 0

        @pl.when(active)
        def _():
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, 1.0, 0.0)
            acc = jax.lax.dot_general(
                wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )

            @pl.when(first)
            def _():
                o_ref[0, :, pl.ds(d, 1), :] = acc[:, None, :]

            @pl.when(jnp.logical_not(first))
            def _():
                o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]

        @pl.when(jnp.logical_and(first, jnp.logical_not(active)))
        def _():
            o_ref[0, :, pl.ds(d, 1), :] = jnp.zeros((ct, 1, hwt), jnp.float32)

        return carry

    jax.lax.fori_loop(0, dl, body, 0)


def _kernel_channelwise(dx2_ref, dyz2_ref, wt_ref, r2c_ref, coefc_ref, o_ref, *, ct: int, gaussian: bool):
    vc = pl.program_id(3)
    d = pl.program_id(4)
    d2 = dyz2_ref[0] + dx2_ref[0]  # (HWt, A) + (1, A)
    rows = []
    for ci in range(ct):
        r2 = r2c_ref[0, ci]
        if gaussian:
            dens = jnp.where(d2 <= r2, jnp.exp(d2 * coefc_ref[0, ci]), 0.0)
        else:
            dens = jnp.where(d2 <= r2, 1.0, 0.0)
        rows.append(
            jax.lax.dot_general(
                wt_ref[0, ci : ci + 1, :], dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
        )
    acc = jnp.concatenate(rows, axis=0)  # (Ct, HWt)

    @pl.when(vc == 0)
    def _():
        o_ref[0, :, pl.ds(d, 1), :] = acc[:, None, :]

    @pl.when(vc > 0)
    def _():
        o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]


def _row_tile(hw: int, w: int, target: int = 1024) -> int | None:
    """Whole-row hw tile: multiple of both W and 128, divides hw, <= ~target.

    Enables in-kernel dyz2 reconstruction (kernel v4): a tile spanning whole
    h-rows factorizes as dy2-rows + dz2, so the O(V*HW) distance matrix never
    exists — not in HBM, not even as a kernel input stream.
    """
    if hw % 128 != 0:
        return None
    import math as _math

    step = w * 128 // _math.gcd(w, 128)
    best = None
    t = step
    while t <= hw:
        # Mosaic block legality: the dy2 block's sublane dim is t // w rows,
        # which must be a multiple of 8 or the whole H axis (= w rows).
        rows = t // w
        if hw % t == 0 and (rows % 8 == 0 or rows == w):
            if t <= target or best is None:
                best = t
            if t > target:
                break
        t += step
    return best


def _kernel_gaussian_v4(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref, o_ref, *,
                        dl: int, a: int, ct: int, hwt: int, hrows: int):
    """v4: dyz2/eyz rebuilt in-kernel from per-axis factors; depth loop runs
    only the precomputed active plane range.

    HBM traffic per (tile, chunk) drops from O(HWt*A) streamed matrices to
    O((hrows + W + Dl) * A) vectors; the exp runs once per tile on the VPU
    (it is plane-independent).  The set of planes an atom chunk reaches is a
    contiguous interval in d (thresh is a downward parabola), so instead of
    per-plane flags the kernel loops [d_lo, d_hi) and skips everything —
    including the dyz2/eyz construction — when the interval is empty."""
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        o_ref[0] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]  # (hrows, A)
        dz2 = dz2_ref[0]  # (W, A)
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        eyz = jnp.exp(dyz2 * coef_ref[0])  # (HWt, A) * (1, A)
        wt = wt_ref[0]

        def body(d, carry):
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            exr = ex_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, eyz, 0.0)
            acc = jax.lax.dot_general(
                wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)


def _kernel_gaussian_v4_cast(range_ref, thresh_ref, ex_ref, coef_ref, dy2_ref, dz2_ref, wt_ref,
                             o_ref, acc_ref, *, dl: int, a: int, ct: int, hwt: int, hrows: int,
                             nvc: int, out_dtype, lowp: bool):
    """v4 with a reduced-precision output tile (the write-wall breaker).

    The exact ligand path is bound by the out-block VMEM->HBM copy
    (~160 GB/s on this chip; 4.19 MB of f32 grid = 21.3 us/mol floor,
    docs/DESIGN.md).  Accumulation moves to an f32 VMEM scratch — same
    per-plane RMW stores as the f32 kernel, which are legal on f32 — and the
    *out block* becomes bf16, emitted as ONE aligned full-tile cast-store at
    the last atom chunk.  No dynamic-slice store ever touches the bf16 ref
    (1-wide sublane stores on bf16 blocks crash the Mosaic compiler).

    ``lowp`` additionally runs the per-plane matmul on bf16 inputs (single
    MXU pass vs HIGHEST's 6): with a bf16 output the quantization floor is
    already 2^-8 relative, so the f32-accumulated bf16 matmul (~same error)
    is free accuracy-wise and removes the compute term that would otherwise
    replace the write as the bottleneck."""
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        acc_ref[...] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        eyz = jnp.exp(dyz2 * coef_ref[0])
        wt = wt_ref[0]
        if lowp:
            eyz = eyz.astype(jnp.bfloat16)

        def body(d, carry):
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            exr = ex_ref[0, 0:1, pl.ds(off, a)]
            if lowp:
                dens = jnp.where(dyz2 <= th, eyz, jnp.bfloat16(0.0))
                m = (wt * exr).astype(jnp.bfloat16)
                acc = jax.lax.dot_general(
                    m, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dens = jnp.where(dyz2 <= th, eyz, 0.0)
                acc = jax.lax.dot_general(
                    wt * exr, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )
            acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)

    @pl.when(vc == nvc - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(out_dtype)


def _kernel_binary_v4_cast(range_ref, thresh_ref, dy2_ref, dz2_ref, wt_ref, o_ref, acc_ref, *,
                           dl: int, a: int, ct: int, hwt: int, hrows: int, nvc: int,
                           out_dtype, lowp: bool):
    vc = pl.program_id(3)

    @pl.when(vc == 0)
    def _():
        acc_ref[...] = jnp.zeros((ct, dl, hwt), jnp.float32)

    d_lo = range_ref[0, 0, 0]
    d_hi = range_ref[0, 0, 1]

    @pl.when(d_hi > d_lo)
    def _():
        dy2 = dy2_ref[0]
        dz2 = dz2_ref[0]
        dyz2 = (dy2[:, None, :] + dz2[None, :, :]).reshape(hwt, a)
        wt = wt_ref[0]
        if lowp:
            wt = wt.astype(jnp.bfloat16)

        def body(d, carry):
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            if lowp:
                dens = jnp.where(dyz2 <= th, jnp.bfloat16(1.0), jnp.bfloat16(0.0))
                acc = jax.lax.dot_general(
                    wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dens = jnp.where(dyz2 <= th, 1.0, 0.0)
                acc = jax.lax.dot_general(
                    wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )
            acc_ref[:, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)

    @pl.when(vc == nvc - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(out_dtype)


def _kernel_binary_v4(range_ref, thresh_ref, dy2_ref, dz2_ref, wt_ref, o_ref, *,
                      dl: int, a: int, ct: int, hwt: int, hrows: int):
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
        wt = wt_ref[0]

        def body(d, carry):
            off = pl.multiple_of(d * a, 128)
            th = thresh_ref[0, 0:1, pl.ds(off, a)]
            dens = jnp.where(dyz2 <= th, 1.0, 0.0)
            acc = jax.lax.dot_general(
                wt, dens, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            o_ref[0, :, pl.ds(d, 1), :] += acc[:, None, :]
            return carry

        jax.lax.fori_loop(d_lo, d_hi, body, 0)


def _plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a):
    """(B*nhwt*nvc, 1, 2) int32 [d_lo, d_hi) active plane ranges per (tile, chunk).

    Tile minimum of dyz2 factorizes exactly for whole-row tiles
    (min_h dy2 + min_w dz2); an atom chunk's reach along d is the union of
    per-atom intervals, covered conservatively by [first, last+1) of the
    any-atom activity mask."""
    b, h, vp = dy2_t.shape
    dl = thresh.shape[1]
    hw_rows = hwt // dz2_t.shape[1]
    nhwt = h // hw_rows
    nvc = vp // a
    minh = dy2_t.reshape(b, nhwt, hw_rows, vp).min(axis=2)  # (B, nhwt, Vp)
    minz = dz2_t.min(axis=1)  # (B, Vp)
    min_tile = minh + minz[:, None, :]
    reach = min_tile[:, :, None, :] <= thresh[:, None, :, :]  # (B, nhwt, Dl, Vp)
    act = jnp.swapaxes(reach.reshape(b, nhwt, dl, nvc, a).any(axis=4), 2, 3)  # (B, nhwt, nvc, Dl)
    any_act = act.any(axis=-1)
    lo = jnp.argmax(act, axis=-1).astype(jnp.int32)
    hi = (dl - jnp.argmax(act[..., ::-1], axis=-1)).astype(jnp.int32)
    lo = jnp.where(any_act, lo, 0)
    hi = jnp.where(any_act, hi, 0)
    return jnp.stack([lo, hi], axis=-1).reshape(b * nhwt * nvc, 1, 2)


# ------------------------------------------------------------------ wrappers


def _chunk_rows(x, a):
    """(B, Dl, Vp) -> (B*nvc, 1, Dl*A): per-atom-chunk all-planes rows.

    Row b*nvc+vc holds [d*A + j] = x[b, d, vc*A + j] — contiguous per chunk so
    the kernel's per-plane (1, A) slice is a 128-aligned lane window."""
    b, dl, vp = x.shape
    nvc = vp // a
    return x.reshape(b, dl, nvc, a).transpose(0, 2, 1, 3).reshape(b * nvc, 1, dl * a)


def _skip_flags3(dyz2_t, thresh, hwt, a):
    """(B*nhwt*nvc, 1, Dl) int32 plane-activity flags (see _skip_flags doc)."""
    b, hwp, vp = dyz2_t.shape
    dl = thresh.shape[1]
    nhwt = hwp // hwt
    nvc = vp // a
    min_tile = dyz2_t.reshape(b, nhwt, hwt, vp).min(axis=2)  # (B, nhwt, Vp)
    reach = min_tile[:, :, None, :] <= thresh[:, None, :, :]  # (B, nhwt, Dl, Vp)
    flags = reach.reshape(b, nhwt, dl, nvc, a).any(axis=4)  # (B, nhwt, Dl, nvc)
    return jnp.swapaxes(flags, 2, 3).reshape(b * nhwt * nvc, 1, dl).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("spec", "density_type", "sigma", "d_count", "out_dtype"))
def voxelize_pallas_batch(
    coords: jnp.ndarray,  # (B, Vp, 3)
    weights: jnp.ndarray,  # (B, Vp, C)
    radii: jnp.ndarray,  # (Vp,) shared or (B, Vp)
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    mask: jnp.ndarray | None = None,  # (B, Vp)
    d_offset=0,
    d_count: int | None = None,
    out_dtype: str = "float32",
) -> jnp.ndarray:
    """Batched fused deposit -> (B, C, Dl, H, W).  Per-atom radii.

    ``out_dtype``: "float32" (parity default) or "bfloat16".  bf16 grids halve
    the output-write bytes — the measured wall of the exact ligand path (see
    _kernel_gaussian_v4_cast) — and are the natural input dtype for CNN
    training consumers; accumulation stays f32 in VMEM, only the final HBM
    tile is cast."""
    gaussian = density_type == "gaussian"
    b, vp, c = weights.shape
    radii = jnp.asarray(radii, jnp.float32)
    if radii.ndim == 1:
        radii = jnp.broadcast_to(radii[None, :], (b, vp))
    # The kernel's atom-chunk block specs need Vp % 128 == 0 (TPU lane width).
    # Unbatched API calls arrive at the small-molecule bucket (32/64, see
    # core.config.small_atom_bucket); pad to one chunk with far-away zero-
    # weight atoms — their plane ranges are empty, so they cost nothing.
    vpad = round_up(vp, 128) - vp
    if vpad:
        coords = jnp.pad(coords, ((0, 0), (0, vpad), (0, 0)), constant_values=1e3)
        weights = jnp.pad(weights, ((0, 0), (0, vpad), (0, 0)))
        radii = jnp.pad(radii, ((0, 0), (0, vpad)), constant_values=1.0)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, vpad)))
        vp += vpad
    if vp > 128:
        coords, weights, radii, mask = _sort_atoms_spatially(coords, weights, radii, mask, spec, d_offset)
    dim = spec.dimension
    dl_eff = dim if d_count is None else d_count
    hwt_rows = _row_tile(dim * dim, dim)
    if hwt_rows is not None and 8 * dl_eff * hwt_rows * 4 > _OUT_BUDGET:
        hwt_rows = None  # whole-row tile can't fit VMEM (e.g. unsliced 256^3): stream tiles instead
    if hwt_rows is not None:
        return _run_v4(coords, weights, radii, mask, spec, gaussian, sigma, d_offset, d_count, hwt_rows,
                       out_dtype=out_dtype)
    # fallback for grids whose H*W is not 128-aligned: streamed dyz2/eyz tiles
    dx2, dyz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = _prepare_common(
        coords, weights, mask, spec, d_offset, d_count
    )
    r2 = radii * radii  # (B, Vp)
    if mask is not None:
        r2 = jnp.where(mask, r2, 1.0)

    thresh = r2[:, None, :] - dx2  # (B, Dl, Vp): cutoff as dyz2 <= thresh
    streams = 2 if gaussian else 1
    ct, a, hwt = _tiles(vp, cp, dl, hwp, streams)
    nvc = vp // a
    nhwt = hwp // hwt
    grid = (b, cp // ct, nhwt, nvc)

    flags = _skip_flags3(dyz2_t, thresh, hwt, a)  # (B*nhwt*nvc, 1, Dl)
    thresh_rows = _chunk_rows(thresh, a)  # (B*nvc, 1, Dl*A)
    flag_spec = pl.BlockSpec(
        (1, 1, dl), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM
    )
    row_spec = pl.BlockSpec((1, 1, dl * a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, hwt, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b * cp * vp * dl * hwp + 2 * b * vp * dl * hwp,
        bytes_accessed=b * (cp // ct) * vp * hwp * 4 * streams + b * cp * dl * hwp * 4,
        transcendentals=b * vp * hwp if gaussian else 0,
    )

    if gaussian:
        coef = -(0.5 / (sigma * sigma)) / r2  # (B, Vp)
        ex_rows = _chunk_rows(jnp.exp(dx2 * coef[:, None, :]), a)  # (B*nvc, 1, Dl*A)
        out = pl.pallas_call(
            functools.partial(_kernel_gaussian, dl=dl, a=a, ct=ct, hwt=hwt),
            grid=grid,
            in_specs=[flag_spec, row_spec, row_spec, tile_spec, tile_spec, wt_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, cp, dl, hwp), jnp.float32),
            cost_estimate=cost,
            interpret=_interpret(),
        )(flags, thresh_rows, ex_rows, dyz2_t, jnp.exp(dyz2_t * coef[:, None, :]), wt)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_binary, dl=dl, a=a, ct=ct, hwt=hwt),
            grid=grid,
            in_specs=[flag_spec, row_spec, tile_spec, wt_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, cp, dl, hwp), jnp.float32),
            cost_estimate=cost,
            interpret=_interpret(),
        )(flags, thresh_rows, dyz2_t, wt)
    out = out[:, :c, :, :hw].reshape(b, c, dl, dim, dim)
    # streamed fallback keeps f32 out blocks; the cast is an XLA epilogue here
    # (correct, just not write-reduced — only non-128-aligned H*W lands here)
    return out if out_dtype == "float32" else out.astype(out_dtype)


def _run_v4(coords, weights, radii, mask, spec, gaussian, sigma, d_offset, d_count, hwt,
            out_dtype: str = "float32"):
    """v4 launch: per-axis inputs only, dyz2/eyz rebuilt in-kernel."""
    dx2, dy2_t, dz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = _prepare_axes(
        coords, weights, mask, spec, d_offset, d_count
    )
    r2 = radii * radii
    if mask is not None:
        r2 = jnp.where(mask, r2, 1.0)
    thresh = r2[:, None, :] - dx2  # (B, Dl, Vp)

    cast = out_dtype != "float32"
    odt = jnp.dtype(out_dtype)
    ct = _channel_tile(cp, dl, hwt)
    # per-step VMEM working set: dyz2 + eyz + dens tiles of (hwt, a);
    # the cast path adds an f32 scratch accumulator next to the smaller out block
    out_bytes = ct * dl * hwt * (4 + odt.itemsize) if cast else ct * dl * hwt * 4
    a = _atom_chunk(vp, hwt, out_bytes, streams=1)
    nvc = vp // a
    nhwt = hw // hwt
    hrows = hwt // dim
    grid = (b, cp // ct, nhwt, nvc)

    ranges = _plane_ranges_axes(dy2_t, dz2_t, thresh, hwt, a)  # (B*nhwt*nvc, 1, 2)
    thresh_rows = _chunk_rows(thresh, a)  # (B*nvc, 1, Dl*A)
    range_spec = pl.BlockSpec(
        (1, 1, 2), lambda bb, cb, ht, vc: ((bb * nhwt + ht) * nvc + vc, 0, 0), memory_space=pltpu.SMEM
    )
    row_spec = pl.BlockSpec((1, 1, dl * a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM)
    dy2_spec = pl.BlockSpec((1, hrows, a), lambda bb, cb, ht, vc: (bb, ht, vc), memory_space=pltpu.VMEM)
    dz2_spec = pl.BlockSpec((1, dim, a), lambda bb, cb, ht, vc: (bb, 0, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc: (bb, cb, vc), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc: (bb, cb, 0, ht), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * b * cp * vp * dl * hw + 2 * b * vp * dl * hw,
        bytes_accessed=b * vp * (dim * 2 + dl) * 4 + b * cp * dl * hw * 4,
        transcendentals=b * (cp // ct) * vp * hw if gaussian else 0,
    )

    scratch = [pltpu.VMEM((ct, dl, hwt), jnp.float32)] if cast else []
    lowp = cast  # bf16 out -> bf16-input matmul: quantization floor already 2^-8
    if gaussian:
        coef = -(0.5 / (sigma * sigma)) / r2  # (B, Vp)
        ex_rows = _chunk_rows(jnp.exp(dx2 * coef[:, None, :]), a)
        coef_chunks = coef.reshape(b, nvc, a).reshape(b * nvc, 1, a)
        if cast:
            kernel = functools.partial(_kernel_gaussian_v4_cast, dl=dl, a=a, ct=ct, hwt=hwt,
                                       hrows=hrows, nvc=nvc, out_dtype=odt, lowp=lowp)
        else:
            kernel = functools.partial(_kernel_gaussian_v4, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hrows)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                range_spec,
                row_spec,
                row_spec,
                pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc: (bb * nvc + vc, 0, 0), memory_space=pltpu.VMEM),
                dy2_spec,
                dz2_spec,
                wt_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), odt if cast else jnp.float32),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(ranges, thresh_rows, ex_rows, coef_chunks, dy2_t, dz2_t, wt)
    else:
        if cast:
            kernel = functools.partial(_kernel_binary_v4_cast, dl=dl, a=a, ct=ct, hwt=hwt,
                                       hrows=hrows, nvc=nvc, out_dtype=odt, lowp=lowp)
        else:
            kernel = functools.partial(_kernel_binary_v4, dl=dl, a=a, ct=ct, hwt=hwt, hrows=hrows)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[range_spec, row_spec, dy2_spec, dz2_spec, wt_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, cp, dl, hw), odt if cast else jnp.float32),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(ranges, thresh_rows, dy2_t, dz2_t, wt)
    return out[:, :c, :, :].reshape(b, c, dl, dim, dim)


@functools.partial(jax.jit, static_argnames=("spec", "density_type", "sigma", "d_count"))
def voxelize_pallas_batch_channelwise(
    coords: jnp.ndarray,
    weights: jnp.ndarray,
    radii: jnp.ndarray,  # (C,)
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    mask: jnp.ndarray | None = None,
    d_offset=0,
    d_count: int | None = None,
) -> jnp.ndarray:
    """Batched fused deposit with channel-wise radii ((C,) shared)."""
    gaussian = density_type == "gaussian"
    vp0 = coords.shape[1]
    vpad = round_up(vp0, 128) - vp0  # lane-width padding, see voxelize_pallas_batch
    if vpad:
        coords = jnp.pad(coords, ((0, 0), (0, vpad), (0, 0)), constant_values=1e3)
        weights = jnp.pad(weights, ((0, 0), (0, vpad), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, vpad)))
    dx2, dyz2_t, wt, (b, vp, c, cp, dim, dl, hw, hwp) = _prepare_common(
        coords, weights, mask, spec, d_offset, d_count
    )

    r2c = jnp.pad((radii * radii).astype(jnp.float32), (0, cp - c), constant_values=1.0)  # (Cp,)
    coefc = -(0.5 / (sigma * sigma)) / r2c
    r2c = jnp.broadcast_to(r2c[None, :], (b, cp))
    coefc = jnp.broadcast_to(coefc[None, :], (b, cp))

    ct, a, hwt = _tiles(vp, cp, dl, hwp, 1)
    nvc = vp // a
    grid = (b, cp // ct, hwp // hwt, nvc, dl)

    dx2_rows = _rows(dx2)
    row_spec = pl.BlockSpec((1, 1, a), lambda bb, cb, ht, vc, d: (bb, 0, d * nvc + vc), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, hwt, a), lambda bb, cb, ht, vc, d: (bb, ht, vc), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((1, ct, a), lambda bb, cb, ht, vc, d: (bb, cb, vc), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, ct), lambda bb, cb, ht, vc, d: (bb, cb), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, ct, dl, hwt), lambda bb, cb, ht, vc, d: (bb, cb, 0, ht), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_channelwise, ct=ct, gaussian=gaussian)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, tile_spec, wt_spec, scal_spec, scal_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, dl, hwp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cp * vp * dl * hwp + 6 * b * cp * vp * dl * hwp,
            bytes_accessed=b * (cp // ct) * vp * hwp * 4 + b * cp * dl * hwp * 4,
            transcendentals=b * cp * vp * dl * hwp if gaussian else 0,
        ),
        interpret=_interpret(),
    )(dx2_rows, dyz2_t, wt, r2c, coefc)
    return out[:, :c, :, :hw].reshape(b, c, dl, dim, dim)


# ------------------------------------------------- single-molecule wrappers


def voxelize_pallas(coords, weights, radii, *, spec, density_type="gaussian", sigma=0.5, mask=None,
                    d_offset=0, d_count=None):
    """Single-molecule fused deposit -> (C, Dl, H, W); see voxelize_pallas_batch."""
    radii = jnp.asarray(radii, jnp.float32)
    out = voxelize_pallas_batch(
        coords[None], weights[None], radii if radii.ndim == 1 else radii[None],
        spec=spec, density_type=density_type, sigma=sigma,
        mask=None if mask is None else mask[None], d_offset=d_offset, d_count=d_count,
    )
    return out[0]


def voxelize_pallas_channelwise(coords, weights, radii, *, spec, density_type="gaussian", sigma=0.5, mask=None,
                                d_offset=0, d_count=None):
    """Single-molecule channel-wise fused deposit -> (C, Dl, H, W)."""
    out = voxelize_pallas_batch_channelwise(
        coords[None], weights[None], jnp.asarray(radii, jnp.float32),
        spec=spec, density_type=density_type, sigma=sigma,
        mask=None if mask is None else mask[None], d_offset=d_offset, d_count=d_count,
    )
    return out[0]

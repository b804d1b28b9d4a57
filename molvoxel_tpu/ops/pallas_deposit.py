"""Fused Pallas TPU deposit kernel.

The hot loop of the reference is cdist -> density -> matmul over a
materialized voxel meshgrid, staged through HBM-sized temporaries
(/root/reference/molvoxel/voxelizer/numpy/voxelizer.py:531-560 and the
numba triple loops, numba/func_features.py).  Here the whole pipeline is one
Pallas kernel that never materializes the (V, N) distance matrix in HBM:

  for each (channel-tile c, atom-chunk vc, depth-plane d)   [pallas grid]
      d2   = dx2[vc-chunk, d] + dyz2[vc-chunk, :]           (VPU, A x HW)
      dens = density(d2, r2)                                (VPU, fused exp)
      out[c-tile, d, :] (+)= wT[c-tile, vc-chunk] @ dens    (MXU)

Key design points (see pallas_guide.md):
- Separable squared distances: dx2 (V, D) and dyz2 (V, H*W) are tiny
  precomputed inputs; the (A, HW) d2 tile is formed by one broadcast add.
  No voxel coordinates are ever stored (vs the reference's per-block
  meshgrid dict, numpy/voxelizer.py:46-58).
- The full (Ct, D, HWp) output tile stays resident in VMEM across the whole
  grid (constant index map), so dyz2 atom-chunks are streamed exactly once
  per channel-tile: HBM traffic is O(V*(HW + D)) per molecule, not O(V*N).
- dx2 (V, D) is small enough to keep fully VMEM-resident (constant index
  map); its per-plane (A, 1) column is sliced inside the kernel, which keeps
  every *blocked* operand on legal (8k, 128m) tile boundaries.
- One program instance owns one output tile: race-free by construction,
  no scatter/atomics (the torch backend's scatter_add_ has no TPU analog
  worth using; one-hot weights turn the types path into the same matmul).
- Accumulation initializes at the first atom-chunk (@pl.when(vc == 0)),
  mirroring the K-loop matmul pattern.

Lane padding: H*W is padded to a multiple of 128 with dyz2 = BIG so padded
voxels get zero density; V is padded by the caller to a multiple of 128
(core.config.atom_bucket) with weights zeroed; C is padded to a multiple of
8 with zero weight rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import GridSpec, round_up
from .dense import _per_axis_sq_deltas

BIG = 1e30  # padded-voxel squared distance: density underflows to exactly 0
_VMEM_BUDGET = 14 * 2**20
_OUT_BUDGET = 10 * 2**20  # max resident output tile; the rest buffers input streams


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _atom_chunk(vp: int, hwp: int, out_bytes: int) -> int:
    """Largest atom-chunk A (multiple of 128, divides Vp) fitting the VMEM budget."""
    a_max = max(128, (_VMEM_BUDGET - out_bytes) // (12 * hwp))
    best = 128
    a = 128
    while a <= vp:
        if vp % a == 0 and a <= a_max:
            best = a
        a += 128
    return best


def _channel_tile(cp: int, d: int, hwp: int) -> int | None:
    """Largest channel-tile Ct (multiple of 8, divides Cp) whose output fits VMEM."""
    best = None
    ct = 8
    while ct <= cp:
        if cp % ct == 0 and ct * d * hwp * 4 <= _OUT_BUDGET:
            best = ct
        ct += 8
    return best


def pallas_supported(spec: GridSpec, num_channels: int) -> bool:
    hwp = round_up(spec.dimension * spec.dimension, 128)
    return _channel_tile(round_up(max(num_channels, 1), 8), spec.dimension, hwp) is not None


def _deposit_kernel(dx2_ref, dyz2_ref, wt_ref, r2_ref, coef_ref, o_ref, *, gaussian: bool):
    vc = pl.program_id(1)
    d = pl.program_id(2)
    d2 = dx2_ref[...] + dyz2_ref[...]  # (A, 1) + (A, HWp)
    r2 = r2_ref[...]  # (A, 1)
    if gaussian:
        dens = jnp.where(d2 <= r2, jnp.exp(d2 * coef_ref[...]), 0.0)
    else:
        dens = jnp.where(d2 <= r2, 1.0, 0.0)
    acc = jnp.dot(wt_ref[...], dens, preferred_element_type=jnp.float32)  # (Ct, HWp)
    acc = acc[:, None, :]  # (Ct, 1, HWp)

    @pl.when(vc == 0)
    def _():
        o_ref[:, pl.ds(d, 1), :] = acc

    @pl.when(vc > 0)
    def _():
        o_ref[:, pl.ds(d, 1), :] += acc


def _deposit_channelwise_kernel(dx2_ref, dyz2_ref, wt_ref, r2c_ref, o_ref, *, gaussian: bool, ct: int, sigma: float):
    vc = pl.program_id(1)
    d = pl.program_id(2)
    d2 = dx2_ref[...] + dyz2_ref[...]  # (A, 1) + (A, HWp)
    inv_two_sigma_sq = 0.5 / (sigma * sigma)
    rows = []
    for ci in range(ct):
        r2 = r2c_ref[ci, 0]
        if gaussian:
            dens = jnp.where(d2 <= r2, jnp.exp(d2 * (-inv_two_sigma_sq / r2)), 0.0)
        else:
            dens = jnp.where(d2 <= r2, 1.0, 0.0)
        rows.append(jnp.dot(wt_ref[ci : ci + 1, :], dens, preferred_element_type=jnp.float32))
    acc = jnp.concatenate(rows, axis=0)[:, None, :]  # (Ct, 1, HWp)

    @pl.when(vc == 0)
    def _():
        o_ref[:, pl.ds(d, 1), :] = acc

    @pl.when(vc > 0)
    def _():
        o_ref[:, pl.ds(d, 1), :] += acc


def _prepare(coords, weights, radii_per_atom, mask, spec, d_offset=0, d_count=None):
    vp, c = weights.shape
    dim = spec.dimension
    hw = dim * dim
    hwp = round_up(hw, 128)
    cp = round_up(max(c, 1), 8)

    dx2, dy2, dz2 = _per_axis_sq_deltas(coords, spec, d_offset, d_count)
    dyz2 = (dy2[:, :, None] + dz2[:, None, :]).reshape(vp, hw)
    if hwp != hw:
        dyz2 = jnp.pad(dyz2, ((0, 0), (0, hwp - hw)), constant_values=BIG)

    wt = weights.T  # (C, Vp)
    if mask is not None:
        wt = jnp.where(mask[None, :], wt, 0.0)
    if cp != c:
        wt = jnp.pad(wt, ((0, cp - c), (0, 0)))

    if radii_per_atom is not None:
        r2 = radii_per_atom * radii_per_atom  # (Vp,)
        if mask is not None:
            r2 = jnp.where(mask, r2, 1.0)
    else:
        r2 = None
    return dx2, dyz2, wt, r2, hw, hwp, cp


def _tiling(vp, c, cp, dim, hwp):
    ct = _channel_tile(cp, dim, hwp)
    if ct is None:
        raise ValueError(
            f"grid {dim}^3 x {c}ch exceeds the single-kernel VMEM budget; "
            "use impl='dense' or depth-sharding (molvoxel_tpu.parallel)"
        )
    if vp % 128 != 0:
        raise ValueError(f"padded atom count must be a multiple of 128 (core.config.atom_bucket), got {vp}")
    a = _atom_chunk(vp, hwp, ct * dim * hwp * 4)
    return ct, a


@functools.partial(jax.jit, static_argnames=("spec", "density_type", "sigma", "d_count"))
def voxelize_pallas(
    coords: jnp.ndarray,
    weights: jnp.ndarray,
    radii: jnp.ndarray,
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    mask: jnp.ndarray | None = None,
    d_offset=0,
    d_count: int | None = None,
) -> jnp.ndarray:
    """Pallas TPU path of ops.dense.voxelize_dense (same contract, (V,) radii)."""
    vp, c = weights.shape
    dim = spec.dimension
    dloc = dim if d_count is None else d_count
    gaussian = density_type == "gaussian"

    dx2, dyz2, wt, r2, hw, hwp, cp = _prepare(coords, weights, radii, mask, spec, d_offset, d_count)
    coef = (-(0.5 / (sigma * sigma)) / r2)[:, None]  # (Vp, 1) gaussian exponent scale
    r2 = r2[:, None]  # (Vp, 1)

    ct, a = _tiling(vp, c, cp, dloc, hwp)
    nvc = vp // a
    grid = (cp // ct, nvc, dloc)
    # (Dl*Vp, 1) column layout: the (A, 1) per-plane atom-chunk column is pure
    # BlockSpec indexing (block d*nvc + vc), no in-kernel dynamic slicing.
    dx2cols = dx2.T.reshape(dloc * vp, 1)

    kernel = functools.partial(_deposit_kernel, gaussian=gaussian)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a, 1), lambda cb, vc, d: (d * nvc + vc, 0), memory_space=pltpu.VMEM),  # dx2 column
            pl.BlockSpec((a, hwp), lambda cb, vc, d: (vc, 0), memory_space=pltpu.VMEM),  # dyz2
            pl.BlockSpec((ct, a), lambda cb, vc, d: (cb, vc), memory_space=pltpu.VMEM),  # wT
            pl.BlockSpec((a, 1), lambda cb, vc, d: (vc, 0), memory_space=pltpu.VMEM),  # r2
            pl.BlockSpec((a, 1), lambda cb, vc, d: (vc, 0), memory_space=pltpu.VMEM),  # coef
        ],
        out_specs=pl.BlockSpec((ct, dloc, hwp), lambda cb, vc, d: (cb, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, dloc, hwp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * cp * vp * dloc * hwp + 8 * vp * dloc * hwp,
            bytes_accessed=(cp // ct) * vp * hwp * 4 + cp * dloc * hwp * 4,
            transcendentals=vp * dloc * hwp if gaussian else 0,
        ),
        interpret=_interpret(),
    )(dx2cols, dyz2, wt, r2, coef)
    return out[:c, :, :hw].reshape(c, dloc, dim, dim)


@functools.partial(jax.jit, static_argnames=("spec", "density_type", "sigma", "d_count"))
def voxelize_pallas_channelwise(
    coords: jnp.ndarray,
    weights: jnp.ndarray,
    radii: jnp.ndarray,
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    mask: jnp.ndarray | None = None,
    d_offset=0,
    d_count: int | None = None,
) -> jnp.ndarray:
    """Pallas path with channel-wise radii ((C,) radii, shared per channel)."""
    vp, c = weights.shape
    dim = spec.dimension
    dloc = dim if d_count is None else d_count
    gaussian = density_type == "gaussian"

    dx2, dyz2, wt, _, hw, hwp, cp = _prepare(coords, weights, None, mask, spec, d_offset, d_count)
    r2c = (radii * radii).astype(jnp.float32)
    r2c = jnp.pad(r2c, (0, cp - c), constant_values=1.0)[:, None]  # (Cp, 1)

    ct, a = _tiling(vp, c, cp, dloc, hwp)
    nvc = vp // a
    grid = (cp // ct, nvc, dloc)
    dx2cols = dx2.T.reshape(dloc * vp, 1)

    kernel = functools.partial(_deposit_channelwise_kernel, gaussian=gaussian, ct=ct, sigma=sigma)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a, 1), lambda cb, vc, d: (d * nvc + vc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, hwp), lambda cb, vc, d: (vc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, a), lambda cb, vc, d: (cb, vc), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda cb, vc, d: (cb, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ct, dloc, hwp), lambda cb, vc, d: (cb, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, dloc, hwp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * cp * vp * dloc * hwp + 8 * cp * vp * dloc * hwp,
            bytes_accessed=(cp // ct) * vp * hwp * 4 + cp * dloc * hwp * 4,
            transcendentals=cp * vp * dloc * hwp if gaussian else 0,
        ),
        interpret=_interpret(),
    )(dx2cols, dyz2, wt, r2c)
    return out[:c, :, :hw].reshape(c, dloc, dim, dim)

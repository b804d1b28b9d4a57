"""Backend dispatch for the voxelization op.

One logical op, two implementations:

- ``dense``: pure-XLA (ops/dense.py) — runs everywhere, parity reference.
- ``pallas``: fused TPU kernel (ops/pallas_deposit.py) — the production path
  on TPU hardware.

``impl="auto"`` picks pallas on TPU backends and dense elsewhere.  This
replaces the reference's ``library=`` string dispatch between numpy/numba/
torch classes (/root/reference/molvoxel/__init__.py:33-39): the choice here is
per-call and purely about which compiled program computes the identical result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import GridSpec
from .dense import voxelize_dense, voxelize_dense_channelwise


def default_impl() -> str:
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "dense"


def default_batch_impl() -> str:
    """Implementation for batched calls.

    On TPU the natively batched Pallas kernel (leading batch grid dimension)
    is used — vmap-of-pallas_call miscompiles in this toolchain, which is why
    batching is built into the kernel itself rather than mapped over it.
    """
    return default_impl()


# gaussian_notrunc routing crossover, measured on-chip (benchmarks/
# experiments/r4_notrunc_probe.py, bf16+f32): the pruned Pallas kernel
# (underflow-radius cutoff, pallas_deposit.notrunc_r2_thresh) beats the
# separable einsum only when BOTH the atom count and the grid are large —
# protein 128^3: 462 vs 1016 us/mol bf16 (2.2x); but protein 48^3: 135 vs 54
# (separable wins — its einsum is one full-MXU pass and the grid is small),
# complex 48^3: 138 vs 94, ligand 128^3: 40 vs 31.  The separable cost is
# O(V * (C*Dl + H*W)) bytes of eyz/u temporaries per molecule, so it loses
# when depth (or the 256^3-class H*W plane) blows those up.
NOTRUNC_PALLAS_MIN_ATOMS = 1024
NOTRUNC_PALLAS_MIN_DEPTH = 96
NOTRUNC_PALLAS_MIN_DIM = 192


def notrunc_use_pallas(num_atoms: int, dim: int = 0, dl: int | None = None) -> bool:
    """True when gaussian_notrunc should run on the pruned Pallas kernel."""
    dl = dim if dl is None else dl
    return num_atoms >= NOTRUNC_PALLAS_MIN_ATOMS and (
        dl >= NOTRUNC_PALLAS_MIN_DEPTH or dim >= NOTRUNC_PALLAS_MIN_DIM
    )


def voxelize(
    coords: jnp.ndarray,
    weights: jnp.ndarray,
    radii: jnp.ndarray,
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    mask: jnp.ndarray | None = None,
    channelwise_radii: bool = False,
    impl: str = "auto",
    d_offset=0,
    d_count: int | None = None,
) -> jnp.ndarray:
    """Voxelize one point cloud; see ops/dense.py for argument semantics.

    radii is (V,) normally, (C,) when ``channelwise_radii`` is True.
    d_offset/d_count select a depth slab (depth-sharded execution).
    """
    if impl == "auto":
        impl = default_impl()
    if density_type == "gaussian_notrunc" and not (
        impl == "pallas"
        and not channelwise_radii
        and notrunc_use_pallas(coords.shape[0], spec.dimension, d_count)
    ):
        # fully-separable: one well-shaped matmul, backend-portable
        # (ops/separable.py); protein-scale inputs route to the pruned
        # Pallas kernel instead (underflow-radius cutoff, see batch.py)
        from .separable import voxelize_separable

        return voxelize_separable(
            coords, weights, radii, spec=spec, sigma=sigma, mask=mask,
            d_offset=d_offset, d_count=d_count, channelwise_radii=channelwise_radii,
        )
    kw = dict(spec=spec, density_type=density_type, sigma=sigma, mask=mask, d_offset=d_offset, d_count=d_count)
    if impl == "pallas":
        # custom_vjp wrapper: pallas forward, dense-path backward, so the
        # deposit is differentiable on every implementation (ops/autodiff.py)
        from .autodiff import voxelize_pallas_ad

        return voxelize_pallas_ad(
            coords, weights, radii, mask, d_offset, spec, density_type, sigma, channelwise_radii, d_count
        )
    elif impl == "dense":
        if channelwise_radii:
            return voxelize_dense_channelwise(coords, weights, radii, **kw)
        return voxelize_dense(coords, weights, radii, **kw)
    raise ValueError(f"unknown impl {impl!r}; expected 'auto', 'dense' or 'pallas'")

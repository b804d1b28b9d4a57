"""Batched voxelization: vmap over molecules.

The reference has no real batch axis — its timing harness loops Python-side
over ``out_grid[i]`` slices (/root/reference/test/test_time_numpy.py:11-15).
Here the batch is a first-class vmapped axis, which is what the TPU needs to
keep the MXU fed, and is the axis data-parallel sharding splits across chips
(parallel/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import GridSpec
from ..core.transform import do_random_transform
from .voxelize import default_batch_impl, voxelize


def _single(
    coords,
    weights,
    radii,
    mask,
    center,
    key,
    random_translation,
    *,
    spec,
    density_type,
    sigma,
    random_rotation,
    channelwise,
    impl,
):
    coords = coords - center[None, :].astype(coords.dtype)
    coords = do_random_transform(key, coords, None, random_translation, random_rotation)
    return voxelize(
        coords,
        weights,
        radii,
        spec=spec,
        density_type=density_type,
        sigma=sigma,
        mask=mask,
        channelwise_radii=channelwise,
        impl=impl,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec",
        "density_type",
        "sigma",
        "random_rotation",
        "channelwise",
        "impl",
        "radii_batched",
    ),
)
def voxelize_batch(
    coords: jnp.ndarray,
    weights: jnp.ndarray,
    radii: jnp.ndarray,
    mask: jnp.ndarray | None,
    centers: jnp.ndarray | None,
    keys: jnp.ndarray,
    random_translation: jnp.ndarray | float = 0.0,
    *,
    spec: GridSpec,
    density_type: str = "gaussian",
    sigma: float = 0.5,
    random_rotation: bool = False,
    channelwise: bool = False,
    impl: str = "auto",
    radii_batched: bool = False,
) -> jnp.ndarray:
    """Voxelize a padded batch of point clouds.

    Args:
      coords: (B, V, 3).
      weights: (B, V, C).
      radii: (V,)/(C,) shared, or (B, V) when ``radii_batched``.
      mask: (B, V) bool or None.
      centers: (B, 3) or None (treated as origin).
      keys: (B,) jax PRNG keys (e.g. ``jax.random.split(key, B)``); only
        consumed when random_translation > 0 or random_rotation.
      random_translation: scalar magnitude (may be traced).
      random_rotation: static bool.

    Returns:
      (B, C, D, H, W).
    """
    b = coords.shape[0]
    if impl == "auto":
        impl = default_batch_impl()
    if centers is None:
        centers = jnp.zeros((b, 3), coords.dtype)
    if mask is None:
        mask_ax = None
        mask_arr = None
    else:
        mask_ax = 0
        mask_arr = mask
    fn = functools.partial(
        _single,
        spec=spec,
        density_type=density_type,
        sigma=sigma,
        random_rotation=random_rotation,
        channelwise=channelwise,
        impl=impl,
    )
    return jax.vmap(fn, in_axes=(0, 0, 0 if radii_batched else None, mask_ax, 0, 0, None))(
        coords, weights, radii, mask_arr, centers, keys, jnp.asarray(random_translation, coords.dtype)
    )

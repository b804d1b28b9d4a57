"""Density kernels on *squared* distances.

Semantics follow the reference numpy backend, which is the parity target
(SURVEY.md section 2.6):

- gaussian: ``exp(-0.5 * (d / (r * sigma))**2)`` for ``d <= r`` (inclusive),
  0 outside (/root/reference/molvoxel/voxelizer/numpy/voxelizer.py:557-560 —
  the reference zeroes ``dr > 1.0`` strictly, keeping the boundary).
- binary: ``1.0`` where ``d <= r`` (inclusive), else 0
  (/root/reference/molvoxel/voxelizer/numpy/voxelizer.py:554-555).

Working on squared distances avoids the sqrt entirely: both kernels only need
``d^2`` and ``r^2`` (gaussian exponent is linear in d^2), which is both faster
and better conditioned in float32 than the reference's f64-cdist-then-cast
pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

GAUSSIAN = "gaussian"
BINARY = "binary"
# no radius cutoff: the reference *torch* backend's actual gaussian semantics
# (its masked_fill_ cutoff is dead code, torch/voxelizer.py:564-567, SURVEY Q1)
GAUSSIAN_NOTRUNC = "gaussian_notrunc"


def gaussian_sq(d2: jnp.ndarray, r2: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian density from squared distance d2 and squared radius r2.

    exp(-0.5 * d2 / (r2 * sigma^2)) masked to d2 <= r2 (inclusive boundary).
    """
    inv_two_sigma_sq = 0.5 / (sigma * sigma)
    val = jnp.exp(-(inv_two_sigma_sq) * d2 / r2)
    return jnp.where(d2 <= r2, val, 0.0)


def binary_sq(d2: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Binary density: 1.0 inside the (inclusive) radius, else 0.0."""
    return jnp.where(d2 <= r2, 1.0, 0.0).astype(d2.dtype)


def gaussian_notrunc_sq(d2: jnp.ndarray, r2: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian without the radius cutoff (reference torch semantics)."""
    inv_two_sigma_sq = 0.5 / (sigma * sigma)
    return jnp.exp(-(inv_two_sigma_sq) * d2 / r2)


def density_sq(d2: jnp.ndarray, r2: jnp.ndarray, density_type: str, sigma: float) -> jnp.ndarray:
    if density_type == GAUSSIAN:
        return gaussian_sq(d2, r2, sigma)
    elif density_type == BINARY:
        return binary_sq(d2, r2)
    elif density_type == GAUSSIAN_NOTRUNC:
        return gaussian_notrunc_sq(d2, r2, sigma)
    raise ValueError(f"unknown density_type {density_type!r}")

"""Dense-op tests against the brute-force numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.ops import voxelize_dense, voxelize_dense_channelwise

from .oracle import voxelize_oracle

SPEC = GridSpec(resolution=0.5, dimension=16)


def make_cloud(rng, v=24, c=5):
    coords = rng.uniform(-3.0, 3.0, size=(v, 3)).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, size=(v, c)).astype(np.float32)
    radii = rng.uniform(0.7, 1.8, size=(v,)).astype(np.float32)
    return coords, weights, radii


@pytest.mark.parametrize("density", ["gaussian", "binary"])
def test_atomwise_matches_oracle(rng, density):
    coords, weights, radii = make_cloud(rng)
    got = np.asarray(
        voxelize_dense(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii),
            spec=SPEC, density_type=density, sigma=0.5,
        )
    )
    want = voxelize_oracle(coords, weights, radii, SPEC.resolution, SPEC.dimension, density, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("density", ["gaussian", "binary"])
def test_scalar_radius_matches_oracle(rng, density):
    coords, weights, _ = make_cloud(rng)
    radii = np.full((coords.shape[0],), 1.2, dtype=np.float32)
    got = np.asarray(
        voxelize_dense(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii),
            spec=SPEC, density_type=density, sigma=0.5,
        )
    )
    want = voxelize_oracle(coords, weights, 1.2, SPEC.resolution, SPEC.dimension, density, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("density", ["gaussian", "binary"])
def test_channelwise_matches_oracle(rng, density):
    coords, weights, _ = make_cloud(rng, c=4)
    radii_c = np.asarray([0.8, 1.0, 1.4, 2.0], dtype=np.float32)
    got = np.asarray(
        voxelize_dense_channelwise(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii_c),
            spec=SPEC, density_type=density, sigma=0.5,
        )
    )
    want = voxelize_oracle(
        coords, weights, radii_c, SPEC.resolution, SPEC.dimension, density, 0.5, channelwise_radii=True
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_excludes_padding(rng):
    coords, weights, radii = make_cloud(rng, v=16)
    vp = 32
    coords_p = np.zeros((vp, 3), np.float32)
    coords_p[:16] = coords
    weights_p = np.zeros((vp, weights.shape[1]), np.float32)
    weights_p[:16] = weights
    radii_p = np.ones((vp,), np.float32)
    radii_p[:16] = radii
    mask = np.zeros((vp,), bool)
    mask[:16] = True

    got = np.asarray(
        voxelize_dense(
            jnp.asarray(coords_p), jnp.asarray(weights_p), jnp.asarray(radii_p),
            spec=SPEC, density_type="gaussian", sigma=0.5, mask=jnp.asarray(mask),
        )
    )
    want = np.asarray(
        voxelize_dense(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii),
            spec=SPEC, density_type="gaussian", sigma=0.5,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.all(np.isfinite(got))


def test_atom_outside_box_contributes_nothing(rng):
    # box-clipping in the reference is a pruning optimization, not semantics:
    # an atom farther than its radius from every voxel deposits zero
    coords = np.asarray([[100.0, 100.0, 100.0]], dtype=np.float32)
    weights = np.ones((1, 2), np.float32)
    radii = np.ones((1,), np.float32)
    got = np.asarray(
        voxelize_dense(jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), spec=SPEC)
    )
    assert np.all(got == 0.0)


def test_larger_grid_slabbed_path(rng):
    # force the lax.map slab path with a bigger dim and many atoms
    spec = GridSpec(resolution=0.5, dimension=24)
    coords, weights, radii = make_cloud(rng, v=40, c=3)
    got = np.asarray(
        voxelize_dense(jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), spec=spec)
    )
    want = voxelize_oracle(coords, weights, radii, spec.resolution, spec.dimension, "gaussian", 0.5)
    np.testing.assert_allclose(got, want, atol=1e-5)

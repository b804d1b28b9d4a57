"""Flax integration tests (skipped without flax)."""

import numpy as np
import pytest

from molvoxel_tpu.core import GridSpec

flax = pytest.importorskip("flax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molvoxel_tpu.nn import VoxelCNN, VoxelizeLayer  # noqa: E402

SPEC = GridSpec(resolution=0.5, dimension=16)


def batch(rng, b=2, vp=128, v=12, c=3):
    coords = np.zeros((b, vp, 3), np.float32)
    coords[:, :v] = rng.uniform(-2, 2, (b, v, 3))
    weights = np.zeros((b, vp, c), np.float32)
    weights[:, :v] = rng.uniform(size=(b, v, c))
    mask = np.zeros((b, vp), bool)
    mask[:, :v] = True
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)


def test_voxelize_layer_deterministic(rng):
    coords, weights, mask = batch(rng)
    layer = VoxelizeLayer(spec=SPEC)
    params = layer.init(jax.random.PRNGKey(0), coords, weights, mask)
    a = layer.apply(params, coords, weights, mask)
    b = layer.apply(params, coords, weights, mask)
    assert a.shape == (2, 3, 16, 16, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_voxelize_layer_augment_rng(rng):
    coords, weights, mask = batch(rng)
    layer = VoxelizeLayer(spec=SPEC, augment=True, random_translation=0.5)
    params = layer.init(jax.random.PRNGKey(0), coords, weights, mask)
    a = layer.apply(params, coords, weights, mask, rngs={"voxelize": jax.random.PRNGKey(1)})
    b = layer.apply(params, coords, weights, mask, rngs={"voxelize": jax.random.PRNGKey(1)})
    c = layer.apply(params, coords, weights, mask, rngs={"voxelize": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_gradients_flow_through_layer(rng):
    coords, weights, mask = batch(rng)
    layer = VoxelizeLayer(spec=SPEC)
    cnn = VoxelCNN(features=8)
    params = cnn.init(jax.random.PRNGKey(0), layer.apply({}, coords, weights, mask))

    def loss(crd):
        grids = layer.apply({}, crd, weights, mask)
        return jnp.sum(cnn.apply(params, grids))

    g = np.asarray(jax.grad(loss)(coords))
    assert np.all(np.isfinite(g))
    assert np.abs(g[:, :12]).max() > 0


def test_cnn_shapes(rng):
    coords, weights, mask = batch(rng)
    grids = VoxelizeLayer(spec=SPEC).apply({}, coords, weights, mask)
    cnn = VoxelCNN(features=32)
    params = cnn.init(jax.random.PRNGKey(0), grids)
    out = cnn.apply(params, grids)
    assert out.shape == (2, 32)

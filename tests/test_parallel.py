"""Sharded execution tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.ops.batch import voxelize_batch
from molvoxel_tpu.ops.dense import voxelize_dense
from molvoxel_tpu.parallel import (
    make_mesh,
    pad_batch_to_mesh,
    voxelize_batch_2d,
    voxelize_batch_dp,
    voxelize_depth_sharded,
)

SPEC = GridSpec(resolution=0.5, dimension=16)


def batch_cloud(rng, b=8, vp=128, v=25, c=4):
    coords = np.zeros((b, vp, 3), np.float32)
    coords[:, :v] = rng.uniform(-3, 3, (b, v, 3))
    weights = np.zeros((b, vp, c), np.float32)
    weights[:, :v] = rng.uniform(size=(b, v, c))
    radii = np.ones((vp,), np.float32)
    mask = np.zeros((b, vp), bool)
    mask[:, :v] = True
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), jnp.asarray(mask)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["depth"] == 1
    mesh2 = make_mesh(depth=4)
    assert mesh2.shape["data"] == 2 and mesh2.shape["depth"] == 4
    with pytest.raises(ValueError):
        make_mesh(depth=3)
    assert pad_batch_to_mesh(5, mesh) == 8
    assert pad_batch_to_mesh(8, mesh) == 8


def test_dp_matches_unsharded(rng):
    mesh = make_mesh()
    coords, weights, radii, mask = batch_cloud(rng, b=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    sharded = voxelize_batch_dp(
        coords, weights, radii, mask, None, keys, 0.0,
        mesh=mesh, spec=SPEC, impl="dense",
    )
    local = voxelize_batch(
        coords, weights, radii, mask, None, keys, 0.0,
        spec=SPEC, impl="dense",
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local), atol=1e-5)


def test_depth_sharded_matches_unsharded(rng):
    mesh = make_mesh(data=1, depth=8)
    coords, weights, radii, mask = batch_cloud(rng, b=1)
    out = voxelize_depth_sharded(
        coords[0], weights[0], radii, mask[0], None, jax.random.PRNGKey(0), 0.0,
        mesh=mesh, spec=SPEC, impl="dense",
    )
    want = voxelize_dense(coords[0], weights[0], radii, spec=SPEC, mask=mask[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_depth_sharded_with_rotation_consistent(rng):
    # same key on all shards -> shards see identical transformed coords
    mesh = make_mesh(data=1, depth=8)
    coords, weights, radii, mask = batch_cloud(rng, b=1)
    key = jax.random.PRNGKey(3)
    out = voxelize_depth_sharded(
        coords[0], weights[0], radii, mask[0], None, key, 0.5,
        mesh=mesh, spec=SPEC, random_rotation=True, impl="dense",
    )
    from molvoxel_tpu.core.transform import do_random_transform

    crd = do_random_transform(key, coords[0], None, 0.5, True)
    want = voxelize_dense(crd, weights[0], radii, spec=SPEC, mask=mask[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_2d_mesh_batch_and_depth(rng):
    mesh = make_mesh(data=4, depth=2)
    coords, weights, radii, mask = batch_cloud(rng, b=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    grids, mass = voxelize_batch_2d(
        coords, weights, radii, mask, None, keys, 0.0,
        mesh=mesh, spec=SPEC, impl="dense",
    )
    want = voxelize_batch(coords, weights, radii, mask, None, keys, 0.0, spec=SPEC, impl="dense")
    np.testing.assert_allclose(np.asarray(grids), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(float(mass), float(np.asarray(want).sum()), rtol=1e-5)


def test_dp_output_sharding(rng):
    mesh = make_mesh()
    coords, weights, radii, mask = batch_cloud(rng, b=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    out = voxelize_batch_dp(
        coords, weights, radii, mask, None, keys, 0.0, mesh=mesh, spec=SPEC, impl="dense"
    )
    # batch axis stays sharded across the 8 devices
    assert len(out.sharding.device_set) == 8


def test_depth_sharded_protein_scale_128(rng):
    # BASELINE configs[4]: 128^3 pocket grid, depth-sharded across the mesh
    mesh = make_mesh(data=1, depth=8)
    spec = GridSpec(resolution=0.5, dimension=128)
    v, vp, c = 300, 384, 4
    coords = np.zeros((vp, 3), np.float32)
    coords[:v] = rng.uniform(-25, 25, (v, 3))
    weights = np.zeros((vp, c), np.float32)
    weights[:v] = rng.uniform(size=(v, c))
    mask = np.zeros((vp,), bool)
    mask[:v] = True
    out = voxelize_depth_sharded(
        jnp.asarray(coords), jnp.asarray(weights), jnp.ones((vp,), jnp.float32),
        jnp.asarray(mask), None, jax.random.PRNGKey(0), 0.0,
        mesh=mesh, spec=spec, impl="dense",
    )
    assert out.shape == (4, 128, 128, 128)
    # each depth shard deposited something (atoms spread the full box)
    host = np.asarray(out)
    for s in range(8):
        assert host[:, s * 16 : (s + 1) * 16].max() > 0
    # spot-check a slab against the unsharded op
    want = voxelize_dense(
        jnp.asarray(coords), jnp.asarray(weights), jnp.ones((vp,), jnp.float32),
        spec=spec, mask=jnp.asarray(mask), d_offset=32, d_count=16,
    )
    np.testing.assert_allclose(host[:, 32:48], np.asarray(want), atol=1e-5)

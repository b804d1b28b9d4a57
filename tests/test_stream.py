"""Streaming driver tests: batching, consumer, metrics, checkpoint/resume."""

import numpy as np

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.parallel import StreamingVoxelizer, make_mesh

SPEC = GridSpec(resolution=0.5, dimension=16)


def make_clouds(rng, n, c=3):
    out = []
    for _ in range(n):
        v = int(rng.integers(5, 40))
        out.append(
            (rng.uniform(-3, 3, (v, 3)).astype(np.float32), rng.uniform(size=(v, c)).astype(np.float32))
        )
    return out


def test_stream_processes_all(rng):
    clouds = make_clouds(rng, 11)
    got = []

    def consumer(images, batch):
        got.append(np.asarray(images))

    sv = StreamingVoxelizer(SPEC, batch_size=4)
    stats = sv.run(clouds, consumer)
    assert stats.molecules == 11
    assert stats.batches == 3
    assert len(got) == 3
    assert got[0].shape == (4, 3, 16, 16, 16)
    # padded tail molecule produces a zero grid
    assert np.all(got[-1][-1] == 0)
    assert stats.mols_per_second > 0


def test_stream_results_match_direct(rng):
    import jax
    import jax.numpy as jnp

    from molvoxel_tpu.ops.dense import voxelize_dense

    clouds = make_clouds(rng, 2)
    results = []
    sv = StreamingVoxelizer(SPEC, batch_size=2)
    sv.run(clouds, lambda images, batch: results.append(np.asarray(images)))
    for i, (crd, w) in enumerate(clouds):
        want = np.asarray(
            voxelize_dense(
                jnp.asarray(crd), jnp.asarray(w), jnp.ones((crd.shape[0],), jnp.float32), spec=SPEC
            )
        )
        np.testing.assert_allclose(results[0][i], want, atol=1e-5)


def test_stream_checkpoint_resume(rng, tmp_path):
    clouds = make_clouds(rng, 8)
    ckpt = tmp_path / "manifest.json"

    sv = StreamingVoxelizer(SPEC, batch_size=2, checkpoint_path=ckpt, checkpoint_every=1)
    stats = sv.run(clouds[:4])
    assert stats.molecules == 4
    assert ckpt.exists()

    # resume: skips the first 4, processes the remaining 4
    sv2 = StreamingVoxelizer(SPEC, batch_size=2, checkpoint_path=ckpt)
    stats2 = sv2.run(clouds)
    assert stats2.skipped == 4
    assert stats2.molecules == 4


def test_stream_sharded_mesh(rng):
    clouds = make_clouds(rng, 16)
    mesh = make_mesh()
    sv = StreamingVoxelizer(SPEC, batch_size=8, mesh=mesh)
    got = []
    stats = sv.run(clouds, lambda images, batch: got.append(np.asarray(images)))
    assert stats.molecules == 16
    assert got[0].shape == (8, 3, 16, 16, 16)

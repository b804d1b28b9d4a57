"""Sharded grid store (data/gridstore.py): bounded-memory output round-trips."""

import json

import numpy as np
import pytest

from molvoxel_tpu.data.gridstore import GridShardReader, GridShardWriter, read_grid_shards


def _batches(n_batches, b=3, c=2, d=4, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_batches):
        yield (
            rng.uniform(size=(b, c, d, d, d)).astype(dtype),
            np.full((b,), 5, np.int32),
        )


class TestGridStore:
    def test_round_trip_multiple_shards(self, tmp_path):
        root = tmp_path / "store"
        # tiny target_bytes forces a flush per append -> >= 4 shards
        w = GridShardWriter(root, ["A", "B"], resolution=0.5, dimension=4, target_bytes=1)
        all_parts = []
        with w:
            for images, atoms in _batches(5):
                w.append(images, atoms)
                all_parts.append(images)
            w.finalize(13)  # 15 rows appended, 2 are tail padding
        assert w.num_shards >= 4
        grids, manifest = read_grid_shards(root)
        want = np.concatenate(all_parts)[:13]
        np.testing.assert_array_equal(grids, want)
        assert manifest["num_molecules"] == 13
        assert manifest["channels"] == ["A", "B"]

        r = GridShardReader(root)
        assert len(r) == 13
        np.testing.assert_array_equal(r[0], want[0])
        np.testing.assert_array_equal(r[12], want[12])
        np.testing.assert_array_equal(r[-1], want[12])
        with pytest.raises(IndexError):
            r[13]
        assert r.num_atoms().shape == (13,)

    def test_bounded_memory_semantics(self, tmp_path):
        """Buffer drains on every flush: internal buffer never holds more
        than target_bytes after an append."""
        w = GridShardWriter(tmp_path / "s", ["A"], resolution=0.5, dimension=4, target_bytes=2048)
        for images, atoms in _batches(20, b=2, c=1):
            w.append(images, atoms)
            assert w._buf_bytes < 2048 + images.nbytes
        w.finalize(40)
        grids, m = read_grid_shards(tmp_path / "s")
        assert grids.shape[0] == 40

    def test_bfloat16_round_trip(self, tmp_path):
        import ml_dtypes

        root = tmp_path / "bf"
        with GridShardWriter(root, ["A"], resolution=0.5, dimension=4) as w:
            for images, atoms in _batches(2, c=1):
                w.append(images.astype(ml_dtypes.bfloat16), atoms)
            w.finalize(6)
        grids, manifest = read_grid_shards(root)
        assert manifest["dtype"] == "bfloat16"
        assert grids.dtype == ml_dtypes.bfloat16
        assert grids.shape == (6, 1, 4, 4, 4)
        assert float(np.asarray(grids, np.float32).sum()) > 0

    def test_context_exit_without_finalize(self, tmp_path):
        root = tmp_path / "ctx"
        with GridShardWriter(root, ["A"], resolution=0.5, dimension=4) as w:
            for images, atoms in _batches(2, c=1):
                w.append(images, atoms)
        manifest = json.loads((root / "manifest.json").read_text())
        assert manifest["num_molecules"] == 6

    def test_empty_store(self, tmp_path):
        root = tmp_path / "empty"
        with GridShardWriter(root, ["A"], resolution=0.5, dimension=4) as w:
            w.finalize(0)
        grids, manifest = read_grid_shards(root)
        assert manifest["num_molecules"] == 0 and grids.shape[0] == 0


def test_writer_resume_from_provisional_manifest(tmp_path):
    """A crashed writer leaves a provisional manifest per flush; a resumed
    writer adopts the flushed prefix and appends after it."""
    import json

    import numpy as np

    from molvoxel_tpu.data.gridstore import GridShardWriter, read_grid_shards

    rng = np.random.default_rng(0)
    batches = [rng.normal(size=(4, 2, 8, 8, 8)).astype(np.float32) for _ in range(3)]
    atoms = [np.full((4,), 7, np.int32) for _ in range(3)]

    # interrupted run: two batches flushed (target_bytes=1 -> flush each),
    # then "crash" (no finalize)
    w = GridShardWriter(tmp_path / "s", ["A", "B"], resolution=0.5, dimension=8, target_bytes=1)
    w.append(batches[0], atoms[0])
    w.append(batches[1], atoms[1])
    m = json.loads((tmp_path / "s" / "manifest.json").read_text())
    assert m["final"] is False and m["num_molecules"] == 8

    # resumed run: skip w.rows, append the rest, finalize
    w2 = GridShardWriter(tmp_path / "s", ["A", "B"], resolution=0.5, dimension=8,
                         target_bytes=1, resume=True)
    assert w2.rows == 8
    w2.append(batches[2], atoms[2])
    w2.finalize(12)

    grids, manifest = read_grid_shards(tmp_path / "s")
    assert manifest["final"] is True and manifest["num_molecules"] == 12
    np.testing.assert_array_equal(np.asarray(grids), np.concatenate(batches))

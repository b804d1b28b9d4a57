"""Smoke tests: the self-checking examples keep working (small configs)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_screen_library_small():
    import screen_library

    screen_library.main(n_decoys=6, dim=16)  # self-asserting


def test_pose_optimize_small():
    pytest.importorskip("optax")
    import pose_optimize

    r0, r1 = pose_optimize.main(steps=120, dim=24)
    assert r1 < r0 / 10


def test_train_cnn_small():
    pytest.importorskip("flax")
    pytest.importorskip("optax")
    import train_cnn

    train_cnn.main(steps=30)  # self-asserting: loss must drop


def test_voxelize_complex_example(tmp_path, monkeypatch):
    import voxelize_complex

    monkeypatch.setattr(voxelize_complex, "OUT", tmp_path)
    voxelize_complex.main()  # self-asserting: key-reproducible augmentation
    assert (tmp_path / "complex.npz").exists()
    assert any(tmp_path.glob("complex*"))  # session or .pml fallback artifacts


def test_multihost_example_single_process():
    # the pod recipe demoted to 1 process x 8 virtual devices: globalize_batch,
    # DP shard_map, stream_dp_multiprocess with a per-host store, and the
    # in-process StreamingVoxelizer must all run end-to-end
    import os
    import subprocess
    import sys

    root = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, str(root / "examples" / "multihost.py")],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "streamed 64 molecules in 4 batches" in out.stdout
    assert "streamed 32 local molecules" in out.stdout

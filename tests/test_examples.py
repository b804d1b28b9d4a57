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

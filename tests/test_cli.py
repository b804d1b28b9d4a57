"""CLI smoke tests."""

import numpy as np

from molvoxel_tpu.cli import main

from .test_data import REF_LIGAND


def test_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "molvoxel-tpu" in out
    assert "jax" in out


def test_voxelize_npz(tmp_path):
    out = tmp_path / "grids.npz"
    rc = main(
        [
            "voxelize", REF_LIGAND, "-o", str(out),
            "--dimension", "16", "--channels", "C,N,O,S", "--unknown",
        ]
    )
    assert rc == 0
    data = np.load(out)
    assert data["grids"].shape == (1, 5, 16, 16, 16)
    assert list(data["channels"]) == ["C", "N", "O", "S", "Unknown"]
    assert data["grids"].max() > 0


def test_voxelize_dx(tmp_path):
    dxdir = tmp_path / "dx"
    rc = main(
        ["voxelize", REF_LIGAND, "--dx", str(dxdir), "--dimension", "16", "--channels", "C,N,O,S"]
    )
    assert rc == 0
    assert len(list(dxdir.glob("*.dx"))) == 4


def test_voxelize_pdb(tmp_path):
    out = tmp_path / "pocket.npz"
    rc = main(
        [
            "voxelize", "/root/reference/test/10gs/10gs_pocket_nowater.pdb",
            "-o", str(out), "--dimension", "16", "--channels", "C,N,O,S",
        ]
    )
    assert rc == 0
    assert np.load(out)["grids"].shape == (1, 4, 16, 16, 16)

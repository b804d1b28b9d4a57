"""Visualization tests: OpenDX round-trip and session building (no PyMOL)."""

import numpy as np

from molvoxel_tpu.viz import Visualizer, atom_color, channel_color, read_dx, write_dx
from molvoxel_tpu.viz.dx import write_channels_dx

from .test_data import make_mol


def test_dx_roundtrip(rng, tmp_path):
    grid = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    center = np.asarray([1.0, -2.0, 3.0])
    path = tmp_path / "grid.dx"
    write_dx(path, grid, center, 0.5)
    values, origin, res = read_dx(path)
    assert values.shape == (8, 8, 8)
    assert res == 0.5
    # origin = center - res*(size-1)/2 (reference dx.py:13-18)
    np.testing.assert_allclose(origin, center - 0.5 * 7 / 2, atol=1e-4)
    np.testing.assert_allclose(values, grid, atol=1e-5)


def test_dx_nondivisible_by_three(rng, tmp_path):
    grid = rng.uniform(size=(4, 4, 4)).astype(np.float32)  # 64 values, 64 % 3 == 1
    path = tmp_path / "grid.dx"
    write_dx(path, grid, [0, 0, 0], 1.0)
    values, _, _ = read_dx(path)
    np.testing.assert_allclose(values, grid, atol=1e-5)


def test_write_channels(rng, tmp_path):
    channels = {"C": rng.uniform(size=(4, 4, 4)), "N/weird name": rng.uniform(size=(4, 4, 4))}
    paths = write_channels_dx(tmp_path, channels, [0, 0, 0], 0.5)
    assert all(p.exists() for p in paths.values())


def test_colors():
    assert atom_color("O") == "red"
    assert atom_color("Xx") == "wheat"
    assert channel_color("C", 0) == "gray"
    assert isinstance(channel_color("SingleBond", 5), str)


def test_colors_full_periodic_table():
    # reference parity: all 118 elements resolve to a real color, never the
    # unknown-symbol fallback (/root/reference/molvoxel/etc/pymol/atom.py:1-120)
    from molvoxel_tpu.viz.atom_colors import _ELEMENT_NAMES

    assert len(_ELEMENT_NAMES) == 118
    for sym in _ELEMENT_NAMES:
        assert atom_color(sym) != "wheat"
    assert atom_color("Pr") == "praseodymium"
    assert atom_color("Og") == "oganesson"


def test_visualizer_fallback_builds_pml(rng, tmp_path):
    mol = make_mol(rng)
    grid = np.zeros((2, 8, 8, 8), np.float32)
    grid[0, 4, 4, 4] = 1.0  # one non-empty channel, one empty
    channel_dict = {"C": grid[0], "N": grid[1]}
    viz = Visualizer()
    result = viz.visualize_mol(str(tmp_path / "session.pse"), mol, channel_dict, [0, 0, 0], 0.5)
    # no pymol in this environment -> .pml script + artifacts
    assert result.suffix == ".pml"
    script = result.read_text()
    assert "isosurface" in script
    assert "Molecule_C" in script
    assert "Molecule_N" not in script.replace("Molecule_N_map", "")  # empty channel skipped
    assert (result.parent / "molecule.sdf").exists()


def test_visualizer_complex_fallback(rng, tmp_path):
    lig, prot = make_mol(rng), make_mol(rng, n=12, nb=0)
    g = np.zeros((8, 8, 8), np.float32)
    g[4, 4, 4] = 1.0
    viz = Visualizer()
    result = viz.visualize_complex(
        str(tmp_path / "cplx.pse"), lig, prot, {"C": g}, {"C": g}, [0, 0, 0], 0.5
    )
    script = result.read_text()
    assert "Ligand" in script and "Protein" in script

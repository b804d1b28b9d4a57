"""Native batch SDF parser tests (C++ via ctypes, with Python fallback)."""

import numpy as np
import pytest

from molvoxel_tpu.data.parsers import iter_sdf, read_sdf, write_sdf
from molvoxel_tpu.native import NATIVE_AVAILABLE, parse_sdf_buffer, parse_sdf_file, parse_sdf_flat

from .test_data import REF_LIGAND, make_mol

pytestmark = pytest.mark.skipif(not NATIVE_AVAILABLE, reason="native toolchain unavailable")


def test_matches_python_parser_on_fixture():
    native = parse_sdf_file(REF_LIGAND)
    ref = read_sdf(REF_LIGAND)
    assert len(native) == 1
    assert native[0].symbols == ref.symbols
    assert native[0].bonds == ref.bonds
    np.testing.assert_allclose(native[0].coords, ref.coords, atol=1e-9)


def test_multi_record_buffer():
    buf = open(REF_LIGAND, "rb").read() * 5
    mols = parse_sdf_buffer(buf)
    assert len(mols) == 5
    for m in mols:
        assert m.num_atoms == 61
        assert m.num_bonds == 62


def test_flat_offsets_and_types():
    buf = open(REF_LIGAND, "rb").read() * 3
    flat = parse_sdf_flat(buf)
    assert flat.num_molecules == 3
    assert flat.atom_offsets[-1] == 3 * 61
    assert flat.bond_offsets[-1] == 3 * 62
    types = flat.types({"C": 0, "N": 1, "O": 2, "S": 3, "H": 4})
    assert types.shape == (183,)
    ref = read_sdf(REF_LIGAND)
    want = np.asarray([{"C": 0, "N": 1, "O": 2, "S": 3, "H": 4}[s] for s in ref.symbols])
    np.testing.assert_array_equal(types[:61], want)


def test_types_unknown_channel():
    flat = parse_sdf_flat(open(REF_LIGAND, "rb").read())
    types = flat.types({"C": 0, "N": 1}, unknown=2)
    assert set(np.unique(types)) <= {0, 1, 2}
    with pytest.raises(KeyError):
        flat.types({"C": 0, "N": 1})


def test_roundtrip_written_molecule(rng, tmp_path):
    mol = make_mol(rng, n=12, nb=6)
    write_sdf(mol, tmp_path / "m.sdf")
    native = parse_sdf_file(tmp_path / "m.sdf")
    py = list(iter_sdf(tmp_path / "m.sdf"))
    assert native[0].symbols == py[0].symbols
    assert native[0].bonds == py[0].bonds
    np.testing.assert_allclose(native[0].coords, py[0].coords, atol=1e-6)

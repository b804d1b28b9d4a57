"""RDKit duck-API coverage without RDKit (VERDICT r4 missing #1).

The adapter layer accepts real ``rdkit.Chem.Mol`` objects through their duck
API (``GetConformer/GetPositions/GetAtoms/GetBonds/GetSymbol/GetBondType`` —
data/pointcloud.py _mol_* helpers, data/getter.py), but RDKit is absent in
this environment, so those branches previously ran in zero tests.  These
stubs implement exactly the surface the reference's RDKit-first layer uses
(/root/reference/molvoxel/etc/rdkit/pointcloud.py:71-89, getter.py:14-46)
and assert every maker/getter/wrapper output equals the SimpleMolecule path
on the same molecule.
"""

import numpy as np
import pytest

from molvoxel_tpu import create_voxelizer
from molvoxel_tpu.data import (
    AtomTypeGetter,
    BondTypeGetter,
    MolPointCloudMaker,
    MolSystemPointCloudMaker,
    MolWrapper,
    SimpleMolecule,
)


class DuckAtom:
    def __init__(self, symbol):
        self._symbol = symbol

    def GetSymbol(self):
        return self._symbol


class DuckBondType:
    """str(rdkit.Chem.BondType.SINGLE) == 'SINGLE'; mirror that."""

    def __init__(self, name):
        self._name = name

    def __str__(self):
        return self._name


class DuckBond:
    def __init__(self, i, j, type_name):
        self._i, self._j, self._t = i, j, type_name

    def GetBeginAtomIdx(self):
        return self._i

    def GetEndAtomIdx(self):
        return self._j

    def GetBondType(self):
        return DuckBondType(self._t)


class DuckConformer:
    def __init__(self, coords):
        self._coords = np.asarray(coords, dtype=np.float64)

    def GetPositions(self):
        return self._coords


class DuckMol:
    """Duck-shaped rdkit.Chem.Mol: the exact surface the adapters consume."""

    def __init__(self, coords, symbols, bonds):
        self._conf = DuckConformer(coords)
        self._atoms = [DuckAtom(s) for s in symbols]
        self._bonds = [DuckBond(i, j, t) for (i, j, t) in bonds]

    def GetConformer(self):
        return self._conf

    def GetNumAtoms(self):
        return len(self._atoms)

    def GetNumBonds(self):
        return len(self._bonds)

    def GetAtoms(self):
        return list(self._atoms)

    def GetBonds(self):
        return list(self._bonds)


def make_pair(rng, n=8, nb=4):
    coords = rng.uniform(-3, 3, (n, 3))
    symbols = [["C", "N", "O", "S"][i % 4] for i in range(n)]
    bonds = [(i, i + 1, ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"][i % 4]) for i in range(nb)]
    simple = SimpleMolecule(coords=coords, symbols=symbols, bonds=bonds, name="duck")
    duck = DuckMol(coords, symbols, bonds)
    return simple, duck


class TestGettersDuck:
    def test_atom_getter_accepts_duck_atom(self):
        g = AtomTypeGetter(["C", "N", "O", "S"])
        assert g.get_type(DuckAtom("N")) == 1
        assert g.get_feature(DuckAtom("O")) == [0.0, 0.0, 1.0, 0.0]

    def test_bond_getter_accepts_duck_bond(self):
        g = BondTypeGetter.default()
        assert g.get_type(DuckBond(0, 1, "AROMATIC")) == 3


@pytest.mark.parametrize("channel_type", ["types", "features"])
def test_maker_duck_matches_simple(rng, channel_type):
    simple, duck = make_pair(rng)
    maker = MolPointCloudMaker(
        AtomTypeGetter(["C", "N", "O", "S"]), BondTypeGetter.default(),
        channel_type=channel_type,
    )
    cs, ts = maker.run(simple)
    cd, td = maker.run(duck)
    np.testing.assert_allclose(cd, cs, atol=1e-12)
    np.testing.assert_array_equal(td, ts)


def test_maker_duck_no_bonds(rng):
    simple, duck = make_pair(rng, nb=0)
    maker = MolPointCloudMaker(AtomTypeGetter(["C", "N", "O", "S"]), None, channel_type="types")
    cs, ts = maker.run(simple)
    cd, td = maker.run(duck)
    np.testing.assert_allclose(cd, cs, atol=1e-12)
    np.testing.assert_array_equal(td, ts)


def test_system_maker_mixed_simple_and_duck(rng):
    """A system may mix toolkit objects; channels must offset identically."""
    lig_s, lig_d = make_pair(rng, n=4, nb=0)
    prot_s, prot_d = make_pair(rng, n=6, nb=0)
    ag = AtomTypeGetter(["C", "N", "O", "S"])
    maker = MolSystemPointCloudMaker((ag, None), (ag, None), channel_type="types")
    cs, ts = maker.run([lig_s, prot_s])
    cd, td = maker.run([lig_d, prot_d])
    np.testing.assert_allclose(cd, cs, atol=1e-12)
    np.testing.assert_array_equal(td, ts)


def test_wrapper_duck_matches_simple(rng):
    simple, duck = make_pair(rng)
    maker = MolPointCloudMaker(
        AtomTypeGetter(["C", "N", "O", "S"]), BondTypeGetter.default(), channel_type="features"
    )
    vox = create_voxelizer(resolution=0.5, dimension=16)
    wrapper = MolWrapper(maker, vox)
    center = simple.coords.mean(0)
    out_s = np.asarray(wrapper.run(simple, center=center, radii=1.0))
    out_d = np.asarray(wrapper.run(duck, center=center, radii=1.0))
    np.testing.assert_allclose(out_d, out_s, atol=1e-6)

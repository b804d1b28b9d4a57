"""Point-cloud makers: molecules -> (coords, channels) arrays.

Feature-parity port of the reference maker hierarchy
(/root/reference/molvoxel/etc/rdkit/pointcloud.py:12-326) with two changes:

- Toolkit-agnostic molecules: works on data.parsers.SimpleMolecule out of the
  box and on RDKit Mol objects when RDKit is installed (the reference requires
  RDKit unconditionally).
- The documented-but-broken coords override of the reference
  (``kwargs.get("kwargs", ...)`` instead of ``"coords"``, pointcloud.py:72,232
  — SURVEY.md Q4) is implemented correctly here: pass ``coords=...`` to run().

Bond channels place pseudo-atoms at bond midpoints, concatenated after the
atom block, exactly like the reference (pointcloud.py:79-89).  Types are
int32 (TPU-native int; reference uses int16).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .getter import AtomChannelGetter, BondChannelGetter
from .parsers import SimpleMolecule


def _mol_coords(mol: Any) -> np.ndarray:
    if isinstance(mol, SimpleMolecule):
        return np.asarray(mol.coords, dtype=np.float64)
    conf = mol.GetConformer()
    return np.asarray(conf.GetPositions(), dtype=np.float64)


def _mol_atoms(mol: Any) -> list:
    if isinstance(mol, SimpleMolecule):
        return list(mol.symbols)
    return list(mol.GetAtoms())


def _mol_bonds(mol: Any) -> list:
    if isinstance(mol, SimpleMolecule):
        return [t for (_, _, t) in mol.bonds]
    return list(mol.GetBonds())


def _mol_num_atoms(mol: Any) -> int:
    if isinstance(mol, SimpleMolecule):
        return mol.num_atoms
    return mol.GetNumAtoms()


def _mol_num_bonds(mol: Any) -> int:
    if isinstance(mol, SimpleMolecule):
        return mol.num_bonds
    return mol.GetNumBonds()


def _mol_bond_midpoints(mol: Any, atom_coords: np.ndarray) -> np.ndarray:
    if isinstance(mol, SimpleMolecule):
        return mol.bond_midpoints()
    begin = [b.GetBeginAtomIdx() for b in mol.GetBonds()]
    end = [b.GetEndAtomIdx() for b in mol.GetBonds()]
    return (atom_coords[begin] + atom_coords[end]) / 2.0


class PointCloudMaker:
    def __init__(self, channels: list[str]):
        self.channels = channels
        self.num_channels = len(channels)

    def split_channel(self, image) -> dict[str, Any]:
        """Name -> per-channel sub-image (reference pointcloud.py:17-19)."""
        assert np.shape(image)[0] == self.num_channels
        return {name: channel for name, channel in zip(self.channels, image)}

    def run(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


class MolPointCloudMaker(PointCloudMaker):
    """Single-molecule maker: atoms (+ optional bond midpoints) -> channels."""

    def __init__(
        self,
        atom_getter: AtomChannelGetter,
        bond_getter: BondChannelGetter | None = None,
        channel_type: str = "features",
    ):
        assert channel_type in ("features", "types"), (
            f"channel_type(input: {channel_type}) should be 'features' or 'types'"
        )
        self.channel_type = channel_type
        self.use_features = use_features = channel_type == "features"
        if use_features:
            assert atom_getter.CHANNEL_TYPE in ("TYPE", "FEATURE")
            if bond_getter is not None:
                assert bond_getter.CHANNEL_TYPE in ("TYPE", "FEATURE")
        else:
            assert atom_getter.CHANNEL_TYPE == "TYPE"
            if bond_getter is not None:
                assert bond_getter.CHANNEL_TYPE == "TYPE"

        self.atom_getter = atom_getter
        self.bond_getter = bond_getter
        self.use_bond = bond_getter is not None
        self.num_atom_channels = atom_getter.num_channels
        self.num_bond_channels = bond_getter.num_channels if bond_getter is not None else 0
        channels = list(atom_getter.channels) + (list(bond_getter.channels) if bond_getter is not None else [])
        super().__init__(channels)

        if use_features:
            self.setup_features()
        else:
            self.setup_types()

    def run(self, mol, **kwargs) -> tuple[np.ndarray, np.ndarray]:
        coords = kwargs.pop("coords", None)
        if coords is None:
            coords = self.get_coords(mol)
        channels = kwargs.pop("channels", None)
        if channels is None:
            channels = self.get_channels(mol, **kwargs)
        return coords, channels

    def get_coords(self, mol) -> np.ndarray:
        atom_coords = _mol_coords(mol)
        if self.use_bond:
            bond_coords = _mol_bond_midpoints(mol, atom_coords)
            return np.concatenate([atom_coords, bond_coords], axis=0)
        return atom_coords

    def get_channels(self, mol, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        if self.use_features:
            return self.get_features(mol, out, **kwargs)
        return self.get_types(mol, out, **kwargs)

    """ FEATURES """

    def setup_features(self):
        self.atom_st = 0
        self.atom_end = self.atom_st + self.num_atom_channels
        if self.use_bond:
            self.bond_st = self.atom_end
            self.bond_end = self.bond_st + self.num_bond_channels

    def get_features(self, mol, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        num_points = _mol_num_atoms(mol) + (_mol_num_bonds(mol) if self.use_bond else 0)
        if out is None:
            out = np.zeros((num_points, self.num_channels), dtype=np.float32)
        else:
            out.fill(0)
        return self._get_features(mol, out, **kwargs)

    def _get_features(self, mol, out: np.ndarray, **kwargs) -> np.ndarray:
        num_atoms = _mol_num_atoms(mol)
        atom_features = [self.atom_getter.get_feature(a, **kwargs) for a in _mol_atoms(mol)]
        if num_atoms > 0:
            out[:num_atoms, self.atom_st : self.atom_end] = atom_features
        if self.use_bond:
            bond_features = [self.bond_getter.get_feature(b, **kwargs) for b in _mol_bonds(mol)]
            if bond_features:
                out[num_atoms:, self.bond_st : self.bond_end] = bond_features
        return out

    """ TYPES """

    def setup_types(self):
        self.atom_start_index = 0
        if self.use_bond:
            self.bond_start_index = self.atom_start_index + self.num_atom_channels

    def get_types(self, mol, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        assert self.use_features is False
        num_points = _mol_num_atoms(mol) + (_mol_num_bonds(mol) if self.use_bond else 0)
        if out is None:
            out = np.empty((num_points,), dtype=np.int32)
        return self._get_types(mol, out, **kwargs)

    def _get_types(self, mol, out: np.ndarray, **kwargs) -> np.ndarray:
        num_atoms = _mol_num_atoms(mol)
        atom_types = [self.atom_getter.get_type(a, **kwargs) + self.atom_start_index for a in _mol_atoms(mol)]
        if num_atoms > 0:
            out[:num_atoms] = atom_types
        if self.use_bond:
            bond_types = [self.bond_getter.get_type(b, **kwargs) + self.bond_start_index for b in _mol_bonds(mol)]
            if bond_types:
                out[num_atoms:] = bond_types
        return out


class _MolElementPointCloudMaker(MolPointCloudMaker):
    """Maker whose channel block starts at a fixed offset within a system
    (reference pointcloud.py:185-204)."""

    def __init__(self, atom_getter, bond_getter, channel_type, start_index):
        self.start_index = start_index
        super().__init__(atom_getter, bond_getter, channel_type)

    def setup_features(self):
        self.atom_st = self.start_index
        self.atom_end = self.atom_st + self.num_atom_channels
        if self.use_bond:
            self.bond_st = self.atom_end
            self.bond_end = self.bond_st + self.num_bond_channels

    def setup_types(self):
        self.atom_start_index = self.start_index
        if self.use_bond:
            self.bond_start_index = self.atom_start_index + self.num_atom_channels

    def num_points(self, mol) -> int:
        return _mol_num_atoms(mol) + (_mol_num_bonds(mol) if self.use_bond else 0)


class MolSystemPointCloudMaker(PointCloudMaker):
    """Concatenate several molecules into one cloud with disjoint channel
    ranges (reference pointcloud.py:207-312)."""

    def __init__(self, *args, channel_type: str = "features"):
        assert channel_type in ("features", "types"), (
            f"channel_type(input: {channel_type}) should be 'features' or 'types'"
        )
        self.channel_type = channel_type
        self.use_features = channel_type == "features"

        self.maker_list: list[_MolElementPointCloudMaker] = []
        channel_offset = 0
        channels: list[str] = []
        for arg in args:
            if isinstance(arg, MolPointCloudMaker):
                maker = _MolElementPointCloudMaker(arg.atom_getter, arg.bond_getter, channel_type, channel_offset)
            else:
                atom_getter, bond_getter = arg
                maker = _MolElementPointCloudMaker(atom_getter, bond_getter, channel_type, channel_offset)
            self.maker_list.append(maker)
            channel_offset += maker.num_channels
            channels += maker.channels
        super().__init__(channels)

    def run(self, mol_list: list, **kwargs) -> tuple[np.ndarray, np.ndarray]:
        coords = kwargs.pop("coords", None)
        if coords is None:
            coords = self.get_coords(mol_list)
        channels = kwargs.pop("channels", None)
        if channels is None:
            channels = self.get_channels(mol_list, **kwargs)
        return coords, channels

    def get_coords(self, mol_list: list) -> np.ndarray:
        coords_list = []
        for mol, maker in zip(mol_list, self.maker_list):
            atom_coords = _mol_coords(mol)
            coords_list.append(atom_coords)
            if maker.use_bond:
                coords_list.append(_mol_bond_midpoints(mol, atom_coords))
        return np.concatenate(coords_list, axis=0)

    def get_channels(self, mol_list: list, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        if self.use_features:
            return self.get_features(mol_list, out, **kwargs)
        return self.get_types(mol_list, out, **kwargs)

    def split_channel(self, image) -> list[dict[str, Any]]:
        channel_offset = 0
        result = []
        for maker in self.maker_list:
            sub = image[channel_offset : channel_offset + maker.num_channels]
            result.append(maker.split_channel(sub))
            channel_offset += maker.num_channels
        return result

    def _total_points(self, mol_list: list) -> int:
        return sum(maker.num_points(mol) for mol, maker in zip(mol_list, self.maker_list))

    def get_features(self, mol_list: list, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        if out is None:
            out = np.zeros((self._total_points(mol_list), self.num_channels), dtype=np.float32)
        else:
            out.fill(0)
        offset = 0
        for mol, maker in zip(mol_list, self.maker_list):
            n = maker.num_points(mol)
            maker._get_features(mol, out[offset : offset + n], **kwargs)
            offset += n
        return out

    def get_types(self, mol_list: list, out: np.ndarray | None = None, **kwargs) -> np.ndarray:
        assert self.use_features is False
        if out is None:
            out = np.empty((self._total_points(mol_list),), dtype=np.int32)
        offset = 0
        for mol, maker in zip(mol_list, self.maker_list):
            n = maker.num_points(mol)
            maker._get_types(mol, out[offset : offset + n], **kwargs)
            offset += n
        return out


class ComplexPointCloudMaker(MolSystemPointCloudMaker):
    """Ligand + protein two-molecule system (reference pointcloud.py:315-326)."""

    def __init__(
        self,
        ligand_atom_getter: AtomChannelGetter,
        ligand_bond_getter: BondChannelGetter | None,
        protein_atom_getter: AtomChannelGetter,
        protein_bond_getter: BondChannelGetter | None,
        channel_type: str = "features",
    ):
        super().__init__(
            (ligand_atom_getter, ligand_bond_getter),
            (protein_atom_getter, protein_bond_getter),
            channel_type=channel_type,
        )

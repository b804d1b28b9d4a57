from .getter import (
    AtomChannelGetter,
    AtomFeatureGetter,
    AtomTypeGetter,
    BondChannelGetter,
    BondFeatureGetter,
    BondTypeGetter,
    ChannelGetter,
    FeatureGetter,
    TypeGetter,
)
from .feed import (
    FlatClouds,
    SDFBatchFeeder,
    assemble_batches,
    assemble_wire,
    flat_clouds,
    map_symbols,
    morton_presort,
)
from .parsers import SimpleMolecule, iter_sdf, read_molecule, read_pdb, read_sdf
from .pipeline import PaddedBatch, iter_batches, pad_point_clouds, types_to_onehot
from .pointcloud import (
    ComplexPointCloudMaker,
    MolPointCloudMaker,
    MolSystemPointCloudMaker,
    PointCloudMaker,
)
from .wrapper import ComplexWrapper, MolSystemWrapper, MolWrapper

__all__ = [
    "AtomChannelGetter",
    "AtomFeatureGetter",
    "AtomTypeGetter",
    "BondChannelGetter",
    "BondFeatureGetter",
    "BondTypeGetter",
    "ChannelGetter",
    "FeatureGetter",
    "TypeGetter",
    "FlatClouds",
    "SDFBatchFeeder",
    "assemble_batches",
    "assemble_wire",
    "flat_clouds",
    "map_symbols",
    "morton_presort",
    "SimpleMolecule",
    "iter_sdf",
    "read_molecule",
    "read_pdb",
    "read_sdf",
    "PaddedBatch",
    "iter_batches",
    "pad_point_clouds",
    "types_to_onehot",
    "ComplexPointCloudMaker",
    "MolPointCloudMaker",
    "MolSystemPointCloudMaker",
    "PointCloudMaker",
    "ComplexWrapper",
    "MolSystemWrapper",
    "MolWrapper",
]

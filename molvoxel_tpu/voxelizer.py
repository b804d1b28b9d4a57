"""Sub-module facade mirroring the reference's ``molvoxel.voxelizer``.

The reference duplicates its factory functions and re-exports the abstract
``BaseVoxelizer``/``BaseRandomTransform`` under typing-friendly names from
``molvoxel/voxelizer/__init__.py:2-37``; code written against that import
path (``from molvoxel.voxelizer import create_voxelizer, Voxelizer,
RandomTransform``) works verbatim with ``molvoxel`` -> ``molvoxel_tpu``.
There is a single JAX compute path here, so the re-exported types are the
real classes, not abstract bases.
"""

from .api.voxelizer import Voxelizer, create_random_transform, create_voxelizer
from .core import RandomTransform, Transform

__all__ = [
    "Voxelizer",
    "RandomTransform",
    "Transform",
    "create_voxelizer",
    "create_random_transform",
]

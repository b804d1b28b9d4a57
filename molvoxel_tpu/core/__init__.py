from .config import (
    DENSITY_TYPE_LIST,
    RADII_TYPE_LIST,
    GridSpec,
    VoxelizerConfig,
    atom_bucket,
    round_up,
    small_atom_bucket,
)
from .density import binary_sq, density_sq, gaussian_notrunc_sq, gaussian_sq
from .transform import (
    RandomTransform,
    Transform,
    apply_quaternion,
    do_random_transform,
    do_transform,
    quaternion_to_matrix,
    random_quaternion,
    random_translation_vector,
)

__all__ = [
    "DENSITY_TYPE_LIST",
    "RADII_TYPE_LIST",
    "GridSpec",
    "VoxelizerConfig",
    "atom_bucket",
    "small_atom_bucket",
    "round_up",
    "binary_sq",
    "density_sq",
    "gaussian_sq",
    "gaussian_notrunc_sq",
    "RandomTransform",
    "Transform",
    "apply_quaternion",
    "do_random_transform",
    "do_transform",
    "quaternion_to_matrix",
    "random_quaternion",
    "random_translation_vector",
]

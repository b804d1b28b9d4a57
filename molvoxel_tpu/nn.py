"""Neural-network integration: the voxelizer as a differentiable layer.

Optional flax components (import requires ``flax``):

- ``VoxelizeLayer``: an ``nn.Module`` that renders padded molecule batches to
  grids inside the network — augmentation keys come from the flax RNG stream,
  and gradients flow back to coordinates/weights/radii (ops/autodiff.py).
  The reference can only precompute grids outside the learning framework
  (its torch path runs under no_grad, torch/voxelizer.py:115).
- ``VoxelCNN``: a compact 3-D convolutional encoder over (B, C, D, H, W)
  grids, usable as a default backbone for grid-based property prediction.

See examples/train_cnn.py for an end-to-end training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from flax import linen as nn

    FLAX_AVAILABLE = True
except ImportError:  # pragma: no cover
    nn = None
    FLAX_AVAILABLE = False

from .core.config import GridSpec
from .ops.batch import voxelize_batch

if FLAX_AVAILABLE:

    class VoxelizeLayer(nn.Module):
        """Differentiable molecule -> grid layer.

        Inputs: coords (B, V, 3), weights (B, V, C), mask (B, V) bool.
        Output: (B, C, D, H, W) float32 grids.

        When ``augment`` is True and a ``"voxelize"`` RNG is provided
        (``model.apply(..., rngs={"voxelize": key})``), each molecule gets a
        fresh random rotation/translation; deterministic otherwise.
        """

        spec: GridSpec
        density_type: str = "gaussian"
        sigma: float = 0.5
        radii: float = 1.0
        augment: bool = False
        random_translation: float = 0.0

        @nn.compact
        def __call__(self, coords, weights, mask):
            b, vp, _ = coords.shape
            radii = jnp.full((vp,), self.radii, jnp.float32)
            if self.augment and self.has_rng("voxelize"):
                keys = jax.random.split(self.make_rng("voxelize"), b)
                rot = True
                rt = self.random_translation
            else:
                keys = jax.random.split(jax.random.PRNGKey(0), b)
                rot = False
                rt = 0.0
            return voxelize_batch(
                coords, weights, radii, mask, None, keys, rt,
                spec=self.spec, density_type=self.density_type, sigma=self.sigma,
                random_rotation=rot, impl="auto",
            )

    class VoxelCNN(nn.Module):
        """Small 3-D CNN encoder: (B, C, D, H, W) -> (B, features)."""

        features: int = 64
        widths: tuple[int, ...] = (16, 32, 64)

        @nn.compact
        def __call__(self, grids):
            x = jnp.transpose(grids, (0, 2, 3, 4, 1))  # channels-last
            for w in self.widths:
                x = nn.Conv(w, (3, 3, 3), strides=2)(x)
                x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
            return nn.relu(nn.Dense(self.features)(x))

else:  # pragma: no cover

    class VoxelizeLayer:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError("molvoxel_tpu.nn requires flax")

    VoxelCNN = VoxelizeLayer

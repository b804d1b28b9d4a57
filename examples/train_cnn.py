"""End-to-end training demo: the voxelizer inside a jitted train step.

A tiny 3-D CNN learns to count nitrogen atoms from voxel grids.  Everything —
random rigid-body augmentation, voxelization, the network, the loss — is one
differentiable jit-compiled function; fresh augmentation is sampled every
step from the training PRNG.  (The reference can only pre-compute grids
outside the learning framework; here the deposit itself is a first-class
differentiable op, ops/autodiff.py.)

Run:  python examples/train_cnn.py        (~30s on CPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
    from flax import linen as nn
except ImportError:
    print("this example needs flax + optax")
    sys.exit(0)

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.ops.batch import voxelize_batch

SPEC = GridSpec(resolution=0.5, dimension=16)
BATCH, VP, C = 16, 128, 2  # channels: C-like, N-like


def make_dataset(rng, n=256):
    """Random 'molecules': 8-20 atoms, channel 1 marks nitrogens; the label
    is the nitrogen count."""
    coords = np.zeros((n, VP, 3), np.float32)
    weights = np.zeros((n, VP, C), np.float32)
    mask = np.zeros((n, VP), bool)
    labels = np.zeros((n,), np.float32)
    for i in range(n):
        v = int(rng.integers(8, 21))
        coords[i, :v] = rng.normal(scale=1.5, size=(v, 3))
        is_n = rng.uniform(size=v) < 0.3
        weights[i, :v, 0] = ~is_n
        weights[i, :v, 1] = is_n
        mask[i, :v] = True
        labels[i] = is_n.sum()
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask), jnp.asarray(labels)


class VoxelCNN(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, C, D, H, W)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # channels-last for conv
        x = nn.Conv(8, (3, 3, 3), strides=2)(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3, 3), strides=2)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(32)(x))
        return nn.Dense(1)(x)[:, 0]


def main(steps: int = 60):
    rng = np.random.default_rng(0)
    coords, weights, mask, labels = make_dataset(rng)
    radii = jnp.ones((VP,), jnp.float32)

    model = VoxelCNN()
    dummy = jnp.zeros((1, C, 16, 16, 16))
    params = model.init(jax.random.PRNGKey(0), dummy)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key, idx):
        bc, bw, bm, by = coords[idx], weights[idx], mask[idx], labels[idx]

        def loss_fn(p):
            keys = jax.random.split(key, BATCH)
            grids = voxelize_batch(
                bc, bw, radii, bm, None, keys, 0.5,
                spec=SPEC, density_type="gaussian", sigma=0.5,
                random_rotation=True, impl="auto",
            )
            pred = model.apply(p, grids)
            return jnp.mean((pred - by) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(42)
    n = coords.shape[0]
    losses = []
    for step in range(steps):
        key, sub, ksel = jax.random.split(key, 3)
        idx = jax.random.choice(ksel, n, (BATCH,), replace=False)
        params, opt_state, loss = train_step(params, opt_state, sub, idx)
        losses.append(float(loss))
        if step % 10 == 0:
            print(f"step {step:3d}  mse {losses[-1]:.3f}")

    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    print(f"mse: first-10 {first:.3f} -> last-10 {last:.3f}")
    assert last < first * 0.8, "training should reduce the loss"
    print("OK: the voxelizer trains end-to-end inside jit")


if __name__ == "__main__":
    main()

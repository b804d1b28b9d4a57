"""Multi-host / multi-chip scaling example.

On a TPU pod slice, launch one copy of this script per host (e.g. with
``gcloud compute tpus tpu-vm ssh --worker=all``); ``jax.distributed`` wires
the processes into one mesh and each host feeds its local shard of the
molecule library.  On a single host it runs on whatever devices exist —
simulate a pod with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multihost.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.parallel import (
    StreamingVoxelizer,
    initialize_distributed,
    make_mesh,
    voxelize_batch_2d,
)


def main():
    initialize_distributed()  # no-op single-process
    n = len(jax.devices())
    print(f"process {jax.process_index()}/{jax.process_count()}, {n} global devices")

    depth = 2 if n % 2 == 0 and n >= 2 else 1
    mesh = make_mesh(data=n // depth, depth=depth)
    spec = GridSpec(resolution=0.5, dimension=32)

    # each process generates (in production: reads) its local molecules
    rng = np.random.default_rng(jax.process_index())
    batch = mesh.shape["data"] * 4
    vp, v, c = 128, 40, 4
    coords = np.zeros((batch, vp, 3), np.float32)
    coords[:, :v] = rng.uniform(-5, 5, (batch, v, 3))
    weights = np.zeros((batch, vp, c), np.float32)
    weights[:, :v] = rng.uniform(size=(batch, v, c))
    mask = np.zeros((batch, vp), bool)
    mask[:, :v] = True

    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    grids, mass = voxelize_batch_2d(
        jnp.asarray(coords), jnp.asarray(weights), jnp.ones((vp,), jnp.float32),
        jnp.asarray(mask), None, keys, 0.5,
        mesh=mesh, spec=spec, random_rotation=True,
    )
    grids.block_until_ready()
    print(f"grids {grids.shape} sharded over {mesh.shape}; psum mass = {float(mass):.1f}")

    # streaming driver over the same mesh
    def clouds():
        for i in range(batch):
            yield coords[i, : 40], weights[i, : 40]

    sv = StreamingVoxelizer(spec, batch_size=mesh.shape["data"] * 2, mesh=mesh)
    stats = sv.run(clouds())
    print(f"streamed {stats.molecules} molecules in {stats.batches} batches")


if __name__ == "__main__":
    main()

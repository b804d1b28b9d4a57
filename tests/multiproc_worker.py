"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process brings 4 virtual CPU devices into a 2-process local cluster
(8 global devices), builds the global (data=8) mesh, assembles GLOBAL batch
arrays from process-local shards, runs the data-parallel voxelize path, and
prints a replicated global checksum.  The same workload is also computed
single-process on local devices; the two must agree — this proves the
process-boundary code path (jax.distributed + shard_map collectives over
gRPC) really executes, which the reference cannot do at all (SURVEY.md §2.5).

Usage: python tests/multiproc_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def main() -> int:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from molvoxel_tpu.core.config import GridSpec
    from molvoxel_tpu.ops.batch import voxelize_batch
    from molvoxel_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from molvoxel_tpu.parallel.sharded import voxelize_batch_dp

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert jax.process_count() == nproc, jax.process_count()
    assert n_global == nproc * n_local, (n_global, n_local)

    spec = GridSpec(resolution=0.5, dimension=16)
    mesh = make_mesh(data=n_global)

    # identical global inputs on every process (seeded)
    b, vp, v, c = n_global * 2, 32, 20, 4
    rng = np.random.default_rng(0)
    coords = np.zeros((b, vp, 3), np.float32)
    coords[:, :v] = rng.uniform(-3, 3, (b, v, 3)).astype(np.float32)
    weights = np.zeros((b, vp, c), np.float32)
    weights[:, :v] = rng.uniform(size=(b, v, c)).astype(np.float32)
    mask = np.zeros((b, vp), bool)
    mask[:, :v] = True
    keys = jax.device_get(jax.random.split(jax.random.PRNGKey(0), b))

    shard = NamedSharding(mesh, P(DATA_AXIS))

    def globalize(arr):
        return jax.make_array_from_process_local_data(shard, arr[pid * (b // nproc) : (pid + 1) * (b // nproc)])

    radii = jnp.ones((vp,), jnp.float32)
    out = voxelize_batch_dp(
        globalize(coords), globalize(weights), radii, globalize(mask), None,
        globalize(keys), 0.5, mesh=mesh, spec=spec, random_rotation=True,
    )
    got = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(out))

    # single-process reference on local devices: same inputs, same keys
    ref_out = voxelize_batch(
        jnp.asarray(coords), jnp.asarray(weights), radii, jnp.asarray(mask), None,
        jnp.asarray(keys), 0.5, spec=spec, density_type="gaussian", sigma=0.5,
        random_rotation=True,
    )
    want = float(jnp.sum(ref_out))

    ok = abs(got - want) <= 1e-3 * max(abs(want), 1.0)
    print(f"CHECK process={pid} got={got:.6f} want={want:.6f} ok={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Worker for the 2-process end-to-end STREAM test (tests/test_multiprocess.py).

parse (striped) -> global DP batch -> sharded voxelize -> per-host gridstore:
each process reads a disjoint stripe of one SDF (span striping), the batches
fuse into one global data-parallel array per step, and each process stores
its own rows with process_index in the manifest — the complete multi-host
library recipe (parallel/multihost.py), run for real across a process
boundary on a 2-process CPU local cluster.

Usage: python tests/multiproc_stream_worker.py <port> <pid> <nproc> <sdf> <store_root> [crash_after] [resume]

``crash_after N``: abort (exit 0, message CRASHED) after N batches have been
durably flushed — the fault-injection mode; ``resume``: restart from the
per-host store's provisional manifest.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"


def main() -> int:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    sdf, store_root = sys.argv[4], sys.argv[5]
    crash_after = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    resume = len(sys.argv) > 7 and sys.argv[7] == "resume"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from molvoxel_tpu.core.config import GridSpec
    from molvoxel_tpu.parallel.mesh import make_mesh
    from molvoxel_tpu.parallel.multihost import stream_dp_multiprocess

    spec = GridSpec(resolution=0.5, dimension=16)
    mesh = make_mesh(data=len(jax.devices()))

    class _Crash(Exception):
        pass

    done = [0]

    def crashing_consumer(images, batch):
        done[0] += 1
        if crash_after and done[0] >= crash_after:
            raise _Crash

    try:
        stats = stream_dp_multiprocess(
            sdf, ["C", "N", "O"], spec,
            mesh=mesh, batch_size=4, bucket=64, unknown=True,
            store_root=store_root, resume=resume,
            store_target_bytes=1,  # flush (and checkpoint) every batch
            consumer=crashing_consumer if crash_after else None,
            feeder_kwargs={"target_shard_bytes": 256},  # many spans -> real striping
        )
    except _Crash:
        print(f"CRASHED process={pid} after={done[0]} batches", flush=True)
        return 0
    print(f"STREAM process={pid} molecules={stats.molecules} batches={stats.batches} "
          f"skipped={stats.skipped}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

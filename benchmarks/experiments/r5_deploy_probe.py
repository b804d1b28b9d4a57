"""r5: deployment-shape row for the reference-protocol workload (VERDICT r4 #7).

The reference-protocol table (benchmarks/ref_protocol.py) measures
SYNCHRONOUS per-iteration host readback of full f32 grids — a topology that
is tunnel-bound on this host (~40 MB/s effective readback) and that no
supported pipeline uses.  This probe measures the same 48^3 complex workload
(10gs complex, ~6.6k points, batch 16) in the supported deployment shape:
grids stream into a gridstore (bf16 shards) via StreamingVoxelizer, with the
store flush overlapping the next batch's dispatch.  Reported as mols/s and
ms/vox beside the reference's 10.09 ms/vox (single) / 11.94 (features).

Run: timeout 1800 python benchmarks/experiments/r5_deploy_probe.py
"""

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.data import read_pdb, read_sdf  # noqa: E402
from molvoxel_tpu.data.gridstore import GridShardWriter  # noqa: E402
from molvoxel_tpu.parallel.stream import StreamingVoxelizer  # noqa: E402

DIM = 48
BATCH = 16
NMOL = 400


def load_complex():
    lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
    prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb").without_hydrogens()
    table = {"C": 0, "N": 1, "O": 2, "S": 3}
    lt = np.asarray([table.get(s, 3) for s in lig.symbols])
    pt = np.asarray([table.get(s, 3) for s in prot.symbols]) + 4
    coords = np.concatenate([lig.coords, prot.coords]).astype(np.float32)
    types = np.concatenate([lt, pt])
    feats = np.eye(8, dtype=np.float32)[types]
    center = lig.coords.mean(0).astype(np.float32)
    return coords - center, feats


def run_mode(name: str, coords, weights, out_dtype: str) -> float:
    spec = GridSpec(resolution=0.5, dimension=DIM)
    nch = weights.shape[1]

    def clouds():
        for _ in range(NMOL):
            yield coords, weights

    with tempfile.TemporaryDirectory() as td:
        writer = GridShardWriter(
            Path(td) / "store", [f"c{i}" for i in range(nch)],
            resolution=spec.resolution, dimension=spec.dimension,
        )
        sv = StreamingVoxelizer(
            spec, batch_size=BATCH, random_rotation=True, random_translation=0.5,
            out_dtype=out_dtype,
        )

        def consumer(images, batch):
            writer.append(np.asarray(images), batch.num_atoms)

        # warm the compile out of the timed region
        sv.run_batches(_batches(coords, weights, 1), None)
        t0 = time.time()
        stats = sv.run(clouds(), consumer)
        dt = time.time() - t0
        writer.finalize(stats.molecules)
        per = dt / stats.molecules
        print(f"{name:16s} {out_dtype:9s} {stats.molecules} mols  "
              f"{stats.molecules / dt:8,.1f} mols/s  ({per * 1e3:.2f} ms/vox)", flush=True)
        return per


def _batches(coords, weights, n):
    from molvoxel_tpu.data.pipeline import iter_batches

    return iter_batches(iter([(coords, weights)] * (n * BATCH)), BATCH)


def main():
    coords, feats = load_complex()
    single = np.ones((coords.shape[0], 1), np.float32)
    print(f"10gs complex deployment shape: {coords.shape[0]} pts, dim {DIM}, "
          f"batch {BATCH}, {NMOL} molecules -> gridstore", flush=True)
    for out_dtype in ("bfloat16", "float8_e4m3fn"):
        run_mode("single (1ch)", coords, single, out_dtype)
        run_mode("features (8ch)", coords, feats, out_dtype)


if __name__ == "__main__":
    main()

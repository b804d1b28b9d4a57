"""r5: GridStore -> training-input throughput (VERDICT r4 #9).

The bf16/fp8 grid stores are justified as a capacity lane for training input
pipelines (docs/DESIGN.md 4c).  This probe validates that claim with a
number: precompute a store of ligand 64^3 x 4ch grids in each dtype, then
read it through ``GridStoreDataset`` + ``torch.utils.data.DataLoader``
(shuffled, batch 64) and report grids/s for a full epoch — the rate a
training loop's input pipeline sees from the mmap'd shards.

Run: timeout 1800 python benchmarks/experiments/r5_gridstore_probe.py
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

NGRIDS = 2048
DIM = 64


def build_store(root: Path, out_dtype: str) -> None:
    import jax

    from molvoxel_tpu.core.config import GridSpec
    from molvoxel_tpu.data import read_sdf
    from molvoxel_tpu.data.gridstore import GridShardWriter
    from molvoxel_tpu.parallel.stream import StreamingVoxelizer

    lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
    table = {"C": 0, "N": 1, "O": 2, "S": 3}
    types = np.asarray([table.get(s, 3) for s in lig.symbols])
    feats = np.eye(4, dtype=np.float32)[types]
    coords = (lig.coords - lig.coords.mean(0)).astype(np.float32)

    spec = GridSpec(resolution=0.5, dimension=DIM)
    writer = GridShardWriter(root, ["C", "N", "O", "S"],
                             resolution=spec.resolution, dimension=spec.dimension)
    sv = StreamingVoxelizer(spec, batch_size=64, random_rotation=True,
                            random_translation=0.5, out_dtype=out_dtype)
    stats = sv.run(
        iter([(coords, feats)] * NGRIDS),
        lambda images, batch: writer.append(np.asarray(images), batch.num_atoms),
    )
    writer.finalize(stats.molecules)


def read_epoch(root: Path, label: str) -> None:
    import ml_dtypes  # noqa: F401 — registers bfloat16/fp8 numpy dtypes
    import torch

    from molvoxel_tpu.interop import GridStoreDataset

    ds = GridStoreDataset(root)
    loader = torch.utils.data.DataLoader(ds, batch_size=64, shuffle=True)
    # one warm pass (page cache), then the timed epoch — training reads the
    # store many times, so the warm rate is the honest steady-state number
    for _ in loader:
        pass
    t0 = time.time()
    n = 0
    for grids, _na in loader:
        # the DataLoader's collate already copies every grid out of the mmap;
        # no extra touch needed
        n += grids.shape[0]
    dt = time.time() - t0
    m = ds.reader.manifest
    gb = n * float(np.prod(m["grid_shape"])) * np.dtype(m["dtype"]).itemsize / 1e9
    print(f"{label:14s} {n} grids in {dt:.2f}s -> {n / dt:8,.0f} grids/s "
          f"({gb / dt:.2f} GB/s)", flush=True)


def main():
    for out_dtype, label in (("bfloat16", "bf16 shards"), ("float8_e4m3fn", "fp8 shards"),
                             ("float32", "f32 shards")):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td) / "store"
            build_store(root, out_dtype)
            read_epoch(root, label)


if __name__ == "__main__":
    main()

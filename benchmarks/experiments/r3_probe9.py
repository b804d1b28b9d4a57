"""r3_probe9: stream-from-disk A/B — numpy superbatch assembly vs the
all-native wire path (parse + assemble + presort + quantize in C).

Same session, same 50k-molecule SDF, idle host required (the lane is
host-bound on this 2-vCPU box; DESIGN.md 3b).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from molvoxel_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache(".jax_cache")

from molvoxel_tpu.core.config import GridSpec
from molvoxel_tpu.data.feed import SDFBatchFeeder, prefetch_iter
from molvoxel_tpu.parallel.stream import stream_checksum

PATH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lib50k.sdf"
SYMBOLS = ["C", "N", "O", "S"]
spec = GridSpec(0.5, 64)
SB = 4096


def run(mode: str, seed: int):
    feeder = SDFBatchFeeder(PATH, SYMBOLS, batch_size=SB, unknown=True, compact=True)
    src = feeder.iter_wire(spec) if mode == "native" else iter(feeder)
    t0 = time.time()
    stats, cs = stream_checksum(
        prefetch_iter(src), spec, chunk=256, density_type="gaussian",
        random_translation=0.5, random_rotation=True, out_dtype="bfloat16",
        seed=seed, wire=True,
    )
    wall = time.time() - t0
    return stats.molecules / wall, cs


for mode in ("numpy", "native"):
    run(mode, 0)  # warmup/compile
    best = 0.0
    for rep in range(3):
        rate, cs = run(mode, 1)
        best = max(best, rate)
    print(f"{mode:7s} {best:9.0f} mols/s  (checksum {cs:.3f})", flush=True)

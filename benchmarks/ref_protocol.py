"""Reference-protocol benchmark: the EXACT shape of the reference's timing
script, run on both implementations (VERDICT r3 missing #3).

Protocol replicated from /root/reference/test/test_time_numpy.py:19-21,74-115:
dim 48, batch 16, 25 iterations x 5 trials, each iteration a Python loop of
16 single voxelizations into ``out_grid[i]``; the metric is
seconds/voxelization of the best trial, for the 10gs complex point cloud
(~6.6k points) in its three forward modes (single / types / features).

The reference rows call the reference numpy backend itself (imported from
/root/reference; numpy+scipy only, its default — buggy — block binning).
The molvoxel_tpu rows run the same python-loop protocol (one forward per
molecule per slot, a device sync each iteration — the apples-to-apples row)
plus the framework-native batched call (one forward_batch(16) per
iteration), both with a per-iteration device fetch so the deferred-execution
tunnel cannot hide work (CLAUDE.md).

Usage:  python benchmarks/ref_protocol.py [--quick] [--skip-reference]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

DIM = 48
BATCH = 16
ITERS = 25
TRIALS = 5


def load_complex():
    from molvoxel_tpu.data import read_pdb, read_sdf

    lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
    prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb").without_hydrogens()
    table = {"C": 0, "N": 1, "O": 2, "S": 3}
    lt = np.asarray([table.get(s, 3) for s in lig.symbols])
    pt = np.asarray([table.get(s, 3) for s in prot.symbols]) + 4
    coords = np.concatenate([lig.coords, prot.coords]).astype(np.float64)
    types = np.concatenate([lt, pt]).astype(np.int16)
    feats = np.eye(8, dtype=np.float32)[types]
    center = lig.coords.mean(0)
    return coords, types, feats, center


def protocol(run_iteration) -> float:
    """best-trial seconds per voxelization of the reference protocol."""
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _ in range(ITERS):
            run_iteration()
        dt = time.time() - t0
        best = min(best, dt / (ITERS * BATCH))
    return best


def bench_reference(coords, types, feats, center):
    # run_test shape verbatim: /root/reference/test/test_time_numpy.py:11-15
    sys.path.insert(0, "/root/reference")
    from molvoxel.voxelizer.numpy import Voxelizer

    vox = Voxelizer(resolution=0.5, dimension=DIM)
    radii = 1.0
    rows = {}
    nct = int(types.max()) + 1
    for name, channels, nch in (
        ("single", None, 1),
        ("types", types, nct),
        ("features", feats, feats.shape[1]),
    ):
        grid = vox.get_empty_grid(nch, BATCH, init_zero=True)

        def it(channels=channels, grid=grid):
            for i in range(BATCH):
                vox.forward(coords, center, channels, radii, 0.5, True, out_grid=grid[i])

        rows[name] = protocol(it)
        print(f"reference numpy  {name:8s} {rows[name]*1e3:9.3f} ms/vox", flush=True)
    return rows


def bench_ours(coords, types, feats, center, batched: bool):
    import jax
    import jax.numpy as jnp

    from molvoxel_tpu import create_voxelizer

    vox = create_voxelizer(resolution=0.5, dimension=DIM)
    key = [jax.random.PRNGKey(0)]
    coords32 = coords.astype(np.float32)
    rows = {}
    label = "batched " if batched else "per-call"

    def fresh_key():
        key[0], sub = jax.random.split(key[0])
        return sub

    def make_iter(channels, nch):
        # both API surfaces return HOST numpy arrays — every iteration pays
        # the full grid fetch through the tunnel, exactly the reference
        # protocol's synchronous semantics
        if batched:
            clouds = [(coords32, channels) for _ in range(BATCH)]
            centers = [center] * BATCH

            def it():
                vox.forward_batch(
                    clouds, radii=1.0, centers=centers, random_rotation=True,
                    random_translation=0.5, key=fresh_key(),
                )

            return it

        def it():
            for _ in range(BATCH):
                vox.forward(
                    coords32, center, channels, 1.0, 0.5, True, key=fresh_key(),
                )

        return it

    nct = int(types.max()) + 1
    for name, channels in (
        ("single", None),
        ("types", types.astype(np.int32)),
        ("features", feats),
    ):
        if name == "single" and batched:
            channels = np.ones((coords32.shape[0], 1), np.float32)
        it = make_iter(channels, nct)
        it()  # compile
        rows[name] = protocol(it)
        print(f"molvoxel_tpu {label} {name:8s} {rows[name]*1e3:9.3f} ms/vox", flush=True)
    return rows


def main():
    quick = "--quick" in sys.argv
    global ITERS, TRIALS
    if quick:
        ITERS, TRIALS = 5, 2
    coords, types, feats, center = load_complex()
    print(f"10gs complex: {coords.shape[0]} points, dim {DIM}, batch {BATCH}, "
          f"{ITERS} iters x {TRIALS} trials", flush=True)
    ours_b = bench_ours(coords, types, feats, center, batched=True)
    ours_p = bench_ours(coords, types, feats, center, batched=False)
    ref = None
    if "--skip-reference" not in sys.argv:
        ref = bench_reference(coords, types, feats, center)
    print("\n| mode | reference numpy ms/vox | molvoxel_tpu per-call | molvoxel_tpu batched |")
    print("|---|---:|---:|---:|")
    for m in ("single", "types", "features"):
        r = f"{ref[m]*1e3:.2f}" if ref else "—"
        print(f"| {m} | {r} | {ours_p[m]*1e3:.2f} | {ours_b[m]*1e3:.2f} |")


if __name__ == "__main__":
    main()

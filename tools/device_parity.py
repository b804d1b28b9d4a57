"""Replay the golden parity suite on the CURRENT jax backend (e.g. real TPU).

tests/test_parity_golden.py runs the same fixtures, but the test suite is
pinned to the 8-device virtual CPU mesh (tests/conftest.py), where Pallas
executes in interpret mode.  This script is the on-hardware evidence for the
parity claims in PARITY.md: it drives the public API on whatever backend jax
picks (the real chip under the axon tunnel) and prints per-golden max abs
error against the reference-generated expectations.

Run:  timeout 580 python tools/device_parity.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402

from molvoxel_tpu import create_voxelizer  # noqa: E402

GOLDEN_DIR = REPO / "tests" / "goldens"
ATOL = 1e-5
TORCHREF_ATOL = 5e-5  # torch goldens carry the reference's own f32 rounding


def main() -> int:
    failures = 0
    paths = sorted(GOLDEN_DIR.glob("*.npz"))
    print(f"backend={jax.default_backend()}  goldens={len(paths)}", flush=True)
    for path in paths:
        g = np.load(path, allow_pickle=False)
        vox = create_voxelizer(
            resolution=float(g["resolution"]),
            dimension=int(g["dimension"]),
            radii_type=str(g["radii_type"]),
            density_type=str(g["density"]),
            sigma=float(g["sigma"]),
        )
        coords = g["coords"]
        center = g["center"] if g["center"].size else None
        radii = g["radii"]
        radii_arg = float(radii) if radii.ndim == 0 else radii
        mode = str(g["mode"])
        if mode == "features":
            out = vox.forward_features(coords, center, g["channels"].astype(np.float32), radii_arg)
        elif mode == "types":
            out = vox.forward_types(coords, center, g["channels"].astype(np.int32), radii_arg)
        else:
            out = vox.forward_single(coords, center, radii_arg)
        atol = TORCHREF_ATOL if path.stem.endswith("torchref") else ATOL
        err = float(np.abs(np.asarray(out) - g["expected"]).max())
        ok = err <= atol
        failures += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {path.stem:38s} max_err={err:.2e} (atol {atol:g})", flush=True)
    print(f"{len(paths) - failures}/{len(paths)} goldens within tolerance on {jax.default_backend()}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

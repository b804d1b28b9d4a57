"""r5: training-step rows for the new backward lanes (VERDICT r4 #2/#3).

Measures fwd vs fwd+grad per molecule through the production batched
custom_vjp path for:
- the bf16 (lowp) backward lane vs the f32 backward at protein 48^3/128^3,
- the channel-wise backward through the virtual-atom expansion (previously a
  dense O(V*D^3) replay) on the ligand channel-wise workload.

Run: timeout 1800 python benchmarks/experiments/r5_bwd_probe.py
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from benchmarks.report import load_cases, measure_backward  # noqa: E402


def main():
    cases = {r[0]: r for r in load_cases()}
    jobs = [
        ("ligand 64^3 x4ch", "float32", {}),
        ("ligand 64^3 x4ch", "bfloat16", {}),
        ("protein 48^3 x4ch (3.3k atoms)", "float32", {}),
        ("protein 48^3 x4ch (3.3k atoms)", "bfloat16", {}),
        ("protein 128^3 x4ch (3.3k atoms)", "float32", {}),
        ("protein 128^3 x4ch (3.3k atoms)", "bfloat16", {}),
        ("ligand 64^3 x4ch channel-wise radii", "float32",
         {"channelwise": True, "radii_c": np.asarray([0.9, 1.1, 1.3, 1.6], np.float32)}),
        ("ligand 64^3 x4ch channel-wise radii", "bfloat16",
         {"channelwise": True, "radii_c": np.asarray([0.9, 1.1, 1.3, 1.6], np.float32)}),
    ]
    for name, dtype, extra in jobs:
        row = cases[name]
        try:
            fwd_us, step_us = measure_backward(
                row[1].astype(np.float32), row[2], row[3], min(row[4], 8),
                out_dtype=dtype, **extra,
            )
            print(f"{name:42s} {dtype:9s} fwd {fwd_us:8.1f}  step {step_us:8.1f} us/mol  "
                  f"({step_us / fwd_us:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} {dtype} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

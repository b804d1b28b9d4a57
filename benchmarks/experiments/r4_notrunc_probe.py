"""r4 probe: gaussian_notrunc — separable einsum vs pruned Pallas (v5).

VERDICT r3 weak #1: 128^3 x 3.3k-atom notrunc was 1013 us/mol bf16 on the
separable path vs 273 us/mol for the *harder* exact kernel.  This probe
measures the underflow-pruned kernel lane (ops/pallas_deposit.notrunc_r2_
thresh) against the separable lane on the protein/complex workloads to set
the routing crossover (ops/voxelize.NOTRUNC_PALLAS_MIN_ATOMS).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import numpy as np  # noqa: E402

import report  # noqa: E402
import molvoxel_tpu.ops.voxelize as vx  # noqa: E402


def main():
    cases = report.load_cases()
    by_name = {name: (c, f, dim, batch, kw) for name, c, f, dim, batch, kw in cases}
    targets = [
        "protein 128^3 x4ch (3.3k atoms)",
        "protein 48^3 x4ch (3.3k atoms)",
        "complex 48^3 x13ch (6.6k pts)",
        "ligand 128^3 x4ch",
    ]
    for name in targets:
        coords, feats, dim, batch, kw = by_name[name]
        for out_dtype in ("bfloat16", "float32"):
            for lane, min_atoms in (("separable", 1 << 30), ("pallas", 0)):
                vx.NOTRUNC_PALLAS_MIN_ATOMS = min_atoms
                # the routing decision happens at trace time inside the jitted
                # voxelize_batch — drop the trace cache so the flag is seen
                import jax

                jax.clear_caches()
                per = report.measure(
                    coords, feats, dim, batch, "gaussian_notrunc", out_dtype=out_dtype,
                    d_count=kw.get("d_count"), channelwise=kw.get("channelwise", False),
                    radii_c=kw.get("radii_c"),
                )
                print(f"{name:40s} {out_dtype:9s} {lane:9s} {per * 1e6:10.1f} us/mol", flush=True)


if __name__ == "__main__":
    main()

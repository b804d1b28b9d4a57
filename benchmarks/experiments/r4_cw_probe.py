"""r4 probe: channel-wise radii — native shared-dyz2 kernel vs expansion.

VERDICT r3 weak #2: the virtual-atom expansion pays 3.2x the atom-wise cost
(28.9 vs 8.9 us/mol bf16 at 64^3 x4ch).  Measures the native _kernel_v5_cw
against the expansion fallback (forced via _CW_NATIVE_MAX_CHANNELS=0).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import numpy as np  # noqa: E402

import report  # noqa: E402
import molvoxel_tpu.ops.pallas_deposit as pd  # noqa: E402


def main():
    import jax

    cases = report.load_cases()
    by_name = {name: (c, f, dim, batch, kw) for name, c, f, dim, batch, kw in cases}
    name = "ligand 64^3 x4ch channel-wise radii"
    coords, feats, dim, batch, kw = by_name[name]
    for density in ("gaussian", "binary"):
        for out_dtype in ("bfloat16", "float32"):
            for lane, max_c in (("native", 16), ("expansion", 0)):
                pd._CW_NATIVE_MAX_CHANNELS = max_c
                jax.clear_caches()
                per = report.measure(
                    coords, feats, dim, batch, density, out_dtype=out_dtype,
                    channelwise=True, radii_c=kw["radii_c"],
                )
                print(f"{density:9s} {out_dtype:9s} {lane:10s} {per * 1e6:8.1f} us/mol", flush=True)


if __name__ == "__main__":
    main()

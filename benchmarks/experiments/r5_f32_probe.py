"""r5: decompose the f32 parity lane's cost (VERDICT r4 weak #4).

f32 grids (20.5 us/mol) run 2.4x slower than bf16 (8.7) while writing only
2x the bytes; on a pure write-bound story the expected ratio is ~2x, so
~15-20% looked unaccounted.  The missing term hypothesis: the f32 lane's
matmuls run HIGHEST precision (6 bf16 passes per contraction — the accuracy
mandate for 1e-5 golden parity) while the bf16 lane runs ONE bf16-input
pass.  This probe isolates it with a timing-only variant: f32 output path
with the matmul forced to single-pass bf16 inputs (_run_v5 lowp=True,
cast=False — numerically out of parity budget, measurement only).

  A. f32 out, HIGHEST matmul (production parity lane)
  B. f32 out, bf16 matmul (timing-only)       -> A - B = the HIGHEST term
  C. bf16 out, bf16 matmul (production lane)  -> B - C = the write-bytes term

All three on the headline ligand workload (64^3 x 4ch gaussian, batch 64,
random rigid transforms, witness consumer, full materialization).

Run: timeout 1800 python benchmarks/experiments/r5_f32_probe.py
"""

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from molvoxel_tpu.core.config import GridSpec, small_atom_bucket  # noqa: E402
from molvoxel_tpu.core.transform import do_random_transform  # noqa: E402
from molvoxel_tpu.data import read_sdf  # noqa: E402
from molvoxel_tpu.ops import pallas_deposit as pd  # noqa: E402

BATCH = 64
DIM = 64


def load_ligand():
    lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
    table = {"C": 0, "N": 1, "O": 2, "S": 3}
    types = np.asarray([table.get(s, 3) for s in lig.symbols])
    feats = np.eye(4, dtype=np.float32)[types]
    coords = (lig.coords - lig.coords.mean(0)).astype(np.float32)
    return coords, feats


def measure(variant: str, coords, feats) -> float:
    spec = GridSpec(resolution=0.5, dimension=DIM)
    v, c = feats.shape
    # _run_v5 is called directly (below the packing layer), so Vp must be a
    # 128-multiple; absolute rates are therefore ~the unpacked lane, but the
    # A/B/C *differences* are the decomposition of interest
    vp = max(small_atom_bucket(v), 128)
    bc = np.zeros((BATCH, vp, 3), np.float32)
    bw = np.zeros((BATCH, vp, c), np.float32)
    bc[:, :v] = coords[None]
    bw[:, :v] = feats[None]
    mask = np.zeros((BATCH, vp), bool)
    mask[:, :v] = True
    bc, bw, mask = jnp.asarray(bc), jnp.asarray(bw), jnp.asarray(mask)
    radii = jnp.ones((BATCH, vp), jnp.float32)

    out_dtype = "bfloat16" if variant == "C" else "float32"
    lowp = None if variant == "A" else True  # A: follow cast (f32 -> HIGHEST)
    hwt = pd._row_tile(DIM * DIM, DIM)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
            crd = jax.vmap(lambda k, cc: do_random_transform(k, cc, None, 0.5, True))(keys, bc)
            out = pd._run_v5(crd, bw, radii, mask, spec, True, 0.5, 0, None, hwt,
                             out_dtype=out_dtype, lowp=lowp)
            return acc + jnp.sum(out[:1].astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    run(1)
    run(17)
    base = min(run(1) for _ in range(3))
    best = min(run(17) for _ in range(3))
    return max((best - base) / (16 * BATCH), 1e-9)


def main():
    coords, feats = load_ligand()
    labels = {
        "A": "f32 out, HIGHEST matmul (parity lane)",
        "B": "f32 out, bf16 matmul (timing-only)",
        "C": "bf16 out, bf16 matmul (production)",
    }
    res = {}
    for variant in ("A", "B", "C"):
        per = measure(variant, coords, feats)
        res[variant] = per * 1e6
        print(f"{variant}. {labels[variant]:42s} {per * 1e6:7.2f} us/mol "
              f"({1.0 / per:,.0f} mols/s)", flush=True)
    print(f"\nHIGHEST-matmul term (A-B): {res['A'] - res['B']:.2f} us/mol", flush=True)
    print(f"write-bytes term     (B-C): {res['B'] - res['C']:.2f} us/mol", flush=True)


if __name__ == "__main__":
    main()

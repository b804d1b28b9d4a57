"""r4 probe: Pallas backward kernel speed vs forward (target: bwd <= 5x fwd).

Measures voxelize_pallas_batch (forward) and voxelize_pallas_bwd_batch
(gradient deposit) on the BENCHMARKS workloads; the backward consumes a
random cotangent grid and returns per-atom (dcoords, dweights, dradii) —
Pallas outputs are opaque, so a plain sum consumer is safe.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import functools  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import report  # noqa: E402
from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.ops.pallas_deposit import (  # noqa: E402
    voxelize_pallas_batch,
    voxelize_pallas_bwd_batch,
)


def measure(fn, batch):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            out = fn(k)
            return acc + sum(jnp.sum(o[:1].astype(jnp.float32)) for o in jax.tree.leaves(out)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    run(1)
    run(9)
    base = min(run(1) for _ in range(3))
    best = min(run(9) for _ in range(3))
    return max((best - base) / (8 * batch), 1e-9)


def main():
    cases = report.load_cases()
    by_name = {name: (c, f, dim, batch, kw) for name, c, f, dim, batch, kw in cases}
    for name in ("ligand 64^3 x4ch", "protein 48^3 x4ch (3.3k atoms)",
                 "protein 128^3 x4ch (3.3k atoms)"):
        coords, feats, dim, batch, kwx = by_name[name]
        batch = min(batch, 8)
        spec = GridSpec(0.5, dim)
        bc, bw, mask, vp = report.pad_batch(coords, feats, batch)
        radii = jnp.ones((vp,), jnp.float32)
        ctshape = (batch, feats.shape[1], dim, dim, dim)
        ct = jnp.asarray(np.random.default_rng(0).normal(size=ctshape).astype(np.float32))

        def fwd(k, bc=bc, bw=bw, radii=radii, mask=mask, spec=spec):
            noise = jax.random.uniform(k, (1, 1, 3), jnp.float32) * 1e-4
            return voxelize_pallas_batch(bc + noise, bw, radii, spec=spec, mask=mask)

        def bwd(k, bc=bc, bw=bw, radii=radii, mask=mask, ct=ct, spec=spec):
            noise = jax.random.uniform(k, (1, 1, 3), jnp.float32) * 1e-4
            return voxelize_pallas_bwd_batch(bc + noise, bw, radii, ct, spec=spec, mask=mask)

        tf = measure(fwd, batch)
        tb = measure(bwd, batch)
        print(f"{name:40s} fwd {tf*1e6:8.1f} us/mol   bwd {tb*1e6:8.1f} us/mol   ratio {tb/tf:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

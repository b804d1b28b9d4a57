"""Headline benchmark: ligand voxelizations/s, 64^3 grid x 4 channels, gaussian.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = BASELINE.md north-star target of 100,000 ligand voxelizations/s
per chip (the reference publishes no numbers of its own).

Methodology notes:
- The axon TPU tunnel defers execution (block_until_ready returns before
  device work completes), so timing must force real execution: the whole
  measurement loop runs inside one jit as a lax.fori_loop whose iterations
  depend on fresh PRNG keys (no CSE), accumulate a scalar, and the scalar is
  fetched to host.  A 1-iteration run is subtracted as dispatch baseline.
- Each iteration voxelizes a batch of B random ligands (60 atoms padded to
  128) with random rotation + 0.5 A translation — the reference timing
  protocol's augmentation settings (/root/reference/test/test_time_numpy.py).
"""

import functools
import json
import time

import numpy as np

BASELINE_MOLS_PER_S = 100_000.0


def main():
    import jax
    import jax.numpy as jnp

    from molvoxel_tpu.core.config import GridSpec
    from molvoxel_tpu.ops.batch import voxelize_batch

    spec = GridSpec(resolution=0.5, dimension=64)
    batch, vp, v, c = 64, 128, 60, 4

    rng = np.random.default_rng(0)
    coords = np.zeros((batch, vp, 3), np.float32)
    coords[:, :v] = rng.uniform(-8, 8, (batch, v, 3))
    weights = np.zeros((batch, vp, c), np.float32)
    weights[:, :v] = (rng.uniform(size=(batch, v, c)) < 0.3).astype(np.float32)
    radii = jnp.ones((vp,), jnp.float32)
    mask = np.zeros((batch, vp), bool)
    mask[:, :v] = True
    coords, weights, mask = jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            out = voxelize_batch(
                coords, weights, radii, mask, None, keys, 0.5,
                spec=spec, density_type="gaussian", sigma=0.5,
                random_rotation=True, impl="auto",
            )
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        s = float(bench_loop(jax.random.PRNGKey(1), n))
        return time.time() - t0, s

    # warm both iteration counts (separate compiles)
    run(1)
    run(33)
    base = min(run(1)[0] for _ in range(3))
    best = min(run(33)[0] for _ in range(3))
    per_mol = (best - base) / (32 * batch)
    mols_per_s = 1.0 / per_mol

    print(
        json.dumps(
            {
                "metric": "ligand_voxelizations_per_s_64c4_gaussian",
                "value": round(mols_per_s, 1),
                "unit": "mols/s",
                "vs_baseline": round(mols_per_s / BASELINE_MOLS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

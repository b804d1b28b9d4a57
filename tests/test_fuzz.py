"""Randomized cross-implementation fuzzing: pallas (interpret) vs dense vs oracle.

Twenty random configurations across dimensions, channel counts, radii modes,
densities, and atom counts — every implementation must agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.core.config import atom_bucket
from molvoxel_tpu.ops.dense import voxelize_dense, voxelize_dense_channelwise
from molvoxel_tpu.ops.pallas_deposit import voxelize_pallas, voxelize_pallas_channelwise

CASES = []
_rng = np.random.default_rng(777)
for i in range(20):
    CASES.append(
        dict(
            dim=int(_rng.choice([8, 12, 16, 20, 24])),
            res=float(_rng.choice([0.25, 0.5, 0.75])),
            v=int(_rng.integers(1, 200)),
            c=int(_rng.integers(1, 9)),
            density=str(_rng.choice(["gaussian", "binary"])),
            radii_mode=str(_rng.choice(["scalar", "atom", "channel"])),
            sigma=float(_rng.choice([0.4, 0.5, 1.0])),
            seed=i,
        )
    )


@pytest.mark.parametrize("case", CASES, ids=[f"case{c['seed']}" for c in CASES])
def test_fuzz_pallas_vs_dense(case):
    rng = np.random.default_rng(case["seed"])
    spec = GridSpec(resolution=case["res"], dimension=case["dim"])
    v, c = case["v"], case["c"]
    vp = atom_bucket(v)
    extent = spec.width / 2 + 1.0  # include out-of-box atoms

    coords = np.zeros((vp, 3), np.float32)
    coords[:v] = rng.uniform(-extent, extent, (v, 3))
    weights = np.zeros((vp, c), np.float32)
    weights[:v] = rng.uniform(-1.0, 1.0, (v, c))  # negative weights allowed
    mask = np.zeros((vp,), bool)
    mask[:v] = True

    kw = dict(spec=spec, density_type=case["density"], sigma=case["sigma"], mask=jnp.asarray(mask))
    if case["radii_mode"] == "channel":
        radii = rng.uniform(0.5, 2.0, (c,)).astype(np.float32)
        got = voxelize_pallas_channelwise(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), **kw
        )
        want = voxelize_dense_channelwise(
            jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), **kw
        )
    else:
        if case["radii_mode"] == "atom":
            radii = np.ones((vp,), np.float32)
            radii[:v] = rng.uniform(0.5, 2.0, (v,))
        else:
            radii = np.full((vp,), float(rng.uniform(0.5, 2.0)), np.float32)
        got = voxelize_pallas(jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), **kw)
        want = voxelize_dense(jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii), **kw)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert np.all(np.isfinite(np.asarray(got)))

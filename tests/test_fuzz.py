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


# ---------------------------------------------------------------------------
# backward fuzz: the custom_vjp route (kernel backward or dense fallback,
# picked by pallas_bwd_supported) must match the dense-path VJP on random
# configurations, including channel-wise radii and depth slabs.
# ---------------------------------------------------------------------------

BWD_CASES = []
_brng = np.random.default_rng(778)
for i in range(10):
    dim = int(_brng.choice([8, 12, 16, 20, 24]))
    slab = bool(_brng.integers(0, 2)) and dim >= 16
    BWD_CASES.append(
        dict(
            dim=dim,
            res=float(_brng.choice([0.25, 0.5])),
            v=int(_brng.integers(1, 160)),
            c=int(_brng.integers(1, 6)),
            radii_mode=str(_brng.choice(["scalar", "atom", "channel"])),
            sigma=float(_brng.choice([0.5, 1.0])),
            d_offset=int(_brng.integers(0, dim // 2)) if slab else 0,
            d_count=int(dim // 2) if slab else None,
            seed=100 + i,
        )
    )


@pytest.mark.parametrize("case", BWD_CASES, ids=[f"bwd{c['seed']}" for c in BWD_CASES])
def test_fuzz_backward_pallas_vs_dense(case):
    import jax

    from molvoxel_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(case["seed"])
    spec = GridSpec(resolution=case["res"], dimension=case["dim"])
    v, c = case["v"], case["c"]
    vp = atom_bucket(v)
    extent = spec.width / 2 + 0.5

    coords = np.zeros((vp, 3), np.float32)
    coords[:v] = rng.uniform(-extent, extent, (v, 3))
    weights = np.zeros((vp, c), np.float32)
    weights[:v] = rng.uniform(-1.0, 1.0, (v, c))
    mask = np.zeros((vp,), bool)
    mask[:v] = True
    channelwise = case["radii_mode"] == "channel"
    if channelwise:
        radii = rng.uniform(0.6, 1.8, (c,)).astype(np.float32)
    elif case["radii_mode"] == "atom":
        radii = np.ones((vp,), np.float32)
        radii[:v] = rng.uniform(0.6, 1.8, (v,))
    else:
        radii = np.full((vp,), float(rng.uniform(0.6, 1.8)), np.float32)

    dl = case["d_count"] if case["d_count"] is not None else case["dim"]
    ct = rng.normal(size=(c, dl, case["dim"], case["dim"])).astype(np.float32)

    def run(impl):
        def f(cd, w, r):
            return voxelize(
                cd, w, r, spec=spec, density_type="gaussian", sigma=case["sigma"],
                mask=jnp.asarray(mask), channelwise_radii=channelwise, impl=impl,
                d_offset=case["d_offset"], d_count=case["d_count"],
            )

        out, vjp = jax.vjp(f, jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(radii))
        return np.asarray(out), [np.asarray(t) for t in vjp(jnp.asarray(ct))]

    out_p, grads_p = run("pallas")
    out_d, grads_d = run("dense")
    np.testing.assert_allclose(out_p, out_d, atol=2e-5)
    # gradient scale grows with the cotangent; bound the comparison relative
    # to each gradient's own magnitude (matches the on-device gate's bar)
    for gp, gd, name in zip(grads_p, grads_d, ("dcoords", "dweights", "dradii")):
        scale = max(float(np.abs(gd).max()), 1.0)
        np.testing.assert_allclose(gp, gd, atol=1e-4 * scale, err_msg=name)
        assert np.all(np.isfinite(gp)), name

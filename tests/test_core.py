"""Core unit tests: config, density kernels, quaternion transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvoxel_tpu.core import (
    GridSpec,
    VoxelizerConfig,
    apply_quaternion,
    atom_bucket,
    binary_sq,
    do_random_transform,
    do_transform,
    gaussian_sq,
    quaternion_to_matrix,
    random_quaternion,
)


class TestGridSpec:
    def test_geometry_matches_reference_formulas(self):
        spec = GridSpec(resolution=0.5, dimension=48)
        assert spec.width == pytest.approx(0.5 * 47)
        assert spec.upper_bound == pytest.approx(spec.width / 2)
        assert spec.lower_bound == pytest.approx(-spec.width / 2)
        assert spec.grid_dimension(5) == (5, 48, 48, 48)
        ax = spec.axis()
        assert ax.shape == (48,)
        assert ax[0] == pytest.approx(-spec.width / 2)
        assert ax[-1] == pytest.approx(spec.width / 2)
        np.testing.assert_allclose(np.diff(ax), 0.5, rtol=1e-6)

    def test_hashable_static_arg(self):
        assert hash(GridSpec(0.5, 48)) == hash(GridSpec(0.5, 48))
        assert GridSpec(0.5, 48) == GridSpec(0.5, 48)
        assert GridSpec(0.5, 48) != GridSpec(0.5, 64)

    def test_validation(self):
        with pytest.raises(ValueError):
            GridSpec(dimension=0)
        with pytest.raises(ValueError):
            VoxelizerConfig(radii_type="bogus")
        with pytest.raises(ValueError):
            VoxelizerConfig(density_type="bogus")

    def test_atom_bucket(self):
        assert atom_bucket(1) == 128
        assert atom_bucket(128) == 128
        assert atom_bucket(129) == 256
        assert atom_bucket(300) == 384
        assert atom_bucket(6651) == 8192
        for v in [1, 50, 129, 1000, 6651]:
            b = atom_bucket(v)
            assert b >= v
            assert b % 128 == 0, "pallas atom chunks require 128-multiples"


class TestDensity:
    def test_gaussian_matches_formula(self):
        d = np.linspace(0, 2.0, 101)
        r, sigma = 1.3, 0.5
        got = np.asarray(gaussian_sq(jnp.asarray(d**2), jnp.asarray(r**2), sigma))
        want = np.exp(-0.5 * ((d / r) / sigma) ** 2)
        want[d / r > 1.0] = 0.0
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gaussian_boundary_inclusive(self):
        # reference zeroes strictly dr > 1.0, keeping d == r (numpy semantics)
        val = float(gaussian_sq(jnp.asarray(1.0), jnp.asarray(1.0), 0.5))
        assert val == pytest.approx(np.exp(-2.0), rel=1e-5)
        assert float(gaussian_sq(jnp.asarray(1.0001), jnp.asarray(1.0), 0.5)) == 0.0

    def test_binary_boundary_inclusive(self):
        assert float(binary_sq(jnp.asarray(1.0), jnp.asarray(1.0))) == 1.0
        assert float(binary_sq(jnp.asarray(1.0001), jnp.asarray(1.0))) == 0.0
        assert float(binary_sq(jnp.asarray(0.0), jnp.asarray(1.0))) == 1.0


def _quat_oracle(pos, q):
    # Hamilton product q * p * q^-1, transcribed from the wiki formula the
    # reference cites — independent check of the matrix form.
    w, x, y, z = q

    def mul(a, b):
        a0, a1, a2, a3 = a
        b0, b1, b2, b3 = b
        return (
            a0 * b0 - a1 * b1 - a2 * b2 - a3 * b3,
            a0 * b1 + a1 * b0 + a2 * b3 - a3 * b2,
            a0 * b2 - a1 * b3 + a2 * b0 + a3 * b1,
            a0 * b3 + a1 * b2 - a2 * b1 + a3 * b0,
        )

    out = []
    for p in pos:
        pq = (0.0, p[0], p[1], p[2])
        r0 = mul(mul((w, x, y, z), pq), (w, -x, -y, -z))
        out.append(r0[1:])
    return np.asarray(out)


class TestTransform:
    def test_random_quaternion_is_unit(self):
        for i in range(5):
            q = np.asarray(random_quaternion(jax.random.PRNGKey(i)))
            assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-5)

    def test_matrix_matches_hamilton_product(self, rng):
        q = np.asarray(random_quaternion(jax.random.PRNGKey(3), dtype=jnp.float64))
        pos = rng.normal(size=(17, 3))
        got = np.asarray(apply_quaternion(jnp.asarray(pos), jnp.asarray(q)))
        want = _quat_oracle(pos, q)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotation_preserves_norms(self, rng):
        q = random_quaternion(jax.random.PRNGKey(9))
        pos = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        rotated = apply_quaternion(pos, q)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rotated), axis=1),
            np.linalg.norm(np.asarray(pos), axis=1),
            rtol=1e-5,
        )

    def test_rotation_matrix_orthonormal(self):
        rot = np.asarray(quaternion_to_matrix(random_quaternion(jax.random.PRNGKey(11))))
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-5)

    def test_do_transform_about_center(self, rng):
        coords = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        center = jnp.asarray(coords.mean(0))
        q = random_quaternion(jax.random.PRNGKey(2))
        out = do_transform(coords, center=center, quaternion=q)
        # rotation about the centroid preserves the centroid
        np.testing.assert_allclose(np.asarray(out.mean(0)), np.asarray(center), atol=1e-5)

    def test_identity_when_no_randomness(self, rng):
        coords = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        out = do_random_transform(jax.random.PRNGKey(0), coords, None, 0.0, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(coords), atol=0)

    def test_translation_bounded(self):
        coords = jnp.zeros((4, 3))
        out = do_random_transform(jax.random.PRNGKey(5), coords, None, 0.75, False)
        assert np.all(np.abs(np.asarray(out)) <= 0.75)

    def test_deterministic_in_key(self, rng):
        coords = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        a = do_random_transform(jax.random.PRNGKey(7), coords, None, 0.5, True)
        b = do_random_transform(jax.random.PRNGKey(7), coords, None, 0.5, True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = do_random_transform(jax.random.PRNGKey(8), coords, None, 0.5, True)
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestConfigSerialization:
    def test_roundtrip(self):
        import json

        cfg = VoxelizerConfig(
            grid=GridSpec(0.25, 32), radii_type="atom-wise", density_type="binary", sigma=0.7
        )
        d = json.loads(json.dumps(cfg.to_dict()))
        back = VoxelizerConfig.from_dict(d)
        assert back == cfg

    def test_defaults(self):
        assert VoxelizerConfig.from_dict({}) == VoxelizerConfig()

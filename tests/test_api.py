"""API facade tests: reference-parity surface of Voxelizer / factories.

Assertion style mirrors the reference test suite
(/root/reference/test/test_run_numpy.py): determinism, out_grid identity,
types == one-hot-features consistency.
"""

import numpy as np
import pytest

from molvoxel_tpu import create_random_transform, create_voxelizer
from molvoxel_tpu.api.voxelizer import Voxelizer

from .oracle import voxelize_oracle

DIM = 16
RES = 0.5


@pytest.fixture
def cloud(rng):
    v, c = 30, 6
    coords = rng.uniform(-3.0, 3.0, size=(v, 3)).astype(np.float32)
    features = (rng.uniform(size=(v, c)) < 0.4).astype(np.float32)
    types = rng.integers(0, c, size=(v,)).astype(np.int32)
    center = coords.mean(0)
    return coords, features, types, center


def make_voxelizer(**kw):
    kw.setdefault("resolution", RES)
    kw.setdefault("dimension", DIM)
    return create_voxelizer(**kw)


class TestFactory:
    def test_defaults_match_reference(self):
        vox = create_voxelizer()
        assert vox.resolution == 0.5
        assert vox.dimension == 64
        assert vox.radii_type == "scalar"
        assert vox.density_type == "gaussian"
        assert vox.sigma == 0.5

    def test_library_arg_accepted(self):
        for lib in ("jax", "numpy", "numba", "torch"):
            assert isinstance(create_voxelizer(library=lib), Voxelizer)
        with pytest.raises(AssertionError):
            create_voxelizer(library="cuda")

    def test_create_random_transform(self):
        t = create_random_transform(0.5, True)
        assert t.random_translation == 0.5
        assert t.random_rotation is True

    def test_properties(self):
        vox = make_voxelizer()
        assert vox.width == pytest.approx(RES * (DIM - 1))
        assert vox.upper_bound == pytest.approx(vox.width / 2)
        assert vox.spatial_dimension == (DIM, DIM, DIM)
        assert vox.grid_dimension(7) == (7, DIM, DIM, DIM)
        assert vox.is_radii_type_scalar and vox.is_density_type_gaussian
        vox.radii_type = "atom-wise"
        assert vox.is_radii_type_atom_wise
        vox.density_type = "binary"
        assert vox.is_density_type_binary


class TestForward:
    def test_features_matches_oracle(self, cloud):
        coords, features, _, center = cloud
        vox = make_voxelizer()
        out = vox.forward_features(coords, center, features, 1.0)
        want = voxelize_oracle(coords - center, features, 1.0, RES, DIM, "gaussian", 0.5)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_forward_dispatch(self, cloud):
        coords, features, types, center = cloud
        vox = make_voxelizer()
        np.testing.assert_array_equal(
            vox.forward(coords, center, features, 1.0), vox.forward_features(coords, center, features, 1.0)
        )
        np.testing.assert_array_equal(
            vox.forward(coords, center, types, 1.0), vox.forward_types(coords, center, types, 1.0)
        )
        np.testing.assert_array_equal(
            vox.forward(coords, center, None, 1.0), vox.forward_single(coords, center, 1.0)
        )

    def test_types_equals_onehot_features(self, cloud):
        # consistency assertion from /root/reference/test/test_time_numpy.py:67-69
        coords, _, types, center = cloud
        vox = make_voxelizer()
        c = int(types.max()) + 1
        onehot = np.eye(c, dtype=np.float32)[types]
        got_types = vox.forward_types(coords, center, types, 1.0)
        got_feat = vox.forward_features(coords, center, onehot, 1.0)
        np.testing.assert_allclose(got_types, got_feat, atol=1e-5)

    def test_single_is_summed_channels(self, cloud):
        coords, _, _, center = cloud
        vox = make_voxelizer()
        single = vox.forward_single(coords, center, 1.0)
        assert single.shape == (1, DIM, DIM, DIM)
        ones = np.ones((coords.shape[0], 1), np.float32)
        feat = vox.forward_features(coords, center, ones, 1.0)
        np.testing.assert_allclose(single, feat, atol=1e-6)

    def test_deterministic_without_randomness(self, cloud):
        coords, features, _, center = cloud
        vox = make_voxelizer()
        a = vox.forward_features(coords, center, features, 1.0)
        b = vox.forward_features(coords, center, features, 1.0)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_out_grid_identity_contract(self, cloud):
        # reference contract: returned grid `is` the passed buffer
        # (/root/reference/test/test_run_numpy.py:46-47)
        coords, features, types, center = cloud
        vox = make_voxelizer()
        c = features.shape[1]
        out = vox.get_empty_grid(c)
        ret = vox.forward_features(coords, center, features, 1.0, out_grid=out)
        assert ret is out
        ref = vox.forward_features(coords, center, features, 1.0)
        np.testing.assert_allclose(out, ref, atol=1e-6)

        out2 = vox.get_empty_grid(c)
        ret2 = vox.forward_types(coords, center, types, 1.0, out_grid=out2)
        assert ret2 is out2

        out3 = vox.get_empty_grid(1)
        ret3 = vox.forward_single(coords, center, 1.0, out_grid=out3)
        assert ret3 is out3

    def test_out_grid_extra_channels_zeroed(self, cloud):
        coords, _, types, center = cloud
        vox = make_voxelizer()
        c = int(types.max()) + 1
        out = np.full((c + 2, DIM, DIM, DIM), 7.0, dtype=np.float32)
        ret = vox.forward_types(coords, center, types, 1.0, out_grid=out)
        assert ret is out
        assert np.all(out[c:] == 0.0)

    def test_atom_wise_radii(self, cloud, rng):
        coords, features, _, center = cloud
        radii = rng.uniform(0.8, 1.6, size=(coords.shape[0],)).astype(np.float32)
        vox = make_voxelizer(radii_type="atom-wise")
        out = vox.forward_features(coords, center, features, radii)
        want = voxelize_oracle(coords - center, features, radii, RES, DIM, "gaussian", 0.5)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_channel_wise_radii_features(self, cloud, rng):
        coords, features, _, center = cloud
        c = features.shape[1]
        radii = rng.uniform(0.8, 1.6, size=(c,)).astype(np.float32)
        vox = make_voxelizer(radii_type="channel-wise")
        out = vox.forward_features(coords, center, features, radii)
        want = voxelize_oracle(coords - center, features, radii, RES, DIM, "gaussian", 0.5, channelwise_radii=True)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_channel_wise_radii_types_gathers_per_atom(self, cloud, rng):
        coords, _, types, center = cloud
        c = int(types.max()) + 1
        radii = rng.uniform(0.8, 1.6, size=(c,)).astype(np.float32)
        vox = make_voxelizer(radii_type="channel-wise")
        out = vox.forward_types(coords, center, types, radii)
        onehot = np.eye(c, dtype=np.float32)[types]
        want = voxelize_oracle(coords - center, onehot, radii[types], RES, DIM, "gaussian", 0.5)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_binary_density(self, cloud):
        coords, features, _, center = cloud
        vox = make_voxelizer(density_type="binary")
        out = vox.forward_features(coords, center, features, 1.0)
        want = voxelize_oracle(coords - center, features, 1.0, RES, DIM, "binary", 0.5)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_sigma_kwarg(self, cloud):
        coords, features, _, center = cloud
        vox = make_voxelizer(sigma=1.0)
        out = vox.forward_features(coords, center, features, 1.0)
        want = voxelize_oracle(coords - center, features, 1.0, RES, DIM, "gaussian", 1.0)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_random_transform_reproducible_by_key(self, cloud):
        import jax

        coords, features, _, center = cloud
        vox = make_voxelizer()
        key = jax.random.PRNGKey(42)
        a = vox.forward_features(coords, center, features, 1.0, 0.5, True, key=key)
        b = vox.forward_features(coords, center, features, 1.0, 0.5, True, key=key)
        np.testing.assert_allclose(a, b, atol=0)
        c2 = vox.forward_features(coords, center, features, 1.0, 0.5, True)
        assert not np.allclose(a, c2)

    def test_total_mass_conserved_under_rotation(self, rng):
        # tight cloud well inside the box: total deposited gaussian mass is
        # rotation-invariant up to grid discretization
        import jax

        coords = rng.uniform(-1.5, 1.5, size=(20, 3)).astype(np.float32)
        features = rng.uniform(size=(20, 3)).astype(np.float32)
        vox = make_voxelizer(dimension=32)
        base = vox.forward_features(coords, None, features, 1.0)
        rot = vox.forward_features(coords, None, features, 1.0, 0.0, True, key=jax.random.PRNGKey(1))
        # lattice-sum of a cutoff gaussian varies ~0.5% with sub-voxel position
        np.testing.assert_allclose(base.sum(), rot.sum(), rtol=1e-2)

    def test_check_args_raise(self, cloud):
        coords, features, types, center = cloud
        vox = make_voxelizer()
        with pytest.raises(AssertionError):
            vox.forward_features(coords, center, features, np.ones(3, np.float32))  # scalar mode wants scalar
        vox_cw = make_voxelizer(radii_type="channel-wise")
        with pytest.raises(AssertionError):
            vox_cw.forward_features(coords, center, features, 1.0)
        with pytest.raises(AssertionError):
            vox_cw.forward_single(coords, center, 1.0)  # channel-wise unsupported for single
        with pytest.raises(AssertionError):
            vox.forward_features(coords, center, features, 1.0, out_grid=np.empty((2, 3, 3, 3), np.float32))


class TestGridUtils:
    def test_get_empty_grid_shapes(self):
        vox = make_voxelizer()
        assert vox.get_empty_grid(4).shape == (4, DIM, DIM, DIM)
        assert vox.get_empty_grid(4, batch_size=3).shape == (3, 4, DIM, DIM, DIM)
        assert np.all(vox.get_empty_grid(2, init_zero=True) == 0)

    def test_asarray_dtypes(self):
        vox = make_voxelizer()
        assert vox.asarray([[1.0, 2.0, 3.0]], "coords").dtype == np.float32
        assert vox.asarray([1.0], "radii").dtype == np.float32
        assert vox.asarray([1, 2], "types").dtype == np.int32
        with pytest.raises(ValueError):
            vox.asarray([1], "bogus")


class TestForwardBatch:
    def test_features_batch_matches_single(self, rng):
        vox = make_voxelizer()
        clouds = []
        for v in [7, 25, 13]:
            clouds.append(
                (rng.uniform(-3, 3, (v, 3)).astype(np.float32), rng.uniform(size=(v, 4)).astype(np.float32))
            )
        out = vox.forward_batch(clouds, radii=1.0)
        assert out.shape == (3, 4, DIM, DIM, DIM)
        for i, (crd, feat) in enumerate(clouds):
            single = vox.forward_features(crd, None, feat, 1.0)
            np.testing.assert_allclose(out[i], single, atol=1e-5)

    def test_types_batch(self, rng):
        vox = make_voxelizer()
        clouds = [
            (rng.uniform(-3, 3, (9, 3)).astype(np.float32), rng.integers(0, 3, size=(9,)))
            for _ in range(2)
        ]
        out = vox.forward_batch(clouds, radii=1.0)
        assert out.shape == (2, 3, DIM, DIM, DIM)

    def test_batch_with_centers_and_augmentation(self, rng):
        import jax

        vox = make_voxelizer()
        clouds = [
            (rng.uniform(5, 8, (10, 3)).astype(np.float32), rng.uniform(size=(10, 2)).astype(np.float32))
        ]
        centers = [clouds[0][0].mean(0)]
        key = jax.random.PRNGKey(1)
        a = vox.forward_batch(clouds, radii=1.0, centers=centers, random_rotation=True, key=key)
        b = vox.forward_batch(clouds, radii=1.0, centers=centers, random_rotation=True, key=key)
        np.testing.assert_array_equal(a, b)
        assert a.max() > 0

    def test_batch_atomwise_radii(self, rng):
        vox = make_voxelizer(radii_type="atom-wise")
        clouds = [
            (rng.uniform(-3, 3, (v, 3)).astype(np.float32), rng.uniform(size=(v, 2)).astype(np.float32))
            for v in [5, 11]
        ]
        radii = [rng.uniform(0.8, 1.5, size=(5,)).astype(np.float32),
                 rng.uniform(0.8, 1.5, size=(11,)).astype(np.float32)]
        out = vox.forward_batch(clouds, radii=radii)
        for i, ((crd, feat), r) in enumerate(zip(clouds, radii)):
            single = vox.forward_features(crd, None, feat, r)
            np.testing.assert_allclose(out[i], single, atol=1e-5)


class TestMigrationCompat:
    """Reference-shaped snippets must run verbatim (molvoxel -> molvoxel_tpu)."""

    def test_voxelizer_subpackage_facade(self):
        # mirrors /root/reference/molvoxel/voxelizer/__init__.py:2-37 imports
        from molvoxel_tpu.voxelizer import (
            RandomTransform,
            Voxelizer,
            create_random_transform,
            create_voxelizer,
        )

        vox = create_voxelizer(resolution=RES, dimension=DIM)
        assert isinstance(vox, Voxelizer)
        tr = create_random_transform(random_translation=0.5, random_rotation=True)
        assert isinstance(tr, RandomTransform)

    def test_torch_backend_device_shims(self, cloud):
        # reference torch snippet shape: voxelizer.cuda() / .to(device) / .cpu()
        # (/root/reference/molvoxel/voxelizer/torch/voxelizer.py:73-88)
        coords, features, _, center = cloud
        vox = make_voxelizer(device="cpu")
        assert vox.cuda() is vox
        assert vox.device == "cuda"
        assert vox.to("cpu") is vox and vox.device == "cpu"
        assert vox.cpu() is vox
        out = vox.forward(coords, center, features, radii=1.0)
        ref = make_voxelizer().forward(coords, center, features, radii=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_reference_torch_snippet_verbatim(self, cloud):
        # a verbatim reference-style workflow, only the package name swapped
        import molvoxel_tpu as molvoxel

        coords, features, _, center = cloud
        voxelizer = molvoxel.create_voxelizer(
            resolution=RES, dimension=DIM, density_type="gaussian", library="torch"
        )
        voxelizer = voxelizer.cuda()
        image = voxelizer.forward_features(
            voxelizer.asarray(coords, "coords"), center, features, radii=1.0
        )
        assert image.shape == (features.shape[1], DIM, DIM, DIM)
        assert float(np.asarray(image).max()) > 0

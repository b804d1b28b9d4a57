"""Unit tests for the pallas launch helpers (pure-XLA pieces)."""

import jax.numpy as jnp
import numpy as np

from molvoxel_tpu.core import GridSpec
from molvoxel_tpu.ops.pallas_deposit import (
    _chunk_rows,
    _hw_tile,
    _plane_ranges_axes,
    _plane_ranges_closed,
    _row_tile,
    _sort_atoms_spatially,
    morton_keys,
)


def test_row_tile_standard_dims():
    for dim in [16, 32, 48, 64, 96, 128, 192, 256, 512]:
        hwt = _row_tile(dim * dim, dim)
        assert hwt is not None
        assert hwt % dim == 0 and hwt % 128 == 0
        assert (dim * dim) % hwt == 0
        # Mosaic legality: the dy2 block's sublane dim (whole h-rows) must be
        # a multiple of 8 or the full H axis (regression: dim=256 picked a
        # 4-row block and crashed the real-TPU compile)
        rows = hwt // dim
        assert rows % 8 == 0 or rows == dim
    assert _row_tile(12 * 12, 12) is None  # 144 not 128-aligned -> fallback path


def test_hw_tile_divisors():
    assert _hw_tile(4096, 1024) == 1024
    assert _hw_tile(2304, 1024) == 768
    assert _hw_tile(256, 1024) == 256


def test_chunk_rows_layout(rng):
    b, dl, vp, a = 2, 4, 256, 128
    x = jnp.asarray(rng.normal(size=(b, dl, vp)).astype(np.float32))
    rows = np.asarray(_chunk_rows(x, a))
    assert rows.shape == (b * 2, 1, dl * a)
    # row b*nvc+vc at [d*a + j] == x[b, d, vc*a + j]
    xh = np.asarray(x)
    assert rows[1, 0, 2 * a + 5] == xh[0, 2, a + 5]
    assert rows[2, 0, 0] == xh[1, 0, 0]


def test_plane_ranges_cover_activity(rng):
    spec = GridSpec(0.5, 16)
    b, vp = 1, 128
    coords = np.zeros((b, vp, 3), np.float32)
    coords[0, :10] = rng.uniform(-2, 2, (10, 3))
    r2 = np.ones((b, vp), np.float32)
    ax = spec.axis()
    dx2 = (ax[None, :, None] - coords[:, None, :, 0]) ** 2  # (B, D, Vp)
    dy2t = (ax[None, :, None] - coords[:, None, :, 1]) ** 2  # (B, H, Vp)
    dz2t = (ax[None, :, None] - coords[:, None, :, 2]) ** 2
    thresh = r2[:, None, :] - dx2
    hwt, a = 256, 128
    ranges = np.asarray(
        _plane_ranges_axes(jnp.asarray(dy2t), jnp.asarray(dz2t), jnp.asarray(thresh), hwt, a)
    )
    assert ranges.shape == (1 * 1 * 1, 1, 2)
    lo, hi = ranges[0, 0]
    # planes with any atom within reach must be inside [lo, hi)
    for d in range(16):
        active = False
        for v in range(10):
            dyz_min = dy2t[0, :, v].min() + dz2t[0, :, v].min()
            if dyz_min <= thresh[0, d, v]:
                active = True
        if active:
            assert lo <= d < hi


def test_plane_ranges_closed_cover_activity(rng):
    """Closed-form ranges must cover every (tile, chunk, plane) where any
    voxel of the tile passes the kernel's exact cutoff compare."""
    spec = GridSpec(0.5, 16)
    b, vp, dl = 2, 256, 16
    coords = np.full((b, vp, 3), 1e3, np.float32)
    coords[:, :40] = rng.uniform(-3.9, 3.9, (b, 40, 3)).astype(np.float32)
    r2 = np.ones((b, vp), np.float32) * rng.uniform(0.5, 2.0)
    nhwt, hrows, a = 2, 8, 128
    ranges = np.asarray(
        _plane_ranges_closed(jnp.asarray(coords), jnp.asarray(r2), spec, dl, nhwt, hrows, a)
    ).reshape(b, nhwt, vp // a, 2)
    ax = spec.axis()
    for bi in range(b):
        for ht in range(nhwt):
            ay = ax[ht * hrows : (ht + 1) * hrows]
            for vc in range(vp // a):
                lo, hi = ranges[bi, ht, vc]
                assert 0 <= lo <= hi <= dl
                for v in range(vc * a, (vc + 1) * a):
                    x, y, z = coords[bi, v]
                    dyz2_min = ((ay - y) ** 2).min() + ((ax - z) ** 2).min()
                    for d in range(dl):
                        if dyz2_min + (ax[d] - x) ** 2 <= r2[bi, v]:
                            assert lo <= d < hi, (bi, ht, vc, v, d, lo, hi)


def test_morton_keys_locality():
    spec = GridSpec(0.5, 32)
    # two atoms in the same cell share a key; distant atoms differ
    coords = jnp.asarray([[[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [7.0, -7.0, 7.0]]], jnp.float32)
    keys = np.asarray(morton_keys(coords, spec))
    assert keys[0, 0] == keys[0, 1] != keys[0, 2]
    # masked atoms key to the end
    mask = jnp.asarray([[True, False, True]])
    keys_m = np.asarray(morton_keys(coords, spec, mask))
    assert keys_m[0, 1] > keys_m[0, 0] and keys_m[0, 1] > keys_m[0, 2]


def test_sort_atoms_preserves_set_and_masks(rng):
    spec = GridSpec(0.5, 16)
    b, vp, c = 2, 256, 3
    coords = jnp.asarray(rng.uniform(-4, 4, (b, vp, 3)).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(b, vp, c)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.5, 1.5, (b, vp)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(b, vp)) < 0.7)

    sc, sw, sr, sm = _sort_atoms_spatially(coords, weights, radii, mask, spec, 0)
    # same multiset of (coord, weight, radius, mask) rows
    for bi in range(b):
        orig = np.concatenate(
            [np.asarray(coords)[bi], np.asarray(weights)[bi], np.asarray(radii)[bi][:, None],
             np.asarray(mask)[bi][:, None]], axis=1)
        new = np.concatenate(
            [np.asarray(sc)[bi], np.asarray(sw)[bi], np.asarray(sr)[bi][:, None],
             np.asarray(sm)[bi][:, None]], axis=1)
        orig_sorted = orig[np.lexsort(orig.T)]
        new_sorted = new[np.lexsort(new.T)]
        np.testing.assert_allclose(orig_sorted, new_sorted)
    # masked (padded) atoms are pushed to the end
    sm_host = np.asarray(sm)
    for bi in range(b):
        idx = np.where(~sm_host[bi])[0]
        if idx.size:
            assert sm_host[bi, idx.min():].sum() == 0 or True  # padded tail grouped
        first_false = np.argmin(sm_host[bi]) if (~sm_host[bi]).any() else vp
        assert not sm_host[bi, first_false:].any()

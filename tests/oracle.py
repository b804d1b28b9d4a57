"""Independent brute-force numpy oracle for voxelization semantics.

Deliberately naive (O(V * D^3) dense, float64) and written directly from the
math definition in the reference README (density formulas, README.md:107-143):
    out[c, ijk] = sum_v w[v, c] * f(|x_v - g_ijk| / r)
    gaussian: exp(-0.5 (d/(r sigma))^2) for d <= r else 0
    binary:   1 for d <= r else 0
Voxel centers: i * resolution - width/2, width = resolution * (dimension - 1).
"""

import numpy as np


def grid_points(resolution: float, dimension: int) -> np.ndarray:
    ax = np.arange(dimension, dtype=np.float64) * resolution - resolution * (dimension - 1) / 2.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def voxelize_oracle(
    coords: np.ndarray,
    weights: np.ndarray,
    radii,
    resolution: float,
    dimension: int,
    density: str = "gaussian",
    sigma: float = 0.5,
    channelwise_radii: bool = False,
) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    v, c = weights.shape
    pts = grid_points(resolution, dimension)  # (N, 3)
    d = np.sqrt(((coords[:, None, :] - pts[None, :, :]) ** 2).sum(-1))  # (V, N)

    def apply_density(dr):
        if density == "gaussian":
            val = np.exp(-0.5 * (dr / sigma) ** 2)
            val[dr > 1.0] = 0.0
            return val
        elif density == "binary":
            return (dr <= 1.0).astype(np.float64)
        raise ValueError(density)

    if channelwise_radii:
        radii = np.asarray(radii, dtype=np.float64)  # (C,)
        out = np.empty((c, pts.shape[0]))
        for ci in range(c):
            f = apply_density(d / radii[ci])
            out[ci] = weights[:, ci] @ f
    else:
        r = np.broadcast_to(np.asarray(radii, dtype=np.float64), (v,))
        f = apply_density(d / r[:, None])
        out = weights.T @ f
    return out.reshape(c, dimension, dimension, dimension)

"""Conservative body-occupancy grid: O(1) per-point candidate test.

The human-region mask needs ``min_v |q - v|^2 < (5 cm)^2`` against 6890
SMPL vertices — the render path's hottest op when evaluated exactly for
every sample.  This grid makes stage 1 a single gather: a voxel is marked
iff SOME point inside it could be within 5 cm of SOME vertex
(``|center - v| <= 0.05 + half_diagonal``), so

    grid[q] == 0  =>  q is certainly farther than 5 cm   (exact cull)
    grid[q] == 1  =>  candidate; the exact 1-NN runs on the compacted
                      candidate set only (~6% of samples at eval).

Build cost is ~10 ms on host per pose, amortized over a whole image
(or an entire eval sweep).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

HUMAN_DIST_THRESHOLD = 0.05  # 5 cm (ref skinnning_batch.py:360)


class BodyGrid(NamedTuple):
    grid: np.ndarray     # (D, H, W) uint8 candidate flags (z, y, x order)
    origin: np.ndarray   # (3,) xyz of voxel (0,0,0) corner
    voxel: np.ndarray    # () voxel edge length


def build_body_grid(
    verts: np.ndarray,
    voxel: float = 0.02,
    threshold: float = HUMAN_DIST_THRESHOLD,
    pad_to: int = 128,
) -> BodyGrid:
    """verts: (V, 3) in the frame the query points will use (SMPL frame).

    The grid shape is padded to ``pad_to`` per dim (2.56 m at the default
    voxel) so every pose of every subject shares ONE static shape — a
    fresh shape per pose would recompile the whole jitted render graph on
    each item of an eval sweep.  Oversized bodies fall back to 32-rounded
    dims (rare; costs a recompile).
    """
    verts = np.asarray(verts, np.float32)
    half_diag = 0.5 * np.sqrt(3.0) * voxel
    reach = threshold + half_diag

    lo = verts.min(0) - reach - voxel
    hi = verts.max(0) + reach + voxel
    shape = np.ceil((hi - lo) / voxel).astype(int) + 1
    if (shape <= pad_to).all():
        shape = np.full(3, pad_to, int)
    else:
        shape = (shape + 31) // 32 * 32

    # ball stencil of voxel offsets within `reach` of a vertex
    r = int(np.ceil(reach / voxel))
    ax = np.arange(-r, r + 1)
    oz, oy, ox = np.meshgrid(ax, ax, ax, indexing="ij")
    offs = np.stack([oz, oy, ox], -1).reshape(-1, 3)

    # mark cells whose center is within reach of the vertex; the stencil is
    # applied around each vertex's cell, with per-cell center distance
    # computed against the vertex for tightness
    cell = np.floor((verts - lo) / voxel).astype(int)  # xyz order
    centers_rel = (cell + 0.5) * voxel + lo - verts    # (V, 3) residuals

    grid = np.zeros(tuple(shape[[2, 1, 0]]), np.uint8)  # (z, y, x)
    off_xyz = offs[:, [2, 1, 0]]  # stencil in xyz order
    for chunk in range(0, len(offs), 256):
        o = off_xyz[chunk : chunk + 256]  # (K, 3)
        # distance from vertex to the offset cell's center
        d = centers_rel[:, None, :] + o[None, :, :] * voxel  # (V, K, 3)
        ok = (d * d).sum(-1) <= reach * reach
        vi, ki = np.nonzero(ok)
        cz = cell[vi, 2] + o[ki, 2]
        cy = cell[vi, 1] + o[ki, 1]
        cx = cell[vi, 0] + o[ki, 0]
        grid[cz, cy, cx] = 1
    return BodyGrid(grid=grid, origin=lo.astype(np.float32),
                    voxel=np.float32(voxel))


def grid_lookup(grid_tuple, pts):
    """Device-side candidate test: (N, 3) xyz -> (N,) bool.

    Formulation: one flat ``jnp.take`` with a linearized index on an
    int32 copy of the grid — measured 1.6x faster than 3D advanced
    indexing on the uint8 grid (102 vs 162 ms per 12.2M points on v5e;
    the int32 cast is loop-invariant and hoisted under jit).
    """
    import jax.numpy as jnp

    grid, origin, voxel = (
        jnp.asarray(grid_tuple.grid),
        jnp.asarray(grid_tuple.origin),
        jnp.asarray(grid_tuple.voxel),
    )
    idx = jnp.floor((pts - origin) / voxel).astype(jnp.int32)
    d, h, w = grid.shape
    inside = (
        (idx[:, 0] >= 0) & (idx[:, 0] < w)
        & (idx[:, 1] >= 0) & (idx[:, 1] < h)
        & (idx[:, 2] >= 0) & (idx[:, 2] < d)
    )
    xi = jnp.clip(idx[:, 0], 0, w - 1)
    yi = jnp.clip(idx[:, 1], 0, h - 1)
    zi = jnp.clip(idx[:, 2], 0, d - 1)
    flat = grid.astype(jnp.int32).reshape(-1)
    lin = (zi * h + yi) * w + xi
    return (jnp.take(flat, lin) > 0) & inside

"""Density-grid mesh extraction (``extract_thuman_mesh.py`` equivalent).

Pipeline (ref extract_thuman_mesh.py:74-213):
  1. dense query grid over the subject (target-pose world box, or the
     canonical big-pose box for ``canonical=True`` which skips the warps)
  2. chunked density queries on device -> occupancy = shifted_softplus(sigma)
  3. SMPL-distance carving: occupancy beyond 5 cm of the body is zeroed,
     and interior points (behind the surface by the K=5 mean-normal
     sidedness test) are filled solid (=100) so marching produces a closed
     surface
  4. iso-surface at threshold 30 (native C++), grid -> world transform,
     triangle flip, OBJ export
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpsnerf_tpu.native import extract_isosurface, export_obj
from mpsnerf_tpu.ops.knn import nearest_vertex, knn_points
from mpsnerf_tpu.ops.composite import shifted_softplus
from mpsnerf_tpu.smpl.mesh import vertex_normals

DIST_THRESHOLD_SQ = 0.05 ** 2   # ref :135
INTERIOR_FILL = 100.0           # ref :160
DEFAULT_THRESHOLD = 30.0        # ref :70


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Axis-aligned query grid: ``start + (i / n) * size`` per dim."""

    start: np.ndarray  # (3,)
    size: np.ndarray   # (3,)
    n: Tuple[int, int, int]

    @staticmethod
    def from_vertices(verts: np.ndarray, n: int = 256, pad: float = 0.1):
        lo = verts.min(0) - pad
        hi = verts.max(0) + pad
        return GridSpec(start=lo, size=hi - lo, n=(n, n, n))

    @staticmethod
    def reference_target() -> "GridSpec":
        """The hard-coded THuman target-pose box (ref :107-112)."""
        return GridSpec(
            start=np.array([0.6, 0.0, 0.0]),
            size=np.array([2.0, 2.0, 2.0]),
            n=(256, 256, 256),
        )

    @staticmethod
    def reference_canonical(n: int = 256) -> "GridSpec":
        """The canonical big-pose box (ref :97-102)."""
        return GridSpec(
            start=np.array([-1.0, -1.0, -0.25]),
            size=np.array([2.0, 2.0, 0.5]),
            n=(n, n, n // 4),
        )

    def points(self) -> np.ndarray:
        axes = [
            np.linspace(self.start[d], self.start[d] + self.size[d], self.n[d])
            for d in range(3)
        ]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
        return g.reshape(-1, 3).astype(np.float32)

    def to_world(self, grid_verts: np.ndarray) -> np.ndarray:
        scale = self.size / np.asarray(self.n)
        return self.start + grid_verts * scale


def extract_density_mesh(
    density_fn: Callable[[np.ndarray], np.ndarray],
    grid: GridSpec,
    t_vertices: np.ndarray,
    faces: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    carve: bool = True,
    chunk: int = 1_000_000,
    obj_path: Optional[str] = None,
):
    """Extract the density iso-surface.

    Args:
      density_fn: (N, 3) world/canonical points -> (N,) raw sigma.
      grid: the query grid (world frame, or canonical frame for the
        canonical variant — the caller picks the matching density_fn mode).
      t_vertices: SMPL vertices in the SAME frame as the grid (posed for
        target extraction, canonical template for canonical extraction).
      faces: SMPL faces for the normal sidedness test.

    Returns ``(verts_world (V, 3), tris (T, 3))``.
    """
    pts = grid.points()
    occ = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), chunk):
        sigma = density_fn(pts[i : i + chunk])
        occ[i : i + chunk] = np.asarray(
            shifted_softplus(jnp.asarray(sigma))
        )

    if carve:
        jt = jnp.asarray(t_vertices, jnp.float32)
        jp = jnp.asarray(pts)
        d2, _ = nearest_vertex(jp, jt)
        near_mask = np.asarray(d2 < DIST_THRESHOLD_SQ)

        # interior fill via K=5 mean position + mean normal sidedness
        normals = vertex_normals(jt, jnp.asarray(faces, jnp.int32))
        _, ids5 = knn_points(jp, jt, k=5)
        mean_pos = jnp.mean(jt[ids5], axis=1)
        mean_nrm = jnp.mean(normals[ids5], axis=1)
        pts_dir = jp - mean_pos
        pts_dir = pts_dir / (
            jnp.linalg.norm(pts_dir, axis=-1, keepdims=True) + 1e-12
        )
        outside = np.asarray(jnp.sum(pts_dir * mean_nrm, axis=-1) > 0)

        occ[~near_mask] = 0.0
        occ[(~near_mask) & (~outside)] = INTERIOR_FILL

    occ = occ.reshape(grid.n)
    grid_verts, tris = extract_isosurface(occ, float(threshold))
    verts = grid.to_world(grid_verts)
    tris = tris[:, ::-1].copy()  # flip orientation (ref :188)

    if obj_path is not None:
        export_obj(obj_path, verts, tris)
    return verts, tris

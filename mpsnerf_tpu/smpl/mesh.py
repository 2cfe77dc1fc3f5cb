"""Mesh utilities: vertex normals (for the smooth/normal losses).

Behavioral reference: ``/root/reference/lib/skinnning_batch.py:17-40``
(``compute_normal``): per-face cross products, normalized, scatter-added to
the three corner vertices, renormalized.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) vertices + (F, 3) faces -> (V, 3) unit vertex normals."""
    tris = vertices[faces]  # (F, 3, 3)
    fn = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    fn = _normalize(fn)
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return _normalize(vn)

"""Normal-map mesh rendering (``render_thuman_mesh.py`` equivalent).

The reference shades vertex normals as colors through pyrender's EGL
offscreen renderer (render_thuman_mesh.py:80-146); here the native z-buffer
rasterizer projects the mesh with the pinhole intrinsics directly and
interpolates per-vertex normal colors — same output semantics: RGB =
0.5*normal + 0.5, white background, alpha = coverage mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from mpsnerf_tpu.native import rasterize_mesh


def _vertex_normals_np(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Host-side vertex normals (visualization path — keeping this in
    numpy avoids per-op dispatch to a tunneled accelerator)."""
    tris = vertices[faces]
    fn = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-8)
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-8)
    return vn


def render_normal_map(
    verts: np.ndarray,
    tris: np.ndarray,
    K: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    height: int = 512,
    width: int = 512,
    crop: Optional[Tuple[int, int, int, int]] = (0, 130, 512, 256),
    save_path: Optional[str] = None,
) -> np.ndarray:
    """Returns an RGBA uint8 image (cropped like the reference: y,x,h,w =
    0,130,512,256 — ref render_thuman_mesh.py:143-146)."""
    cam = verts @ R.T + T.reshape(1, 3)

    # normals computed on the camera-frame mesh (the reference computes
    # them after the world->camera transform, :113)
    normals = _vertex_normals_np(cam.astype(np.float32), tris)
    colors = 0.5 * normals + 0.5  # (V, 3) in [0, 1]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = cam[:, 2]
    sx = fx * cam[:, 0] / np.maximum(z, 1e-6) + cx
    sy = fy * cam[:, 1] / np.maximum(z, 1e-6) + cy
    screen = np.stack([sx, sy, z], axis=1).astype(np.float32)

    p2f, bary, _ = rasterize_mesh(screen, tris, height, width)
    hit = p2f >= 0

    img = np.ones((height, width, 3), np.float32)  # white background
    if hit.any():
        face_ids = p2f[hit]
        tri_cols = colors[tris[face_ids]]  # (M, 3, 3)
        img[hit] = np.einsum("mk,mkc->mc", bary[hit], tri_cols)

    rgba = np.concatenate(
        [
            (img * 255).astype(np.uint8),
            (hit[..., None] * 255).astype(np.uint8),
        ],
        axis=2,
    )
    if crop is not None:
        y, x, h, w = crop
        rgba = rgba[y : y + h, x : x + w]
    if save_path is not None:
        import cv2

        cv2.imwrite(save_path, rgba[..., [2, 1, 0, 3]])
    return rgba

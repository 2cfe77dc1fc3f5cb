"""Shared on-disk THuman fixture builder.

Fabricates the reference directory layout (annots.npy / mask_cihp /
new_vertices / new_params / X_vertices.npy — THuman_dataset.py:21-80)
with synthetic cameras and geometry, at arbitrary pose counts, so loader
and protocol tests exercise the real file plumbing.
"""

import os

import cv2
import numpy as np


def make_camera(i, n_views, hw):
    a = 2 * np.pi * i / n_views
    pos = np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.0])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world -> cam rows
    T = -R @ pos
    K = np.array([[80.0, 0, hw / 2], [0, 80.0, hw / 2], [0, 0, 1.0]])
    return K, R, T.reshape(3, 1)


def build_thuman_subject(root, n_poses, n_views=24, hw=64, n_verts=300,
                         seed=0):
    """Write one subject directory; returns its path as str."""
    root = str(root)
    rng = np.random.default_rng(seed)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(n_views):
        K, R, T = make_camera(v, n_views, hw)
        cams["K"].append(K)
        cams["D"].append(np.zeros(5))
        cams["R"].append(R)
        cams["T"].append(T)

    lo, hi = int(hw * 0.375), int(hw * 0.625)
    ims = []
    for p in range(n_poses):
        paths = []
        for v in range(n_views):
            rel = os.path.join(f"{v:02d}", f"{p}.jpg")
            paths.append(rel)
            img = np.zeros((hw, hw, 3), np.uint8)
            img[lo:hi, lo:hi] = rng.integers(64, 255, (hi - lo, hi - lo, 3))
            msk = np.zeros((hw, hw), np.uint8)
            msk[lo:hi, lo:hi] = 255
            ipath = os.path.join(root, rel)
            mpath = os.path.join(root, "mask_cihp", rel.replace("jpg", "png"))
            os.makedirs(os.path.dirname(ipath), exist_ok=True)
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            cv2.imwrite(ipath, img)
            cv2.imwrite(mpath, msk)
        ims.append({"ims": paths})

    np.save(os.path.join(root, "annots.npy"), {"cams": cams, "ims": ims})

    os.makedirs(os.path.join(root, "new_vertices"), exist_ok=True)
    os.makedirs(os.path.join(root, "new_params"), exist_ok=True)
    verts = (0.2 * rng.standard_normal((n_verts, 3))).astype(np.float32)
    for p in range(n_poses):
        np.save(os.path.join(root, "new_vertices", f"{p}.npy"), verts)
        np.save(
            os.path.join(root, "new_params", f"{p}.npy"),
            {
                "poses": np.zeros(72, np.float32),
                "shapes": np.zeros(10, np.float32),
                "R": np.eye(3, dtype=np.float32),
                "Th": np.zeros((1, 3), np.float32),
            },
        )
    np.save(os.path.join(root, "X_vertices.npy"), verts)
    return root

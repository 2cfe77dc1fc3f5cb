"""Ray generation and importance sampling (host-side data pipeline).

Behavioral reference: ``/root/reference/lib/if_nerf_data_utils.py``:
``get_rays`` (:11), ``get_near_far`` (:57) — AABB intersection via the six
box planes with the exactly-two-hits mask, ``get_bound_2d_mask`` (:43), and
the train-time body/background importance sampler
``sample_ray_THuman_batch`` (:632).

These run on host CPU inside the input pipeline (like the reference's
DataLoader workers); the device never sees ragged shapes.  The train sampler
keeps the reference's resample-until-N semantics but always returns exactly
``n_rays`` rows, so downstream pytrees are fixed-shape.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import cv2
import numpy as np


def get_rays(H: int, W: int, K: np.ndarray, R: np.ndarray, T: np.ndarray):
    """Pinhole rays in world space from an extrinsic (R, T) + intrinsic K.

    Returns ``(rays_o (H,W,3), rays_d (H,W,3))`` — rays_d NOT normalized
    (matching the reference; z-step compositing accounts for the norm).
    """
    rays_o = -(R.T @ T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = xy1 @ np.linalg.inv(K).T
    pixel_world = (pixel_camera - T.ravel()) @ R
    rays_d = pixel_world - rays_o[None, None]
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def get_near_far(bounds: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray):
    """Near/far via intersection with the (slightly padded) AABB.

    bounds: (2, 3).  Returns ``(near (M,), far (M,), mask_at_box (N,))``
    where M = mask.sum() — a ray counts as inside only if it hits exactly
    two of the six box planes within the box extents.

    PROVENANCE NOTE: the arithmetic here must reproduce the reference's
    6-plane / exactly-two-hits test bit-for-bit
    (``if_nerf_data_utils.py:57-93``) — the resulting masks and depths feed
    the eval protocols directly, so every operation (0.01 box pad, the
    1e-8 zero-direction fill, the 1e-6 containment eps, the hit-distance
    renormalization by ``|d|``) is kept operation-for-operation identical.
    The structure and naming are original.
    """
    box = bounds + np.array([-0.01, 0.01])[:, None]
    d = ray_d.copy()
    d[d == 0.0] = 1e-8  # avoid 0/0 on axis-parallel rays

    # parametric hit with each of the six axis planes -> world points
    t_planes = ((box[None] - ray_o[:, None]) / d[:, None]).reshape(-1, 6)
    hit_pts = t_planes[..., None] * d[:, None] + ray_o[:, None]  # (N, 6, 3)

    eps = 1e-6
    lo, hi = box[0] - eps, box[1] + eps
    on_face = np.ones(hit_pts.shape[:2], dtype=bool)
    for ax in range(3):
        on_face &= (hit_pts[..., ax] >= lo[ax]) & (hit_pts[..., ax] <= hi[ax])

    mask_at_box = on_face.sum(-1) == 2
    # the two face hits of each inside ray, as an (M, 2, 3) interval
    entry_exit = hit_pts[mask_at_box][on_face[mask_at_box]].reshape(-1, 2, 3)

    o_in = ray_o[mask_at_box]
    d_len = np.linalg.norm(d[mask_at_box], axis=1)
    t0 = np.linalg.norm(entry_exit[:, 0] - o_in, axis=1) / d_len
    t1 = np.linalg.norm(entry_exit[:, 1] - o_in, axis=1) / d_len
    return np.minimum(t0, t1), np.maximum(t0, t1), mask_at_box


def _bound_corners(bounds: np.ndarray) -> np.ndarray:
    min_x, min_y, min_z = bounds[0]
    max_x, max_y, max_z = bounds[1]
    return np.array(
        [
            [min_x, min_y, min_z], [min_x, min_y, max_z],
            [min_x, max_y, min_z], [min_x, max_y, max_z],
            [max_x, min_y, min_z], [max_x, min_y, max_z],
            [max_x, max_y, min_z], [max_x, max_y, max_z],
        ]
    )


def project_points(xyz: np.ndarray, K: np.ndarray, R: np.ndarray, T: np.ndarray):
    """World points -> pixel coords (ref lib/base_utils.py:33-38)."""
    cam = xyz @ R.T + T.reshape(1, 3)
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:]


def get_bound_2d_mask(bounds, K, pose, H, W) -> np.ndarray:
    """Rasterize the projected 3D bounding box faces into a 2D mask."""
    corners_3d = _bound_corners(bounds)
    R, T = pose[:, :3], pose[:, 3:]
    corners_2d = project_points(corners_3d, K, R, T)
    corners_2d = np.round(corners_2d).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    for face in ([0, 1, 3, 2, 0], [4, 5, 7, 6, 5], [0, 1, 5, 4, 0],
                 [2, 3, 7, 6, 2], [0, 2, 6, 4, 0], [1, 3, 7, 5, 1]):
        cv2.fillPoly(mask, [corners_2d[face]], 1)
    return mask


class RayBatch(NamedTuple):
    """Fixed-shape per-view ray bundle (the device-facing schema)."""

    rgb: np.ndarray          # (N, 3)
    ray_o: np.ndarray        # (N, 3)
    ray_d: np.ndarray        # (N, 3)
    near: np.ndarray         # (N,)
    far: np.ndarray          # (N,)
    coord: np.ndarray        # (N, 2) pixel coords (train) / zeros (test)
    mask_at_box: np.ndarray  # (N,) bool (train: all True)
    bkgd_msk: np.ndarray     # (N, 1) 1=body pixel, 0=background


def sample_rays_batch(
    img: np.ndarray,
    msk: np.ndarray,
    K: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    bounds: np.ndarray,
    n_rays: int,
    split: str,
    body_ratio: float = 0.8,
    rng: Optional[np.random.Generator] = None,
) -> RayBatch:
    """Train: body/background importance sampling inside the projected box
    with resample-until-N (always returns exactly ``n_rays``).  Test: every
    pixel, with near/far scattered into full-image arrays.

    Equivalent to ``sample_ray_THuman_batch`` (if_nerf_data_utils.py:632-735).
    Like the reference, each round draws exactly the remaining budget and
    keeps only box-hit rays, so the accumulated total lands on exactly
    ``n_rays`` — the final ``[:n_rays]`` is a shape safeguard that never
    drops a ray (pinned by tests/test_rays.py), so there is no
    body-vs-background truncation bias.
    """
    if rng is None:
        rng = np.random.default_rng()
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    msk = msk * bound_mask
    bound_mask = bound_mask.copy()
    bound_mask[msk == 100] = 0
    img = img.copy()
    img[bound_mask != 1] = 0

    if split == "train":
        lists = {k: [] for k in RayBatch._fields}
        n_sampled = 0
        coord_body = np.argwhere(msk == 1)
        coord_bg = np.argwhere((bound_mask == 1) & (msk != 1))
        # degenerate masks: fall back to any in-box pixel
        if len(coord_body) == 0:
            coord_body = np.argwhere(bound_mask == 1)
        if len(coord_bg) == 0:
            coord_bg = coord_body

        while n_sampled < n_rays:
            n_body = int((n_rays - n_sampled) * body_ratio)
            n_rand = (n_rays - n_sampled) - n_body

            cb = coord_body[rng.integers(0, len(coord_body), n_body)]
            cg = coord_bg[rng.integers(0, len(coord_bg), n_rand)]
            coord = np.concatenate([cb, cg], axis=0)
            bkgd = np.concatenate(
                [np.ones((n_body, 1)), np.zeros((n_rand, 1))], axis=0
            )

            o = ray_o[coord[:, 0], coord[:, 1]]
            d = ray_d[coord[:, 0], coord[:, 1]]
            rgb = img[coord[:, 0], coord[:, 1]]
            near, far, hit = get_near_far(bounds, o, d)

            lists["ray_o"].append(o[hit])
            lists["ray_d"].append(d[hit])
            lists["rgb"].append(rgb[hit])
            lists["near"].append(near)
            lists["far"].append(far)
            lists["coord"].append(coord[hit])
            lists["bkgd_msk"].append(bkgd[hit])
            lists["mask_at_box"].append(hit[hit])
            n_sampled += len(near)

        out = {k: np.concatenate(v)[:n_rays] for k, v in lists.items()}
        return RayBatch(
            rgb=out["rgb"].astype(np.float32),
            ray_o=out["ray_o"].astype(np.float32),
            ray_d=out["ray_d"].astype(np.float32),
            near=out["near"].astype(np.float32),
            far=out["far"].astype(np.float32),
            coord=out["coord"].astype(np.int64),
            mask_at_box=out["mask_at_box"],
            bkgd_msk=out["bkgd_msk"].astype(np.float32),
        )

    return _full_image_rays(img, msk, ray_o, ray_d, bounds)


def sample_rays_h36m_batch(
    img: np.ndarray,
    msk: np.ndarray,
    K: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    bounds: np.ndarray,
    n_rays: int,
    split: str,
    body_ratio: float = 0.6,
    rng: Optional[np.random.Generator] = None,
) -> RayBatch:
    """H36M variant (ref if_nerf_data_utils.py:393-513): masks carry the
    erode/dilate levels 100 (inner border) and 200 (outer border); both are
    excluded from the projected box, and the non-body budget splits 50/50
    between in-box background and outer-border (msk==200) rays."""
    if rng is None:
        rng = np.random.default_rng()
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    msk = msk * bound_mask
    bound_mask = bound_mask.copy()
    bound_mask[msk == 100] = 0
    bound_mask[msk == 200] = 0
    img = img.copy()
    img[bound_mask != 1] = 0

    if split != "train":
        return _full_image_rays(img, msk, ray_o, ray_d, bounds)

    lists = {k: [] for k in RayBatch._fields}
    n_sampled = 0
    coord_body = np.argwhere(msk == 1)
    coord_bg = np.argwhere((bound_mask == 1) & (msk != 1))
    coord_outer = np.argwhere((bound_mask == 0) & (msk == 200))
    if len(coord_body) == 0:
        coord_body = np.argwhere(bound_mask == 1)
    if len(coord_bg) == 0:
        coord_bg = coord_body
    if len(coord_outer) == 0:
        coord_outer = coord_bg

    while n_sampled < n_rays:
        n_body = int((n_rays - n_sampled) * body_ratio)
        n_rand = int(((n_rays - n_sampled) - n_body) * 0.5)
        n_rand_2 = (n_rays - n_sampled) - n_body - n_rand

        cb = coord_body[rng.integers(0, len(coord_body), n_body)]
        cg = coord_bg[rng.integers(0, len(coord_bg), n_rand)]
        co = coord_outer[rng.integers(0, len(coord_outer), n_rand_2)]
        coord = np.concatenate([cb, cg, co], axis=0)
        bkgd = np.concatenate(
            [np.ones((n_body, 1)), np.zeros((n_rand + n_rand_2, 1))], axis=0
        )

        o = ray_o[coord[:, 0], coord[:, 1]]
        d = ray_d[coord[:, 0], coord[:, 1]]
        rgb = img[coord[:, 0], coord[:, 1]]
        near, far, hit = get_near_far(bounds, o, d)

        lists["ray_o"].append(o[hit])
        lists["ray_d"].append(d[hit])
        lists["rgb"].append(rgb[hit])
        lists["near"].append(near)
        lists["far"].append(far)
        lists["coord"].append(coord[hit])
        lists["bkgd_msk"].append(bkgd[hit])
        lists["mask_at_box"].append(hit[hit])
        n_sampled += len(near)

    out = {k: np.concatenate(v)[:n_rays] for k, v in lists.items()}
    return RayBatch(
        rgb=out["rgb"].astype(np.float32),
        ray_o=out["ray_o"].astype(np.float32),
        ray_d=out["ray_d"].astype(np.float32),
        near=out["near"].astype(np.float32),
        far=out["far"].astype(np.float32),
        coord=out["coord"].astype(np.int64),
        mask_at_box=out["mask_at_box"],
        bkgd_msk=out["bkgd_msk"].astype(np.float32),
    )


def sample_rays_ohem(
    img: np.ndarray,
    loss_img: np.ndarray,
    msk: np.ndarray,
    K: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    bounds: np.ndarray,
    n_rays: int,
    split: str,
    rng: Optional[np.random.Generator] = None,
) -> RayBatch:
    """Online-hard-example-mining sampler (ref if_nerf_data_utils.py:914):
    80% of rays drawn from the in-box pixels proportionally to a per-pixel
    loss image, 20% uniform in-box."""
    if rng is None:
        rng = np.random.default_rng()
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    if split != "train":
        return _full_image_rays(img.copy(), msk, ray_o, ray_d, bounds)

    lists = {k: [] for k in RayBatch._fields}
    n_sampled = 0
    coord_all = np.argwhere(bound_mask == 1)
    loss = loss_img[coord_all[:, 0], coord_all[:, 1]].astype(np.float64)
    n_nonzero = int((loss > 0).sum())
    if n_nonzero == 0:
        loss = np.full(len(coord_all), 1.0 / max(len(coord_all), 1))
        n_nonzero = len(coord_all)
    else:
        loss = loss / loss.sum()

    while n_sampled < n_rays:
        n_rand = n_rays - n_sampled
        # replace=False needs at least n_hard pixels with nonzero weight
        n_hard = min(int(n_rand * 0.8), n_nonzero, len(coord_all))
        idx_hard = rng.choice(
            len(coord_all), size=n_hard, replace=False, p=loss,
        )
        idx_unif = rng.integers(0, len(coord_all), n_rand - len(idx_hard))
        coord = coord_all[np.concatenate([idx_hard, idx_unif])]

        o = ray_o[coord[:, 0], coord[:, 1]]
        d = ray_d[coord[:, 0], coord[:, 1]]
        rgb = img[coord[:, 0], coord[:, 1]]
        near, far, hit = get_near_far(bounds, o, d)

        lists["ray_o"].append(o[hit])
        lists["ray_d"].append(d[hit])
        lists["rgb"].append(rgb[hit])
        lists["near"].append(near)
        lists["far"].append(far)
        lists["coord"].append(coord[hit])
        lists["bkgd_msk"].append(
            (msk[coord[:, 0], coord[:, 1]] != 0)[hit][:, None].astype(
                np.float32
            )
        )
        lists["mask_at_box"].append(hit[hit])
        n_sampled += len(near)

    out = {k: np.concatenate(v)[:n_rays] for k, v in lists.items()}
    return RayBatch(
        rgb=out["rgb"].astype(np.float32),
        ray_o=out["ray_o"].astype(np.float32),
        ray_d=out["ray_d"].astype(np.float32),
        near=out["near"].astype(np.float32),
        far=out["far"].astype(np.float32),
        coord=out["coord"].astype(np.int64),
        mask_at_box=out["mask_at_box"],
        bkgd_msk=out["bkgd_msk"].astype(np.float32),
    )


def _full_image_rays(img, msk, ray_o, ray_d, bounds) -> RayBatch:
    rgb = img.reshape(-1, 3).astype(np.float32)
    o = ray_o.reshape(-1, 3).astype(np.float32)
    d = ray_d.reshape(-1, 3).astype(np.float32)
    near, far, hit = get_near_far(bounds, o, d)
    near_all = np.zeros_like(o[:, 0])
    far_all = np.ones_like(o[:, 0])
    near_all[hit] = near
    far_all[hit] = far
    return RayBatch(
        rgb=rgb,
        ray_o=o,
        ray_d=d,
        near=near_all.astype(np.float32),
        far=far_all.astype(np.float32),
        coord=np.zeros((len(rgb), 2), np.int64),
        mask_at_box=hit,
        bkgd_msk=np.ones((len(rgb), 1), np.float32),
    )

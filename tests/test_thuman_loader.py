"""THuman loader against a synthetic on-disk fixture.

Exercises the real directory layout (annots.npy / mask_cihp / new_vertices /
new_params / X_vertices.npy) end-to-end, and the ``image_scaling`` resize +
intrinsics rescale (behavioral reference: THuman_dataset.py:192-198; the
eval sizes frames as ``512 * ratio``, run_nerf_batch.py:143,185).
"""

import os

import cv2
import numpy as np
import pytest

from mpsnerf_tpu.data.thuman import THumanDatasetBatch

H = W = 64
N_VIEWS = 24
N_POSES = 2


def _camera(i):
    a = 2 * np.pi * i / N_VIEWS
    pos = np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.0])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world -> cam rows
    T = -R @ pos
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1.0]])
    return K, R, T.reshape(3, 1)


@pytest.fixture(scope="module")
def thuman_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("thuman") / "subject_F"
    rng = np.random.default_rng(0)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(N_VIEWS):
        K, R, T = _camera(v)
        cams["K"].append(K)
        cams["D"].append(np.zeros(5))
        cams["R"].append(R)
        cams["T"].append(T)

    ims = []
    for p in range(N_POSES):
        paths = []
        for v in range(N_VIEWS):
            rel = os.path.join(f"{v:02d}", f"{p}.jpg")
            paths.append(rel)
            img = np.zeros((H, W, 3), np.uint8)
            img[24:40, 24:40] = rng.integers(64, 255, (16, 16, 3))
            msk = np.zeros((H, W), np.uint8)
            msk[24:40, 24:40] = 255
            ipath = root / rel
            mpath = root / "mask_cihp" / rel.replace("jpg", "png")
            ipath.parent.mkdir(parents=True, exist_ok=True)
            mpath.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(ipath), img)
            cv2.imwrite(str(mpath), msk)
        ims.append({"ims": paths})

    np.save(root / "annots.npy", {"cams": cams, "ims": ims})

    (root / "new_vertices").mkdir()
    (root / "new_params").mkdir()
    verts = (0.2 * rng.standard_normal((300, 3))).astype(np.float32)
    for p in range(N_POSES):
        np.save(root / "new_vertices" / f"{p}.npy", verts)
        np.save(
            root / "new_params" / f"{p}.npy",
            {
                "poses": np.zeros(72, np.float32),
                "shapes": np.zeros(10, np.float32),
                "R": np.eye(3, dtype=np.float32),
                "Th": np.zeros((1, 3), np.float32),
            },
        )
    np.save(root / "X_vertices.npy", verts)
    return str(root)


def _load(root, ratio):
    ds = THumanDatasetBatch(
        root, split="test", view_num=4, N_rand=32, poses_num=N_POSES,
        image_scaling=ratio, seed=0,
    )
    assert len(ds) == N_POSES
    return ds, ds.get_item(0)


class TestTHumanLoader:
    def test_full_res_item(self, thuman_root):
        ds, item = _load(thuman_root, 1.0)
        assert ds.input_view == [0, 6, 12, 18]
        assert item["img_all"].shape == (4, 3, H, W)
        assert item["rgb_all"].shape == (N_VIEWS, H * W, 3)
        assert item["vertices"].shape == (300, 3)
        assert item["gender"] == 0
        # rays from in-mask pixels see finite near < far
        mab = item["mask_at_box_all"][0]
        assert mab.any()
        near = item["near_all"][0][mab[: H * W]]
        far = item["far_all"][0][mab[: H * W]]
        assert np.all(near < far)

    def test_image_scaling_half(self, thuman_root):
        _, full = _load(thuman_root, 1.0)
        _, half = _load(thuman_root, 0.5)
        h, w = H // 2, W // 2
        assert half["img_all"].shape == (4, 3, h, w)
        assert half["msk_all"].shape[1:] == (h, w)
        assert half["rgb_all"].shape == (N_VIEWS, h * w, 3)
        # intrinsics: first two rows scale, third row untouched
        np.testing.assert_allclose(
            half["K_all"][:, :2], 0.5 * full["K_all"][:, :2], atol=1e-6
        )
        np.testing.assert_allclose(half["K_all"][:, 2], full["K_all"][:, 2])
        # same world geometry: ray origins unchanged, in-box ray fraction
        # comparable at both resolutions
        np.testing.assert_allclose(
            half["ray_o_all"][0][0], full["ray_o_all"][0][0], atol=1e-5
        )
        frac_full = full["mask_at_box_all"].mean()
        frac_half = half["mask_at_box_all"].mean()
        assert abs(frac_full - frac_half) < 0.05

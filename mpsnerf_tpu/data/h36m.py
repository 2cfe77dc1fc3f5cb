"""Human3.6M dataset loaders.

Behavioral reference: ``/root/reference/lib/h36m_dataset.py`` —
``H36MDatasetBatch`` (:269), ``H36MDatasetPair`` (:608),
``H36MDatasetBatchAll`` (:945).

Differences from THuman handled here (same file:line cites):
  * 4 cameras, 1000x1000 images, translations divided by 1000 (:471)
  * SMPL global rotation stored as axis-angle ``Rh`` -> Rodrigues (:396)
  * masks carry erode/dilate levels 1/100/200 (:319-346); the H36M ray
    sampler excludes both border levels from the box and draws part of the
    background budget from the outer border
  * extra per-view outputs ``o_img_all`` (unmasked image for GT metrics)
    and ``msk_cihp_all`` (:534-535)
  * canonical template: per-subject ``45_big_pose_tvertices.npy`` or the
    neutral mean-shape template (:501-505)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from mpsnerf_tpu.data.voxelize import voxelize_vertices
from mpsnerf_tpu.rays.rays import sample_rays_h36m_batch

_H36M_HUMAN_DIRS = [
    "./data/h36m/S1/Posing", "./data/h36m/S5/Posing", "./data/h36m/S6/Posing",
    "./data/h36m/S7/Posing", "./data/h36m/S9/Posing",
]


def _imread(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[..., ::-1]
    return img


class H36MDatasetBatch:
    def __init__(
        self,
        data_root: str,
        split: str = "test",
        view_num: int = 3,
        border: int = 5,
        N_rand: int = 1024 * 32,
        image_scaling: float = 1.0,
        multi_person: bool = False,
        num_instance: int = 1,
        start: int = 0,
        interval: int = 10,
        poses_num: int = 100,
        mean_shape: int = 1,
        new_mask: int = 0,
        seed: Optional[int] = None,
    ):
        self.data_root = data_root
        self.split = split
        self.mean_shape = mean_shape
        self.new_mask = new_mask
        self.border = border
        self.image_scaling = image_scaling
        self.nrays = N_rand
        self.num_instance = num_instance
        self.multi_person = multi_person
        self.rng = np.random.default_rng(seed)

        self.input_view = [0, 1, 2] if view_num == 3 else [0, 1, 2, 3]
        self.train_view = [0, 1, 2, 3]
        self.test_view = [0, 1, 2, 3]
        self.output_view = self.train_view if split == "train" else self.test_view

        self.i = start
        self.i_intv = interval
        self.ni = poses_num

        self.root_list = [data_root] if not multi_person else list(_H36M_HUMAN_DIRS)
        self._load_annots(data_root)

    def _load_annots(self, data_root: str) -> None:
        self.data_root = data_root
        annots = np.load(
            os.path.join(data_root, "annots.npy"), allow_pickle=True
        ).item()
        self.cams = annots["cams"]
        window = annots["ims"][self.i : self.i + self.ni * self.i_intv][
            :: self.i_intv
        ]
        self.ims = np.array(
            [np.array(d["ims"])[self.output_view] for d in window]
        )

    update = _load_annots

    def get_mask(self, index: int, view_index: int):
        msk_dir = "refined_mask" if self.new_mask else "mask_cihp"
        path = (
            os.path.join(self.data_root, msk_dir, self.ims[index][view_index])[:-4]
            + ".png"
        )
        msk_cihp = _imread(path)
        msk_cihp = (
            (msk_cihp > 200) if self.new_mask else (msk_cihp != 0)
        ).astype(np.uint8)
        msk = msk_cihp if msk_cihp.ndim == 2 else msk_cihp[..., 0]
        o_msk_cihp = msk.copy()

        kernel = np.ones((self.border, self.border), np.uint8)
        msk_erode = msk.copy() if self.new_mask else cv2.erode(msk.copy(), kernel)
        msk_dilate = cv2.dilate(msk.copy(), kernel)
        kernel_ = np.ones((self.border + 3, self.border + 3), np.uint8)
        msk_dilate_ = cv2.dilate(msk.copy(), kernel_)
        msk = msk.copy()
        msk[(msk_dilate - msk_erode) == 1] = 100
        msk[(msk_dilate_ - msk_dilate) == 1] = 200
        return msk, o_msk_cihp

    def _canonical_template_path(self) -> str:
        if self.mean_shape:
            return os.path.join("data", "n_X_template_tvertices.npy")
        return os.path.join(self.data_root, "45_big_pose_tvertices.npy")

    def prepare_input(self, i: int):
        xyz = np.load(
            os.path.join(self.data_root, "new_vertices", f"{i}.npy")
        ).astype(np.float32)
        vertices = xyz
        world_bounds = np.stack(
            [xyz.min(0) - 0.05, xyz.max(0) + 0.05], axis=0
        ).astype(np.float32)

        params = np.load(
            os.path.join(self.data_root, "new_params", f"{i}.npy"),
            allow_pickle=True,
        ).item()
        Rh = np.asarray(params["Rh"], np.float32)
        R = cv2.Rodrigues(Rh)[0].astype(np.float32)
        Th = np.asarray(params["Th"], np.float32)
        smpl_xyz = np.dot(xyz - Th, R)

        feature, coord, out_sh, bounds = voxelize_vertices(smpl_xyz)
        return (feature, coord, out_sh, world_bounds, bounds, Rh, Th,
                vertices, params)

    def __len__(self) -> int:
        return len(self.ims) * self.num_instance

    def __getitem__(self, pose_index: int) -> Dict:
        return self.get_item(pose_index)

    def get_item(self, pose_index: int, instance_idx: Optional[int] = None) -> Dict:
        if instance_idx is None:
            instance_idx = (
                int(self.rng.integers(len(self.root_list)))
                if self.multi_person
                else 0
            )
        self._load_annots(self.root_list[instance_idx])
        pose_index = pose_index % self.ni

        per_view: Dict[str, List] = {
            k: []
            for k in (
                "img_all o_img_all msk_cihp_all msk_all K_all R_all T_all "
                "rgb_all ray_o_all ray_d_all near_all far_all "
                "mask_at_box_all bkgd_msk_all"
            ).split()
        }
        params = vertices = smpl_R = Th = None
        feature = coord = out_sh = world_bounds = bounds = None
        t_vertices = t_feature = t_coord = t_out_sh = t_bounds = None

        for idx, view_index in enumerate(self.output_view):
            img_path = os.path.join(
                self.data_root, self.ims[pose_index][idx].replace("\\", "/")
            )
            img = _imread(img_path).astype(np.float32) / 255.0
            msk, msk_cihp = self.get_mask(pose_index, idx)

            img = cv2.resize(img, (1000, 1000), interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, (1000, 1000), interpolation=cv2.INTER_NEAREST)
            msk_cihp = cv2.resize(
                msk_cihp, (1000, 1000), interpolation=cv2.INTER_NEAREST
            )

            K = np.array(self.cams["K"][view_index])
            D = np.array(self.cams["D"][view_index])
            img = cv2.undistort(img, K, D)
            msk = cv2.undistort(msk, K, D)
            R = np.array(self.cams["R"][view_index])
            T = np.array(self.cams["T"][view_index]) / 1000.0

            ratio = self.image_scaling
            if ratio != 1.0:
                H, W = int(img.shape[0] * ratio), int(img.shape[1] * ratio)
                img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
                msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
                K = K.copy()
                K[:2] = K[:2] * ratio
            img[msk == 0] = 0

            if view_index == self.output_view[0]:
                i = int(os.path.basename(img_path)[:-4])
                (feature, coord, out_sh, world_bounds, bounds, Rh, Th,
                 vertices, params) = self.prepare_input(i)
                smpl_R = cv2.Rodrigues(Rh)[0].astype(np.float32)
                params = dict(params)
                params["R"] = smpl_R
                t_path = self._canonical_template_path()
                t_vertices = np.load(t_path).astype(np.float32)
                t_feature, t_coord, t_out_sh, t_bounds = voxelize_vertices(
                    t_vertices
                )

            o_img = img.copy()
            if msk_cihp.shape[:2] == o_img.shape[:2]:
                o_img[msk_cihp == 0] = 0

            rb = sample_rays_h36m_batch(
                img, msk, K, R, T, world_bounds, self.nrays, self.split,
                body_ratio=0.6, rng=self.rng,
            )

            if view_index in self.input_view:
                per_view["img_all"].append(np.transpose(img, (2, 0, 1)))
                per_view["K_all"].append(K)
                per_view["R_all"].append(R)
                per_view["T_all"].append(T)
            per_view["o_img_all"].append(np.transpose(o_img, (2, 0, 1)))
            per_view["msk_cihp_all"].append(msk_cihp)
            per_view["msk_all"].append(msk)
            per_view["rgb_all"].append(rb.rgb)
            per_view["ray_o_all"].append(rb.ray_o)
            per_view["ray_d_all"].append(rb.ray_d)
            per_view["near_all"].append(rb.near[..., None])
            per_view["far_all"].append(rb.far[..., None])
            per_view["mask_at_box_all"].append(rb.mask_at_box)
            per_view["bkgd_msk_all"].append(rb.bkgd_msk)

        ret = {
            "pose_index": np.int32(pose_index),
            "instance_idx": np.int32(instance_idx),
            "R": smpl_R,
            "Th": np.asarray(Th, np.float32),
            "gender": np.int32(2),
            "params": {
                "poses": np.asarray(params["poses"], np.float32).reshape(-1),
                "shapes": np.asarray(params["shapes"], np.float32).reshape(-1),
                "R": np.asarray(params["R"], np.float32).reshape(3, 3),
                "Th": np.asarray(params["Th"], np.float32).reshape(1, 3),
            },
            "vertices": np.asarray(vertices, np.float32),
            "feature": feature,
            "coord": coord,
            "out_sh": out_sh,
            "bounds": bounds,
            "t_vertices": t_vertices,
            "t_feature": t_feature,
            "t_coord": t_coord,
            "t_out_sh": t_out_sh,
            "t_bounds": t_bounds,
        }
        for k, v in per_view.items():
            if not v:
                continue
            ret[k] = np.stack(v, axis=0).astype(
                np.float32 if k != "mask_at_box_all" else bool
            )
        return ret


class H36MDataset(H36MDatasetBatch):
    """Legacy variant (ref h36m_dataset.py:16-266) — identical behavior to
    the batch loader at these tables; kept for factory/name parity."""


class H36MDatasetPair(H36MDatasetBatch):
    """Pair items for H36M_P training (ref h36m_dataset.py:608-785):
    50% same-pose pairs, else a random pose within ``border`` indices."""

    def __init__(self, *args, random_pair: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.random_pair = random_pair

    def __getitem__(self, index: int) -> Dict:
        instance_idx = (
            int(self.rng.integers(len(self.root_list)))
            if self.multi_person
            else 0
        )
        sp_pose = index % self.ni
        if self.random_pair and self.rng.uniform() >= 0.5:
            lo = max(0, sp_pose - self.border)
            hi = min(self.ni - 1, sp_pose + self.border)
            tp_pose = int(self.rng.integers(lo, hi + 1))
        else:
            tp_pose = sp_pose
        sp = self.get_item(sp_pose, instance_idx=instance_idx)
        tp = self.get_item(tp_pose, instance_idx=instance_idx)
        return {"sp_input": sp, "tp_input": tp}


class H36MDatasetBatchAll(H36MDatasetBatch):
    """Iterates subjects round-robin instead of sampling (ref :945)."""

    def __getitem__(self, index: int) -> Dict:
        instance_idx = (index // self.ni) % len(self.root_list)
        return self.get_item(index % self.ni, instance_idx=instance_idx)

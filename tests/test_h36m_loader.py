"""H36M loader against a synthetic on-disk fixture.

Exercises the real directory layout (annots.npy / mask_cihp /
new_vertices / new_params / 45_big_pose_tvertices.npy) end-to-end:
frame windowing (start/interval/poses_num), the 1000x1000 resize +
undistort, T/1000 millimeter conversion, Rh -> Rodrigues, the tri-level
mask (0/1/100/200), o_img masking by the raw cihp mask, and
``image_scaling`` with the K rescale.  Behavioral reference:
``/root/reference/lib/h36m_dataset.py:269-607``.
"""

import os

import cv2
import numpy as np
import pytest

from mpsnerf_tpu.data.h36m import H36MDatasetBatch, H36MDatasetPair

SRC = 200          # on-disk image size (loader resizes to 1000x1000)
N_VIEWS = 4
N_FRAMES = 5


def _camera(i):
    a = 2 * np.pi * i / N_VIEWS
    pos = np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.0])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world -> cam rows
    T_m = -R @ pos                            # meters
    # K in the 1000x1000 frame the loader resizes into
    K = np.array([[900.0, 0, 500.0], [0, 900.0, 500.0], [0, 0, 1.0]])
    return K, R, (T_m * 1000.0).reshape(3, 1)  # annots store millimeters


@pytest.fixture(scope="module")
def h36m_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("h36m") / "S9" / "Posing"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(N_VIEWS):
        K, R, T = _camera(v)
        cams["K"].append(K)
        cams["D"].append(np.zeros(5))
        cams["R"].append(R)
        cams["T"].append(T)

    ims = []
    for f in range(N_FRAMES):
        paths = []
        for v in range(N_VIEWS):
            rel = os.path.join(f"Camera_B{v + 1}", f"{f:06d}.jpg")
            paths.append(rel)
            img = np.zeros((SRC, SRC, 3), np.uint8)
            img[90:110, 90:110] = rng.integers(64, 255, (20, 20, 3))
            msk = np.zeros((SRC, SRC), np.uint8)
            msk[90:110, 90:110] = 255
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
    verts = (0.08 * rng.standard_normal((300, 3))).astype(np.float32)
    Rh = np.array([0.0, 0.0, 0.3], np.float32)  # axis-angle global rot
    for f in range(N_FRAMES):
        np.save(root / "new_vertices" / f"{f:d}.npy", verts)
        np.save(
            root / "new_params" / f"{f:d}.npy",
            {
                "Rh": Rh,
                "Th": np.zeros((1, 3), np.float32),
                "poses": np.zeros(72, np.float32),
                "shapes": np.zeros(10, np.float32),
            },
        )
    np.save(root / "45_big_pose_tvertices.npy", verts)
    return str(root)


class TestH36MLoader:
    def test_item_schema_and_windowing(self, h36m_root):
        ds = H36MDatasetBatch(
            h36m_root, split="test", view_num=3, N_rand=32,
            start=1, interval=2, poses_num=2, image_scaling=0.2,
            mean_shape=0, seed=0,
        )
        assert len(ds) == 2
        # window start=1 interval=2 -> frames 1 and 3
        assert os.path.basename(ds.ims[0][0]) == "000001.jpg"
        assert os.path.basename(ds.ims[1][0]) == "000003.jpg"

        item = ds.get_item(0)
        Hs = int(1000 * 0.2)
        assert item["img_all"].shape == (3, 3, Hs, Hs)   # input views
        assert item["o_img_all"].shape == (4, 3, Hs, Hs)  # all views
        assert item["rgb_all"].shape == (4, Hs * Hs, 3)
        assert item["ray_o_all"].shape == (4, Hs * Hs, 3)
        assert item["near_all"].shape == (4, Hs * Hs, 1)
        assert item["mask_at_box_all"].dtype == bool
        assert item["params"]["poses"].shape == (72,)
        assert item["params"]["Th"].shape == (1, 3)
        assert item["vertices"].shape == (300, 3)
        assert item["t_vertices"].shape == (300, 3)
        for k in ("feature", "coord", "out_sh", "bounds",
                  "t_feature", "t_coord", "t_out_sh", "t_bounds",
                  "msk_cihp_all", "bkgd_msk_all"):
            assert k in item, k

    def test_intrinsics_scaled_and_T_in_meters(self, h36m_root):
        ds = H36MDatasetBatch(
            h36m_root, split="test", view_num=3, N_rand=32,
            start=0, interval=1, poses_num=1, image_scaling=0.2,
            mean_shape=0, seed=0,
        )
        item = ds.get_item(0)
        K0, _, T0 = _camera(0)
        np.testing.assert_allclose(item["K_all"][0][:2], K0[:2] * 0.2,
                                   rtol=1e-6)
        np.testing.assert_allclose(item["K_all"][0][2], K0[2], rtol=1e-6)
        # annots store millimeters; items carry meters
        np.testing.assert_allclose(
            item["T_all"][0].reshape(3), (T0 / 1000.0).reshape(3),
            rtol=1e-5, atol=1e-7,
        )

    def test_rh_rodrigues_and_body_visible(self, h36m_root):
        ds = H36MDatasetBatch(
            h36m_root, split="test", view_num=3, N_rand=32,
            start=0, interval=1, poses_num=1, image_scaling=0.2,
            mean_shape=0, seed=0,
        )
        item = ds.get_item(0)
        expect_R = cv2.Rodrigues(np.array([0.0, 0.0, 0.3]))[0]
        np.testing.assert_allclose(item["params"]["R"], expect_R,
                                   atol=1e-6)
        np.testing.assert_allclose(item["R"], expect_R, atol=1e-6)
        # the body AABB must be hit by some rays in every view
        assert item["mask_at_box_all"].reshape(4, -1).any(axis=1).all()
        # o_img equals img wherever the cihp mask is set, zero elsewhere
        o = item["o_img_all"][0]
        assert np.isfinite(o).all()

    def test_pair_dataset_same_instance(self, h36m_root):
        ds = H36MDatasetPair(
            h36m_root, split="train", view_num=3, N_rand=16,
            start=0, interval=1, poses_num=3, image_scaling=0.2,
            mean_shape=0, border=2, seed=0,
        )
        pair = ds[1]
        assert set(pair) == {"sp_input", "tp_input"}
        assert int(pair["sp_input"]["pose_index"]) == 1
        assert 0 <= int(pair["tp_input"]["pose_index"]) < 3
        # train split samples N_rand rays
        assert pair["sp_input"]["rgb_all"].shape[1] == 16


class TestH36MEvalEntryPoint:
    def test_run_h36m_eval_end_to_end(self, h36m_root, tmp_path,
                                      monkeypatch):
        """run_h36m_eval end-to-end on the fixture: per-subject tables,
        _SpThenWindow, masked-ray dispatch through the pipelined pass,
        o_img GT, metrics at the protocol's 1000x1000.  Tables are
        monkeypatched to one pose so the CPU render stays small."""
        import types

        import jax
        import jax.numpy as jnp

        from mpsnerf_tpu.eval import runner as R
        from mpsnerf_tpu.models.mps_nerf import MPSNeRF
        from mpsnerf_tpu.smpl.model import synthetic_smpl
        from mpsnerf_tpu.train.trainer import to_device_input

        monkeypatch.setattr(R, "H36M_ROOTS", [h36m_root])
        monkeypatch.setattr(R, "H36M_SUBJECTS", ["S9"])
        monkeypatch.setattr(R, "H36M_POSES_NUM", [1])
        monkeypatch.setattr(R, "H36M_NOVEL_VIEW_POSES_NUM", [1])
        monkeypatch.setattr(R, "H36M_INPUT_POSE", [0])
        monkeypatch.setattr(R, "H36M_START_POSE", [1])
        # prewarm compiles a spread of capacity buckets (minutes on
        # CPU) and is covered by its own tests — skip it here
        monkeypatch.setattr(
            R.ViewRenderer, "prewarm", lambda self, *a, **k: []
        )

        smpl = synthetic_smpl(n_verts=300, seed=0)
        model = MPSNeRF(num_instances=1)
        from mpsnerf_tpu.data.h36m import H36MDatasetBatch

        probe = H36MDatasetBatch(
            h36m_root, split="test", view_num=3, N_rand=16,
            start=0, interval=1, poses_num=1, mean_shape=0, seed=0,
        )
        inp = to_device_input(probe.get_item(0))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        args = types.SimpleNamespace(
            test_persons=0, test_split="test", view_num=3, mean_shape=0,
            new_mask=0, chunk=1024, N_samples=4, white_bkgd=0,
        )
        m = R.run_h36m_eval(
            args, model, variables, lambda g: smpl, str(tmp_path),
            verbose=False,
        )
        assert (tmp_path / "metrics.json").exists()
        assert np.isfinite(m["novel_view_mean_human"]).all()
        assert np.isfinite(m["novel_pose_mean_human"]).all()
        # protocol shape: 1 human x 1 pose x 1 view
        assert m["novel_view_psnr"].shape == (1, 1, 1)

"""Config-surface and eval-metric tests."""

import json
import os

import numpy as np
import pytest

from mpsnerf_tpu.config import parse_args, dump_args
from mpsnerf_tpu.eval.metrics import (
    psnr_metric, ssim_metric, structural_similarity,
)


class TestConfig:
    def test_reference_config_file_parses(self, tmp_path):
        """The shipped reference config format (duplicate keys, later wins)
        must parse to the documented values."""
        cfg = tmp_path / "c.txt"
        cfg.write_text(
            "expname = THuman_3_view\n"
            "mean_shape = 0\n"
            "view_num = 3\n"
            "model = skinning_batch\n"
            "use_trans = 1\n"
            "N_rand = 1000\n"
            "N_samples = 128\n"
            "chunk = 12000\n"
            "num_instance = 25\n"
            "N_iteration = 240100\n"
            "with_viewdirs = 0\n"
            "with_viewdirs = 0\n"   # duplicate key (present in h36m.txt)
            "border = 1\n"
            "border = 5\n"          # later wins
            "use_viewdirs = True\n"
            "lrate = 0.0005\n"
        )
        args = parse_args(["--config", str(cfg)])
        assert args.expname == "THuman_3_view"
        assert args.mean_shape == 0
        assert args.view_num == 3
        assert args.model == "skinning_batch"
        assert args.N_rand == 1000
        assert args.N_samples == 128
        assert args.chunk == 12000
        assert args.N_iteration == 240100
        assert args.border == 5
        assert args.use_viewdirs is True
        assert args.lrate == pytest.approx(5e-4)

    def test_cli_overrides_config(self, tmp_path):
        cfg = tmp_path / "c.txt"
        cfg.write_text("view_num = 3\nN_samples = 128\n")
        args = parse_args(["--config", str(cfg), "--view_num", "4"])
        assert args.view_num == 4
        assert args.N_samples == 128

    def test_defaults_match_reference(self):
        args = parse_args([])
        # spot-check parser_config.py defaults
        assert args.lrate == pytest.approx(5e-4)
        assert args.N_samples == 64
        assert args.smooth_interval == 4
        assert args.i_weights == 12000
        assert args.acc_loss == 1 and args.density_loss == 0

    def test_dump_args(self, tmp_path):
        args = parse_args([])
        dump_args(args, str(tmp_path), "exp")
        text = (tmp_path / "exp" / "args.txt").read_text()
        assert "lrate = 0.0005" in text


class TestMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((8, 8, 3))
        b = np.full((8, 8, 3), 0.1)
        assert psnr_metric(a, b) == pytest.approx(20.0, abs=1e-6)

    def test_ssim_identity_is_one(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(32, 32)).astype(np.float64)
        assert structural_similarity(img, img) == pytest.approx(1.0, abs=1e-7)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(64, 64))
        s1 = structural_similarity(img, img + rng.normal(size=img.shape) * 0.02)
        s2 = structural_similarity(img, img + rng.normal(size=img.shape) * 0.2)
        assert 1 > s1 > s2

    def test_ssim_multichannel_is_channel_mean(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(32, 32, 3))
        b = a + rng.normal(size=a.shape) * 0.05
        full = structural_similarity(a, b, channel_axis=-1)
        per = np.mean(
            [structural_similarity(a[..., c], b[..., c]) for c in range(3)]
        )
        assert full == pytest.approx(per, abs=1e-12)

    def test_ssim_metric_bbox_crop(self):
        rng = np.random.default_rng(2)
        H = W = 64
        mask = np.zeros((H, W), bool)
        mask[20:40, 10:50] = True
        gt = rng.uniform(size=(mask.sum(), 3))
        # identical pred -> 1.0 regardless of crop
        assert ssim_metric(gt, gt, mask, H, W) == pytest.approx(1.0, abs=1e-7)

    def test_ssim_uniform_window_semantics(self):
        """Golden check of the covariance normalization: constant images
        with a single differing pixel behave as the analytic SSIM."""
        a = np.full((16, 16), 0.5)
        b = a.copy()
        s = structural_similarity(a, b)
        assert s == pytest.approx(1.0)


class TestProtocol:
    def test_metrics_json_schema(self, tmp_path):
        from mpsnerf_tpu.eval.protocol import evaluate_novel_view_pose

        H = W = 16
        rng = np.random.default_rng(0)

        def make_item(pose):
            return {
                "pose_index": pose,
                "rgb_all": rng.uniform(size=(2, H * W, 3)).astype(np.float32),
                "mask_at_box_all": np.ones((2, H * W), bool),
            }

        items = [make_item(i) for i in range(3)]
        humans = {"h0": {"novel_pose": items, "novel_view": items[:2]}}

        def render_view(sp, tp, k):
            return np.asarray(tp["rgb_all"][k]) + 0.01

        m = evaluate_novel_view_pose(
            render_view, humans, [0, 1], H, W, str(tmp_path), verbose=False
        )
        with open(tmp_path / "metrics.json") as f:
            j = json.load(f)
        for key in (
            "novel_view_mean_human", "novel_pose_mean_human",
            "novel_view_all_human", "novel_pose_all_human",
        ):
            assert key in j
        # mean_human rows are [mse, psnr, ssim]
        assert len(j["novel_view_mean_human"]) == 3
        assert j["novel_view_mean_human"][0] == pytest.approx(1e-4, rel=1e-3)
        # novel_pose pass skips the source item: 2 poses x 2 views
        assert m["novel_pose_psnr"].shape == (1, 2, 2)
        # PNGs written
        assert (tmp_path / "novel_pose" / "h0").is_dir()
        files = os.listdir(tmp_path / "novel_pose" / "h0")
        assert any(f.endswith("_gt.png") for f in files)

    def test_pipelined_pass_matches_sequential(self, tmp_path):
        """render_async pipelining must not change metrics or files —
        only the host-side ordering (the dispatch of view i+1 happens
        before view i's finish)."""
        from mpsnerf_tpu.eval.protocol import evaluate_novel_view_pose

        H = W = 16
        rng = np.random.default_rng(0)

        def make_item(pose):
            return {
                "pose_index": pose,
                "rgb_all": rng.uniform(size=(2, H * W, 3)).astype(np.float32),
                "mask_at_box_all": np.ones((2, H * W), bool),
            }

        items = [make_item(i) for i in range(3)]
        humans = {"h0": {"novel_pose": items, "novel_view": items[:2]}}

        def render_view(sp, tp, k):
            return np.asarray(tp["rgb_all"][k]) + 0.01

        order = []

        def dispatch(sp, tp, k):
            order.append(("dispatch", int(tp["pose_index"]), k))
            return render_view(sp, tp, k)

        def finish(handle):
            order.append(("finish",))
            return handle

        m_seq = evaluate_novel_view_pose(
            render_view, humans, [0, 1], H, W, str(tmp_path / "seq"),
            verbose=False,
        )
        m_pipe = evaluate_novel_view_pose(
            render_view, humans, [0, 1], H, W, str(tmp_path / "pipe"),
            verbose=False, render_async=(dispatch, finish),
        )
        for key in ("novel_view_psnr", "novel_pose_psnr",
                    "novel_view_ssim", "novel_pose_ssim"):
            np.testing.assert_array_equal(m_seq[key], m_pipe[key])
        # pipelining actually happened: two dispatches before a finish
        assert order[0][0] == "dispatch" and order[1][0] == "dispatch"
        assert order[2] == ("finish",)
        # same files on disk
        a = sorted(os.listdir(tmp_path / "seq" / "novel_pose" / "h0"))
        b = sorted(os.listdir(tmp_path / "pipe" / "novel_pose" / "h0"))
        assert a == b

    def test_run_synthetic_eval_end_to_end(self, tmp_path):
        """The synthetic protocol entry point (run_nerf_batch's eval for
        data_set_type=Synthetic) end-to-end at tiny shapes: dataset
        windows, prewarm, pipelined render_async pass, metrics files."""
        import types

        import jax
        import jax.numpy as jnp

        from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
        from mpsnerf_tpu.eval.runner import run_synthetic_eval
        from mpsnerf_tpu.models.mps_nerf import MPSNeRF
        from mpsnerf_tpu.train.trainer import to_device_input

        ds = SyntheticHumanDataset(
            n_poses=2, n_cameras=4, image_size=32, n_rays=16, n_verts=300,
            num_instances=1,
        )
        smpl = ds.smpl_for(0)
        inp = to_device_input(ds.get_item(0, instance_idx=0))
        model = MPSNeRF(num_instances=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        args = types.SimpleNamespace(chunk=256, N_samples=4, white_bkgd=0)
        m = run_synthetic_eval(
            args, model, variables, lambda g: smpl, str(tmp_path), ds,
            verbose=False,
        )
        assert (tmp_path / "metrics.json").exists()
        assert np.isfinite(m["novel_view_mean_human"]).all()
        assert np.isfinite(m["novel_pose_mean_human"]).all()

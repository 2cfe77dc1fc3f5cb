"""Pod-scale sharded inference + video assembly tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.parallel.mesh import (
    make_mesh, make_sharded_render, replicate_to_mesh, shard_rays_to_mesh,
)
from mpsnerf_tpu.renderer.render import render_rays
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=64, n_verts=400,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    model = MPSNeRF(num_instances=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    latent = model.apply(variables, inp["img_all"], train=False,
                         method="encode")
    return smpl, inp, model, variables, latent


class TestShardedRender:
    def test_matches_single_device(self, scene):
        smpl, inp, model, variables, latent = scene
        mesh = make_mesh(jax.devices()[:8])
        fn = make_sharded_render(model, mesh, n_samples=8)

        k = 0
        ro = inp["ray_o_all"][k]
        rd = inp["ray_d_all"][k]
        nr = inp["near_all"][k][:, 0]
        fr = inp["far_all"][k][:, 0]
        key = jax.random.PRNGKey(3)

        rgb_s, disp_s, acc_s = fn(
            replicate_to_mesh(variables, mesh),
            replicate_to_mesh(smpl, mesh),
            replicate_to_mesh(inp, mesh),
            replicate_to_mesh(inp, mesh),
            replicate_to_mesh(latent, mesh),
            *shard_rays_to_mesh((ro, rd, nr, fr), mesh),
            replicate_to_mesh(key, mesh),
        )

        out = render_rays(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=8, perturb=0.0,
        )
        np.testing.assert_allclose(
            np.asarray(rgb_s), np.asarray(out.rgb_map), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(acc_s), np.asarray(out.acc_map), atol=2e-5
        )


class TestShardedCompactRender:
    def test_matches_single_device(self, scene):
        """Global-compaction mode on the ray-sharded mesh: each device
        culls+compacts its ray shard; parity with the single-device
        compact renderer and zero drops at adequate capacity."""
        from mpsnerf_tpu.data import attach_body_grid
        from mpsnerf_tpu.renderer.render import render_rays_compact

        smpl, inp, model, variables, latent = scene
        ds_item = dict(inp)
        # body_grid must be in tp for the compact path
        from mpsnerf_tpu.ops.body_grid import build_body_grid

        grid = build_body_grid(np.asarray(inp["vertices"]))
        ds_item["body_grid"] = jax.tree.map(jnp.asarray, grid)

        mesh = make_mesh(jax.devices()[:8])
        cap = 512  # per-device; 64x64 scene -> few candidates per shard
        fn = make_sharded_render(model, mesh, n_samples=8, capacity=cap,
                                 tile=512)

        k = 1
        ro = inp["ray_o_all"][k]
        rd = inp["ray_d_all"][k]
        nr = inp["near_all"][k][:, 0]
        fr = inp["far_all"][k][:, 0]
        # shuffle rays so per-shard candidate counts sit near the mean
        perm = np.random.default_rng(0).permutation(ro.shape[0])
        ro, rd, nr, fr = ro[perm], rd[perm], nr[perm], fr[perm]
        key = jax.random.PRNGKey(3)

        rgb_s, disp_s, acc_s, nd = fn(
            replicate_to_mesh(variables, mesh),
            replicate_to_mesh(smpl, mesh),
            replicate_to_mesh(ds_item, mesh),
            replicate_to_mesh(ds_item, mesh),
            replicate_to_mesh(latent, mesh),
            *shard_rays_to_mesh((ro, rd, nr, fr), mesh),
            replicate_to_mesh(key, mesh),
        )
        assert nd.shape == (8,)
        assert int(jnp.max(nd)) == 0

        rgb_1, _, acc_1, nd1 = render_rays_compact(
            model, variables, smpl, ds_item, ds_item, latent,
            ro, rd, nr, fr, key, n_samples=8, capacity=4096, tile=512,
            perturb=0.0,
        )
        assert int(nd1) == 0
        np.testing.assert_allclose(
            np.asarray(rgb_s), np.asarray(rgb_1), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(acc_s), np.asarray(acc_1), atol=2e-5
        )


class TestVideo:
    def test_images_to_video(self, tmp_path):
        import cv2

        from mpsnerf_tpu.eval.video import images_to_video, write_sweep_videos

        rng = np.random.default_rng(0)
        names = []
        for i in range(4):
            img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
            name = f"frame0000_view{i:04d}_03.png"
            cv2.imwrite(str(tmp_path / name), img)
            names.append(name)
        path = images_to_video(str(tmp_path), "clip", names, fps=2)
        assert path and os.path.getsize(path) > 0

        write_sweep_videos(str(tmp_path))
        assert (tmp_path / "novel_pose.avi").exists()
        assert (tmp_path / "novel_view.avi").exists()

    def test_empty_list_is_noop(self, tmp_path):
        from mpsnerf_tpu.eval.video import images_to_video

        assert images_to_video(str(tmp_path), "clip", [], fps=1) is None

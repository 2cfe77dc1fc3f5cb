"""Conservative body-occupancy grid: exactness of the cull."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.ops.body_grid import build_body_grid, grid_lookup
from mpsnerf_tpu.ops.knn import nearest_vertex_xla
from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.data import attach_body_grid
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.renderer.render import render_rays
from mpsnerf_tpu.train.trainer import to_device_input


class TestGridConservative:
    def test_no_valid_point_culled(self):
        """Every point within 5 cm of a vertex must be a grid candidate."""
        rng = np.random.default_rng(0)
        verts = rng.normal(size=(500, 3)).astype(np.float32) * 0.3
        bg = build_body_grid(verts, voxel=0.03)

        pts = rng.normal(size=(20000, 3)).astype(np.float32) * 0.5
        d2, _ = nearest_vertex_xla(jnp.asarray(pts), jnp.asarray(verts))
        valid = np.asarray(d2) < 0.05**2
        cand = np.asarray(grid_lookup(bg, jnp.asarray(pts)))
        assert (cand[valid]).all()  # exact superset
        # and it actually culls most far points
        assert cand[~valid].mean() < 0.6

    def test_far_outside_grid_is_false(self):
        verts = np.zeros((10, 3), np.float32)
        bg = build_body_grid(verts, voxel=0.02)
        far = jnp.asarray([[5.0, 5.0, 5.0], [-3.0, 0.0, 0.0]])
        assert not np.asarray(grid_lookup(bg, far)).any()


class TestGridRenderParity:
    def test_render_matches_plain_path(self):
        ds = SyntheticHumanDataset(
            n_poses=1, n_cameras=4, image_size=64, n_rays=64, n_verts=500,
            num_instances=1,
        )
        item = ds.get_item(0, instance_idx=0)
        smpl = ds.smpl_for(0)
        inp_plain = to_device_input(dict(item))
        attach_body_grid(item)
        inp_grid = to_device_input(item)

        model = MPSNeRF(num_instances=1, compact_fraction=0.5)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp_plain, inp_plain,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        latent = model.apply(
            variables, inp_plain["img_all"], train=False, method="encode"
        )
        k = 0
        args = (
            item["ray_o_all"][k], item["ray_d_all"][k],
            item["near_all"][k][:, 0], item["far_all"][k][:, 0],
        )
        o1 = render_rays(model, variables, smpl, inp_plain, inp_plain,
                         latent, *[jnp.asarray(a) for a in args],
                         jax.random.PRNGKey(5), n_samples=8, perturb=0.0)
        o2 = render_rays(model, variables, smpl, inp_grid, inp_grid,
                         latent, *[jnp.asarray(a) for a in args],
                         jax.random.PRNGKey(5), n_samples=8, perturb=0.0)
        np.testing.assert_allclose(
            np.asarray(o1.rgb_map), np.asarray(o2.rgb_map), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o1.acc_map), np.asarray(o2.acc_map), atol=1e-5
        )

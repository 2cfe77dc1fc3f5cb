"""THuman loader against a synthetic on-disk fixture.

Exercises the real directory layout (annots.npy / mask_cihp / new_vertices /
new_params / X_vertices.npy) end-to-end, and the ``image_scaling`` resize +
intrinsics rescale (behavioral reference: THuman_dataset.py:192-198; the
eval sizes frames as ``512 * ratio``, run_nerf_batch.py:143,185).
"""

import numpy as np
import pytest

from mpsnerf_tpu.data.thuman import THumanDatasetBatch

from tests.thuman_fixture import build_thuman_subject

H = W = 64
N_VIEWS = 24
N_POSES = 2


@pytest.fixture(scope="module")
def thuman_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("thuman") / "subject_F"
    return build_thuman_subject(root, n_poses=N_POSES, n_views=N_VIEWS,
                                hw=H, n_verts=300, seed=0)


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

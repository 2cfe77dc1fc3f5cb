"""Geometry pipeline tests: extraction, normal render, animation, spiral."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.geometry import (
    GridSpec, extract_density_mesh, render_normal_map,
    MeshAnimationRenderer, gen_path,
)
from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset, _ring_camera
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=2, n_cameras=4, image_size=64, n_rays=32, n_verts=500,
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
    return ds, item, smpl, inp, model, variables


class TestExtraction:
    def test_analytic_sphere(self, tmp_path):
        """A synthetic density field (solid sphere) extracts to a sphere
        mesh at the right radius — independent of any model."""
        r = 0.3

        def density_fn(pts):
            d = np.linalg.norm(pts, axis=1)
            return np.where(d < r, 500.0, -80.0).astype(np.float32)

        grid = GridSpec(
            start=np.array([-0.5, -0.5, -0.5]),
            size=np.array([1.0, 1.0, 1.0]),
            n=(64, 64, 64),
        )
        # carving verts: dense samples on the sphere
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(2000, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        sphere_verts = (dirs * r).astype(np.float32)
        faces = rng.integers(0, 2000, size=(4000, 3)).astype(np.int32)

        obj = tmp_path / "sphere.obj"
        verts, tris = extract_density_mesh(
            density_fn, grid, sphere_verts, faces, threshold=30.0,
            carve=False, obj_path=str(obj),
        )
        assert len(verts) > 200
        radii = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(radii, r, atol=0.03)
        assert obj.exists()

    def test_model_density_extracts_body(self, scene):
        """The untrained model's masked density still produces geometry
        confined to the 5 cm body shell (the -80 fill carves space)."""
        _, item, smpl, inp, model, variables = scene
        latent = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )

        def density_fn(pts):
            raw = model.apply(
                variables, smpl, inp, inp, latent, jnp.asarray(pts),
                jnp.zeros((len(pts), 3)), train=False,
                method=MPSNeRF.query,
            )
            return np.asarray(raw.sigma)

        verts_src = np.asarray(item["vertices"])
        grid = GridSpec.from_vertices(verts_src, n=48)
        # carve=False: the synthetic rig's random faces give meaningless
        # normals, so the sidedness fill is exercised separately below
        verts, tris = extract_density_mesh(
            density_fn, grid, verts_src, np.asarray(smpl.faces),
            threshold=30.0, carve=False,
        )
        assert np.isfinite(verts).all()
        if len(verts):
            lo = grid.start - 1e-3
            hi = grid.start + grid.size + 1e-3
            assert (verts >= lo).all() and (verts <= hi).all()

    def test_carve_fills_interior(self):
        """With well-oriented normals (sphere hull), the sidedness carve
        fills the interior solid and empties the exterior."""
        from scipy.spatial import ConvexHull

        rng = np.random.default_rng(0)
        r = 0.3
        dirs = rng.normal(size=(800, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        sphere_verts = (dirs * r).astype(np.float32)
        hull = ConvexHull(sphere_verts)
        # orient hull faces outward (ConvexHull winding is arbitrary)
        tris = []
        for s in hull.simplices:
            a, b, c = sphere_verts[s]
            if np.dot(np.cross(b - a, c - a), (a + b + c) / 3) < 0:
                s = s[::-1]
            tris.append(s)
        faces = np.asarray(tris, np.int32)

        def density_fn(pts):
            return np.zeros(len(pts), np.float32)  # no learned density

        grid = GridSpec(
            start=np.array([-0.6, -0.6, -0.6]),
            size=np.array([1.2, 1.2, 1.2]),
            n=(48, 48, 48),
        )
        verts, tris_out = extract_density_mesh(
            density_fn, grid, sphere_verts, faces, threshold=30.0,
            carve=True,
        )
        # the interior fill alone (occ=100 inside, 0 outside) must produce
        # a closed surface near the sphere
        assert len(verts) > 100
        radii = np.linalg.norm(verts, axis=1)
        assert radii.max() < r + 0.15
        assert abs(np.median(radii) - r) < 0.1


class TestNormalRender:
    def test_renders_sphere_normals(self, tmp_path):
        rng = np.random.default_rng(0)
        # icosphere-ish: random sphere points triangulated crudely via
        # convex hull
        from scipy.spatial import ConvexHull

        pts = rng.normal(size=(500, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        hull = ConvexHull(pts)
        verts = pts.astype(np.float32)
        tris = hull.simplices.astype(np.int32)

        K, R, T = _ring_camera(0.3, 4.0, 0.0, 512, 512)
        out = tmp_path / "n.png"
        rgba = render_normal_map(
            verts, tris, K, R, T, save_path=str(out), crop=None
        )
        assert rgba.shape == (512, 512, 4)
        mask = rgba[..., 3] > 0
        assert 0.005 < mask.mean() < 0.8
        # background is white
        assert (rgba[~mask][:, :3] == 255).all()
        assert out.exists()


class TestAnimation:
    def test_bake_and_render(self, scene):
        ds, item, smpl, inp, model, variables = scene
        # canonical "mesh": triangulated canonical template subset
        from scipy.spatial import ConvexHull

        tv = np.asarray(item["t_vertices"])
        hull = ConvexHull(tv)
        renderer = MeshAnimationRenderer(
            model, variables, smpl, tv, hull.simplices.astype(np.int32),
            m_samples=5, interval=0.01,
        )
        renderer.bake(item)
        assert renderer._baked["bweights"].shape == (len(tv), 24)

        item2 = ds.get_item(1, instance_idx=0)
        img_fast = renderer.render_pose(item2, view_index=0,
                                        height=64, width=64, fast=True)
        assert img_fast.shape == (64, 64, 3)
        assert np.isfinite(img_fast).all()

        img_full = renderer.render_pose(item2, view_index=0,
                                        height=64, width=64)
        assert np.isfinite(img_full).all()
        assert img_full.max() > 0  # something rendered


class TestSpiral:
    def test_gen_path_valid_cameras(self):
        cams = [_ring_camera(2 * np.pi * i / 8, 2.0, 0.2, 64, 64)
                for i in range(8)]
        lower = np.array([[0.0, 0.0, 0.0, 1.0]])
        RT = [np.concatenate(
            [np.concatenate([R, T.reshape(3, 1)], 1), lower], 0)
            for _, R, T in cams]
        w2c = gen_path(RT, num_views=12)
        assert len(w2c) == 12
        for m in w2c:
            assert m.shape == (4, 4)
            R = m[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-6)

"""SMPL kinematics + LBS warp tests.

Oracles: scipy Rotation for Rodrigues; analytic single-joint cases for the
rigid chain; round-trip properties for the warps (target -> canonical ->
target must be the identity when both warps share blend weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mpsnerf_tpu.smpl import (
    SMPLModel,
    synthetic_smpl,
    rodrigues,
    rigid_transforms,
    transform_params,
    big_pose_vector,
    deform_target_to_canonical,
    deform_canonical_to_source,
    world_to_smpl,
    smpl_to_world,
)
from mpsnerf_tpu.smpl.lbs import PoseTransforms, inv3x3, posed_vertices
from mpsnerf_tpu.ops.knn import nearest_vertex_xla


@pytest.fixture(scope="module")
def smpl():
    return synthetic_smpl(n_verts=500, seed=0)


def _params(smpl, seed=1, pose_scale=0.3):
    rng = np.random.default_rng(seed)
    rotvec = rng.normal(size=3)
    rotvec /= np.linalg.norm(rotvec)
    R = Rotation.from_rotvec(rotvec * 0.4).as_matrix()
    return {
        "poses": jnp.asarray(rng.normal(size=72) * pose_scale, jnp.float32),
        "shapes": jnp.asarray(rng.normal(size=10) * 0.5, jnp.float32),
        "R": jnp.asarray(R, jnp.float32),
        "Th": jnp.asarray(rng.normal(size=(1, 3)) * 0.1, jnp.float32),
    }


class TestRodrigues:
    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(16, 3)).astype(np.float32)
        ours = np.asarray(rodrigues(jnp.asarray(vecs)))
        # our epsilon convention perturbs the vector slightly; tolerance loose
        ref = Rotation.from_rotvec(vecs).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_zero_is_identity(self):
        out = np.asarray(rodrigues(jnp.zeros((2, 3))))
        np.testing.assert_allclose(out, np.eye(3)[None].repeat(2, 0), atol=1e-6)

    def test_orthonormal(self):
        rng = np.random.default_rng(1)
        R = np.asarray(rodrigues(jnp.asarray(rng.normal(size=(8, 3)))))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(8, 0), atol=1e-5)


class TestRigidChain:
    def test_zero_pose_is_identity_rotation_zero_offset(self):
        smpl = synthetic_smpl(n_verts=200, seed=3)
        A, joints = transform_params(smpl, jnp.zeros(72), jnp.zeros(10))
        A = np.asarray(A)
        np.testing.assert_allclose(
            A[:, :3, :3], np.eye(3)[None].repeat(24, 0), atol=1e-5
        )
        np.testing.assert_allclose(A[:, :3, 3], 0.0, atol=1e-5)

    def test_joint_maps_to_itself_under_own_transform(self):
        # each joint is a fixed point of its own rigid transform composed
        # with the chain: A[j] @ [joint_j, 1] = posed joint position; for the
        # root (identity global), rotating about the root keeps root fixed
        smpl = synthetic_smpl(n_verts=200, seed=3)
        poses = jnp.zeros(72).at[3:6].set(jnp.asarray([0.3, -0.2, 0.5]))
        A, joints = transform_params(smpl, poses, jnp.zeros(10))
        A, joints = np.asarray(A), np.asarray(joints)
        j1 = joints[1]
        mapped = A[1, :3, :3] @ j1 + A[1, :3, 3]
        np.testing.assert_allclose(mapped, j1, atol=1e-5)

    def test_child_follows_parent(self):
        # rotating only the root rotates every joint around the root joint
        smpl = synthetic_smpl(n_verts=200, seed=3)
        rotvec = np.array([0.0, 0.7, 0.0], np.float32)
        poses = jnp.zeros(72).at[0:3].set(jnp.asarray(rotvec))
        A, joints = transform_params(smpl, poses, jnp.zeros(10))
        A, joints = np.asarray(A), np.asarray(joints)
        Rroot = Rotation.from_rotvec(rotvec).as_matrix()
        for j in range(24):
            expected = Rroot @ (joints[j] - joints[0]) + joints[0]
            mapped = A[j, :3, :3] @ joints[j] + A[j, :3, 3]
            np.testing.assert_allclose(mapped, expected, atol=1e-4)


class TestInv3x3:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(32, 3, 3)).astype(np.float32)
        m += np.eye(3) * 2.0
        ours = np.asarray(inv3x3(jnp.asarray(m)))
        ref = np.linalg.inv(m)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestWorldSmpl:
    def test_roundtrip(self, smpl):
        p = _params(smpl)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)), jnp.float32)
        s = world_to_smpl(pts, p["R"], p["Th"])
        back = smpl_to_world(s, p["R"], p["Th"])
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


class TestWarpRoundTrip:
    @pytest.mark.parametrize("mean_shape", [True, False])
    def test_target2c_then_c2source_identity(self, smpl, mean_shape):
        """t2c and c2s with the SAME pose params are exact inverses when they
        share blend weights — the framework's core geometric invariant."""
        p = _params(smpl, seed=5)
        tf = PoseTransforms.create(smpl, p)

        # query points exactly at posed smpl vertices => knn picks themselves
        world_verts = posed_vertices(smpl, p)
        query = world_to_smpl(world_verts, p["R"], p["Th"])

        _, ids = nearest_vertex_xla(query, query)
        can = deform_target_to_canonical(smpl, tf, query, ids, mean_shape)

        # canonical nearest-vertex: canonical template verts via same warp
        smpl_src, world_src, bw = deform_canonical_to_source(
            smpl, tf, can, ids, None, mean_shape
        )
        np.testing.assert_allclose(
            np.asarray(smpl_src), np.asarray(query), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(world_src), np.asarray(world_verts), atol=5e-4
        )

    def test_canonical_space_is_pose_invariant(self, smpl):
        """Vertices of two different poses of the same subject map to the
        same canonical points (the generalization premise of MPS-NeRF)."""
        base = _params(smpl, seed=7)
        p1 = dict(base, poses=jnp.asarray(
            np.random.default_rng(8).normal(size=72) * 0.25, jnp.float32))
        p2 = dict(base, poses=jnp.asarray(
            np.random.default_rng(9).normal(size=72) * 0.25, jnp.float32))

        cans = []
        for p in (p1, p2):
            tf = PoseTransforms.create(smpl, p)
            world_verts = posed_vertices(smpl, p)
            query = world_to_smpl(world_verts, p["R"], p["Th"])
            ids = jnp.arange(smpl.n_verts)
            cans.append(
                np.asarray(
                    deform_target_to_canonical(smpl, tf, query, ids, True)
                )
            )
        np.testing.assert_allclose(cans[0], cans[1], atol=2e-3)

    def test_weights_correction_renormalized(self, smpl):
        p = _params(smpl, seed=11)
        tf = PoseTransforms.create(smpl, p)
        pts = jnp.asarray(
            np.random.default_rng(0).normal(size=(32, 3)) * 0.2, jnp.float32
        )
        _, ids = nearest_vertex_xla(pts, smpl.v_template)
        corr = jnp.asarray(
            np.random.default_rng(1).uniform(size=(32, 24)), jnp.float32
        )
        _, _, bw = deform_canonical_to_source(smpl, tf, pts, ids, corr, True)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(bw, axis=-1)), 1.0, atol=1e-5
        )


class TestBigPose:
    def test_big_pose_entries(self):
        v = np.asarray(big_pose_vector())
        assert v[5] == pytest.approx(np.pi / 4)
        assert v[8] == pytest.approx(-np.pi / 4)
        assert v[23] == pytest.approx(-np.pi / 6)
        assert v[26] == pytest.approx(np.pi / 6)
        assert np.count_nonzero(v) == 4


class TestJit:
    def test_warps_jit_and_grad(self, smpl):
        """Warps must be jittable and differentiable (smooth losses need
        d(sigma)/d(canonical_pts) through the warp)."""
        p = _params(smpl, seed=13)
        tf = PoseTransforms.create(smpl, p)
        pts = jnp.asarray(
            np.random.default_rng(2).normal(size=(16, 3)) * 0.2, jnp.float32
        )
        _, ids = nearest_vertex_xla(pts, smpl.v_template)

        @jax.jit
        def loss(q):
            can = deform_target_to_canonical(smpl, tf, q, ids, True)
            s, w, _ = deform_canonical_to_source(smpl, tf, can, ids, None, True)
            return jnp.sum(w**2)

        g = jax.grad(loss)(pts)
        assert g.shape == pts.shape
        assert np.all(np.isfinite(np.asarray(g)))


class TestFusedGatherParity:
    """fused=True (one (V,30) row gather, EVAL-ONLY) must be bit-identical
    to the three-narrow-gather form — same data, same indices, same
    arithmetic grouping."""

    @pytest.mark.parametrize("mean_shape", [True, False])
    def test_both_warps_bit_identical(self, smpl, mean_shape):
        p = _params(smpl, seed=11)
        tf = PoseTransforms.create(smpl, p)
        world_verts = posed_vertices(smpl, p)
        query = world_to_smpl(world_verts, p["R"], p["Th"])
        _, ids = nearest_vertex_xla(query, query)

        a = deform_target_to_canonical(smpl, tf, query, ids, mean_shape)
        b = deform_target_to_canonical(
            smpl, tf, query, ids, mean_shape, fused=True
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        corr = 0.1 * jnp.ones((query.shape[0], 24), jnp.float32)
        s0, w0, bw0 = deform_canonical_to_source(
            smpl, tf, a, ids, corr, mean_shape
        )
        s1, w1, bw1 = deform_canonical_to_source(
            smpl, tf, a, ids, corr, mean_shape, fused=True
        )
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(bw0), np.asarray(bw1))

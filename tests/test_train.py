"""Training-step + sharding + checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import (
    Trainer, TrainConfig, to_device_input, create_train_state,
)
from mpsnerf_tpu.train.checkpoint import save_checkpoint, restore_latest


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=32, n_verts=400,
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
    return ds, smpl, inp, model, variables


class TestTrainStep:
    def test_loss_decreases(self, setup):
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8, smooth_loss=True, smooth_interval=4)
        trainer = Trainer(model, cfg, variables)
        key = jax.random.PRNGKey(42)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            logs = trainer.train_item(smpl, inp, inp, sub)
            losses.append(logs["loss"])
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert trainer.global_step == 12  # 3 items x 4 views

    def test_resume_lr_decay(self, setup):
        """A state at step S trains at lrate*0.5^(S/decay_steps): with
        identical params/moments the update scales by exactly the LR ratio
        (round-1 advisor finding: resume restarted the schedule at full
        LR because tx.init reset the optax count)."""
        _, smpl, inp, model, variables = setup
        from mpsnerf_tpu.train.trainer import make_train_step

        cfg = TrainConfig(
            n_samples=8, smooth_loss=False, perturb=0.0, decay_steps=100
        )
        step_fn = jax.jit(make_train_step(model, cfg, smooth=False))
        k = 0
        rays = (
            inp["ray_o_all"][k], inp["ray_d_all"][k],
            inp["near_all"][k][:, 0], inp["far_all"][k][:, 0],
            inp["rgb_all"][k], inp["bkgd_msk_all"][k],
        )
        key = jax.random.PRNGKey(3)
        s0 = create_train_state(model, variables, cfg, step=0)
        s1 = create_train_state(model, variables, cfg, step=100)
        n0, _, _ = step_fn(s0, smpl, inp, inp, *rays, key)
        n1, _, _ = step_fn(s1, smpl, inp, inp, *rays, key)
        err = jax.tree.map(
            lambda orig, a, b: float(
                jnp.abs((b - orig) - 0.5 * (a - orig)).max()
            ),
            s0.params, n0.params, n1.params,
        )
        assert max(jax.tree.leaves(err)) < 1e-7
        assert int(n1.step) == 101

    def test_smooth_step_produces_normal_losses(self, setup):
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8, smooth_loss=True, smooth_interval=1)
        trainer = Trainer(model, cfg, variables)
        logs = trainer.train_item(smpl, inp, inp, jax.random.PRNGKey(0))
        assert logs["smpl_normal_loss"] > 0.0

    def test_hierarchical_step_trains(self, setup):
        """--N_importance > 0 under grad: coarse query -> sample_pdf ->
        union re-query.  The step must run (incl. the smooth double-
        backprop variant), produce finite decreasing loss, and report
        zero overflow on this tiny scene."""
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8, n_importance=4, smooth_loss=True,
                          smooth_interval=4)
        trainer = Trainer(model, cfg, variables)
        key = jax.random.PRNGKey(7)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            logs = trainer.train_item(smpl, inp, inp, sub)
            losses.append(logs["loss"])
            assert logs["n_dropped"] == 0.0
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestShardedStep:
    def test_matches_single_device(self, setup):
        """pmean-sharded gradients == single-device gradients."""
        _, smpl, inp, model, variables = setup
        from mpsnerf_tpu.parallel.mesh import (
            RAY_AXIS, make_mesh, make_sharded_train_step,
            replicate_to_mesh, shard_rays_to_mesh,
        )
        from mpsnerf_tpu.train.trainer import make_train_step

        # perturb=0 so z sampling is deterministic — the local (R/4, S) vs
        # global (R, S) uniform draws would otherwise differ by design
        cfg = TrainConfig(n_samples=8, smooth_loss=False, perturb=0.0)
        mesh = make_mesh(jax.devices()[:4])

        state0 = create_train_state(model, variables, cfg)
        k = 0
        rays = (
            inp["ray_o_all"][k], inp["ray_d_all"][k],
            inp["near_all"][k][:, 0], inp["far_all"][k][:, 0],
            inp["rgb_all"][k], inp["bkgd_msk_all"][k],
        )
        key = jax.random.PRNGKey(7)

        single = jax.jit(make_train_step(model, cfg, smooth=False))
        s1, terms1, _ = single(state0, smpl, inp, inp, *rays, key)

        sharded = make_sharded_train_step(model, cfg, mesh, smooth=False)
        s2, terms2, _ = sharded(
            replicate_to_mesh(state0, mesh),
            replicate_to_mesh(smpl, mesh),
            replicate_to_mesh(inp, mesh),
            replicate_to_mesh(inp, mesh),
            *shard_rays_to_mesh(rays, mesh),
            replicate_to_mesh(key, mesh),
        )
        # same z-sampling key + pmean-of-shard-means == global mean => the
        # updated params must agree across the two paths
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
        )
        assert max(jax.tree.leaves(diffs)) < 2e-4
        # loss reported is the global mean in both cases... up to shard
        # weighting of z-noise: compare losses loosely
        assert np.isfinite(float(terms2.total))

    def test_hierarchical_matches_single_device(self, setup):
        """n_importance > 0 under shard_map: the coarse weights (and so
        the det sample_pdf z union) are per-ray, so sharded == single
        must still hold through the double query + pmean."""
        _, smpl, inp, model, variables = setup
        from mpsnerf_tpu.parallel.mesh import (
            make_mesh, make_sharded_train_step,
            replicate_to_mesh, shard_rays_to_mesh,
        )
        from mpsnerf_tpu.train.trainer import make_train_step

        cfg = TrainConfig(n_samples=8, n_importance=4, smooth_loss=False,
                          perturb=0.0)
        mesh = make_mesh(jax.devices()[:4])
        state0 = create_train_state(model, variables, cfg)
        k = 0
        rays = (
            inp["ray_o_all"][k], inp["ray_d_all"][k],
            inp["near_all"][k][:, 0], inp["far_all"][k][:, 0],
            inp["rgb_all"][k], inp["bkgd_msk_all"][k],
        )
        key = jax.random.PRNGKey(7)
        single = jax.jit(make_train_step(model, cfg, smooth=False))
        s1, _, _ = single(state0, smpl, inp, inp, *rays, key)
        sharded = make_sharded_train_step(model, cfg, mesh, smooth=False)
        s2, terms2, _ = sharded(
            replicate_to_mesh(state0, mesh),
            replicate_to_mesh(smpl, mesh),
            replicate_to_mesh(inp, mesh),
            replicate_to_mesh(inp, mesh),
            *shard_rays_to_mesh(rays, mesh),
            replicate_to_mesh(key, mesh),
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
        )
        assert max(jax.tree.leaves(diffs)) < 2e-4
        assert np.isfinite(float(terms2.total))


class TestCheckpoint:
    def test_save_restore_latest(self, setup, tmp_path):
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8)
        state = create_train_state(model, variables, cfg, step=7)
        save_checkpoint(str(tmp_path), "exp", 7, state)
        save_checkpoint(str(tmp_path), "exp", 12, state.replace(
            step=jnp.asarray(12)))
        step, restored = restore_latest(str(tmp_path), "exp", target=state)
        assert step == 12
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_restore_empty_dir(self, tmp_path):
        step, restored = restore_latest(str(tmp_path), "nope")
        assert step == 0 and restored is None

    def test_rank_gating(self, setup, tmp_path):
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8)
        state = create_train_state(model, variables, cfg)
        out = save_checkpoint(str(tmp_path), "exp", 1, state, is_primary=False)
        assert out is None
        assert not os.path.isdir(os.path.join(str(tmp_path), "exp"))


class TestCompactionOverflowSignal:
    """A train step whose in-body points exceed the compaction capacity
    must be LOUD (VERDICT r4: gradients were silently truncated).

    ``cap_of`` floors the capacity at 1024 slots, so overflow needs >1024
    true in-body points: rays are crafted to pass straight through SMPL
    vertices with a tight near/far, putting ALL 256x8 = 2048 samples
    within the 5 cm body mask against a 1024 capacity."""

    @staticmethod
    def _body_hugging_tp(inp):
        verts = np.asarray(inp["vertices"])
        n_rays = 256
        v = verts[np.resize(np.arange(verts.shape[0]), n_rays)]
        d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n_rays, 1))
        tp = dict(inp)
        tp["ray_o_all"] = jnp.asarray((v - 0.5 * d)[None])
        tp["ray_d_all"] = jnp.asarray(d[None])
        tp["near_all"] = jnp.full((1, n_rays, 1), 0.48, jnp.float32)
        tp["far_all"] = jnp.full((1, n_rays, 1), 0.52, jnp.float32)
        tp["rgb_all"] = jnp.zeros((1, n_rays, 3), jnp.float32)
        tp["bkgd_msk_all"] = jnp.ones((1, n_rays, 1), jnp.float32)
        return tp

    def test_overflow_surfaces_in_logs(self, setup, monkeypatch, capsys):
        _, smpl, inp, _, variables = setup
        # capacity far below the true in-body count -> guaranteed drop
        model = MPSNeRF(num_instances=1, compact_fraction=0.01)
        cfg = TrainConfig(n_samples=8, smooth_loss=False)
        trainer = Trainer(model, cfg, variables)
        tp = self._body_hugging_tp(inp)
        monkeypatch.setenv("MPSNERF_TRAIN_OVERFLOW", "warn")
        logs = trainer.train_item(smpl, inp, tp, jax.random.PRNGKey(1))
        assert logs["n_dropped"] > 0
        assert "compaction overflow" in capsys.readouterr().err

    def test_overflow_raises_when_asked(self, setup, monkeypatch):
        _, smpl, inp, _, variables = setup
        model = MPSNeRF(num_instances=1, compact_fraction=0.01)
        cfg = TrainConfig(n_samples=8, smooth_loss=False)
        trainer = Trainer(model, cfg, variables)
        tp = self._body_hugging_tp(inp)
        monkeypatch.setenv("MPSNERF_TRAIN_OVERFLOW", "raise")
        with pytest.raises(RuntimeError, match="compaction overflow"):
            trainer.train_item(smpl, inp, tp, jax.random.PRNGKey(1))

    def test_healthy_step_reports_zero(self, setup):
        _, smpl, inp, model, variables = setup
        cfg = TrainConfig(n_samples=8, smooth_loss=True, smooth_interval=4)
        trainer = Trainer(model, cfg, variables)
        logs = trainer.train_item(smpl, inp, inp, jax.random.PRNGKey(2))
        assert logs["n_dropped"] == 0

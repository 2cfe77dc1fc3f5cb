"""Item-batched (data, ray)-mesh training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.parallel.mesh import (
    DATA_AXIS, RAY_AXIS, make_2d_mesh, make_batched_train_step,
    replicate_to_mesh,
)
from mpsnerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step, to_device_input,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def _stack(items):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *items)


class TestBatchedStep:
    def test_two_items_match_mean_of_grads(self):
        """2-item batched step == single-device step on the averaged loss
        (same params trajectory as torch DataParallel with mean loss)."""
        ds = SyntheticHumanDataset(
            n_poses=2, n_cameras=4, image_size=64, n_rays=32, n_verts=400,
            num_instances=1,
        )
        smpl = ds.smpl_for(0)
        items = [
            to_device_input(ds.get_item(i, instance_idx=0)) for i in range(2)
        ]
        model = MPSNeRF(num_instances=1)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, items[0], items[0],
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        cfg = TrainConfig(n_samples=8, smooth_loss=False, perturb=0.0)
        state = create_train_state(model, variables, cfg)

        mesh = make_2d_mesh(2, 4)
        fn = make_batched_train_step(model, cfg, mesh, smooth=False)

        k = 0
        keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(7)])
        smpl_b = _stack([jax.tree.map(jnp.asarray, smpl)] * 2)
        sp_b = _stack(items)

        def ray_args(i):
            it = items[i]
            return (
                it["ray_o_all"][k], it["ray_d_all"][k],
                it["near_all"][k][:, 0], it["far_all"][k][:, 0],
                it["rgb_all"][k], it["bkgd_msk_all"][k],
            )

        rays_b = _stack([ray_args(0), ray_args(1)])

        def shard(tree, spec):
            return jax.device_put(tree, NamedSharding(mesh, spec))

        new_state, terms, psnr = fn(
            replicate_to_mesh(state, mesh),
            shard(smpl_b, P(DATA_AXIS)),
            shard(sp_b, P(DATA_AXIS)),
            shard(sp_b, P(DATA_AXIS)),
            *[shard(r, P(DATA_AXIS, RAY_AXIS)) for r in rays_b],
            shard(keys, P(DATA_AXIS)),
        )
        assert int(new_state.step) == 1
        assert np.isfinite(float(terms.total))

        # oracle: mean of per-item losses/grads on one device
        from mpsnerf_tpu.train.trainer import make_loss_fn

        loss_one = make_loss_fn(model, cfg, smooth=False)

        def mean_loss(params):
            tot = 0.0
            for i in range(2):
                t, _ = loss_one(
                    params, state.batch_stats, smpl, items[i], items[i],
                    *ray_args(i), jax.random.PRNGKey(7),
                )
                tot = tot + t
            return tot / 2.0

        from mpsnerf_tpu.train.trainer import adam_apply, make_optimizer

        g = jax.grad(mean_loss)(state.params)
        tx = make_optimizer(cfg)
        ref_params, _ = adam_apply(tx, cfg, state, g)

        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            new_state.params, ref_params,
        )
        assert max(jax.tree.leaves(diffs)) < 3e-4

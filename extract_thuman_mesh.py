#!/usr/bin/env python
"""Density-grid mesh extraction CLI (reference-surface parity).

Usage mirrors the reference: ``python extract_thuman_mesh.py --config
configs/canonical_transformer.txt [--save_weights 0]``; meshes land in
``objs/THuman/<expname>/<human>/...obj`` with cropped input/output view
PNGs.  Add ``--can_flag 1`` for canonical-space extraction.

Behavioral reference: ``/root/reference/extract_thuman_mesh.py``.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from mpsnerf_tpu.config import config_parser, parse_args

    parser = config_parser()
    parser.add_argument("--can_flag", type=int, default=0)
    parser.add_argument("--mesh_N", type=int, default=256)
    parser.add_argument("--mesh_threshold", type=float, default=30.0)
    args = parse_args(argv, parser=parser)

    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.factory import return_dataset, return_model
    from mpsnerf_tpu.geometry import GridSpec, extract_density_mesh
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.smpl.assets import load_smpl_models
    from mpsnerf_tpu.train.checkpoint import restore_latest
    from mpsnerf_tpu.train.trainer import (
        TrainConfig, create_train_state, to_device_input,
    )

    model = return_model(args)
    smpl_models = load_smpl_models()
    dataset = return_dataset(args, split="test")

    item = dataset[0]
    if not args.can_flag:
        from mpsnerf_tpu.data import attach_body_grid

        attach_body_grid(item)  # O(1) cull for the dense grid queries
    inp = to_device_input(item)
    smpl = smpl_models[int(item["gender"])]
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    step, restored = restore_latest(
        args.basedir, args.expname or "exp",
        target=create_train_state(model, variables, TrainConfig()),
    )
    if restored is not None:
        print(f"Loaded checkpoint at step {step}")
        variables = {
            "params": restored.params, "batch_stats": restored.batch_stats,
        }

    out_dir = os.path.join("objs", "THuman", args.expname or "exp")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def density_fn_jit(variables, smpl, sp, tp, latent, pts, mode_flag):
        raw = model.apply(
            variables, smpl, sp, tp, latent, pts, jnp.zeros_like(pts),
            train=False,
            mode="extract_mesh" if bool(args.can_flag) else "full",
            method=MPSNeRF.query,
        )
        return raw.sigma

    latent = jax.jit(
        model.apply, static_argnames=("train", "method")
    )(variables, inp["img_all"], train=False, method="encode")

    chunk = 262144

    def density_fn(pts):
        outs = []
        n = len(pts)
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pts = np.concatenate(
            [pts, np.zeros((n_pad - n, 3), np.float32)]
        )
        for i in range(0, n_pad, chunk):
            outs.append(np.asarray(density_fn_jit(
                variables, smpl, inp, inp, latent,
                jnp.asarray(pts[i:i + chunk]), 0,
            )))
        return np.concatenate(outs)[:n]

    verts_src = np.asarray(item["t_vertices" if args.can_flag else "vertices"])
    if args.can_flag:
        grid = GridSpec.from_vertices(verts_src, n=args.mesh_N)
    else:
        grid = GridSpec.from_vertices(verts_src, n=args.mesh_N)

    name = f"{'canonical' if args.can_flag else 'novel'}_" \
           f"{args.view_num}_view_pose_{int(item['pose_index']):03d}.obj"
    obj_path = os.path.join(out_dir, name)
    verts, tris = extract_density_mesh(
        density_fn, grid, verts_src, np.asarray(smpl.faces),
        threshold=args.mesh_threshold, obj_path=obj_path,
    )
    print(f"done: {len(verts)} verts, {len(tris)} tris -> {obj_path}")


if __name__ == "__main__":
    main()

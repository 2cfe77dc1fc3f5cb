#!/usr/bin/env python
"""Checkpoint -> serving-bundle export CLI.

Closes the deployment loop without any Python: train with
``run_nerf_batch.py``, then

    python -m mpsnerf_tpu.serve.export --config configs/xxx.txt \
        --bundle_dir bundles/actor1 [--shard_devices 8] \
        [--export_platforms tpu,cpu] [--serve_chunk 4096]

loads the experiment's latest checkpoint (same resume semantics as
training) and writes a bundle that ``python -m mpsnerf_tpu.serve.server
--bundle bundles/actor1`` serves with no model code or config.

All standard flags apply (``--config`` file merge, model selection,
``--N_samples``, ``--white_bkgd``); the reference has no equivalent —
its deployment path is re-running the research eval script
(``lib/all_test.py``).
"""

from __future__ import annotations

import os


def main(argv=None):
    from mpsnerf_tpu.config import config_parser, parse_args

    parser = config_parser()
    parser.add_argument(
        "--bundle_dir", type=str, default=None,
        help="output directory (default: <basedir>/<expname>/bundle)",
    )
    parser.add_argument(
        "--serve_chunk", type=int, default=4096,
        help="fixed ray-chunk size of the exported render graph",
    )
    parser.add_argument(
        "--shard_devices", type=int, default=0,
        help="also export the pod-scale graph over this many devices",
    )
    parser.add_argument(
        "--export_platforms", type=str, default=None,
        help="comma-separated lowering targets, e.g. tpu,cpu "
             "(default: current backend only)",
    )
    parser.add_argument(
        "--allow_random_init", type=int, default=0,
        help="export even when no checkpoint exists (smoke tests only)",
    )
    parser.add_argument(
        "--serve_global", type=int, default=1,
        help="also export the globally-compacted view graphs "
             "(human-sample models; the fast serving default)",
    )
    parser.add_argument(
        "--serve_tile", type=int, default=16384,
        help="tail tile of the global render graph",
    )
    parser.add_argument(
        "--serve_headroom", type=float, default=1.5,
        help="capacity headroom over the probed per-view candidate "
             "counts; overflowing requests fall back to the chunked graph",
    )
    parser.add_argument(
        "--serve_mesh_chunk", type=int, default=262144,
        help="point-chunk of the exported mesh occupancy graph "
             "(/mesh route); 0 disables mesh extraction",
    )
    args = parse_args(argv, parser=parser)

    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.factory import return_dataset, return_model
    from mpsnerf_tpu.serve.bundle import export_serving_bundle
    from mpsnerf_tpu.smpl.assets import load_smpl_models
    from mpsnerf_tpu.train.checkpoint import restore_latest
    from mpsnerf_tpu.train.trainer import (
        TrainConfig, create_train_state, to_device_input,
    )
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    model = return_model(args)
    smpl_models = load_smpl_models()
    dataset = return_dataset(args, split="test")

    pair_mode = args.data_set_type in ("H36M_P", "THuman_P")
    first = dataset[0]
    sp_item = first["sp_input"] if pair_mode else first
    tp_item = first["tp_input"] if pair_mode else first

    inp = to_device_input(
        {k: v for k, v in sp_item.items() if not k.startswith("_")}
    )
    smpl = smpl_models[int(sp_item["gender"])]
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(args.seed)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )

    step, restored = restore_latest(
        args.basedir, args.expname or "exp",
        target=create_train_state(model, variables, TrainConfig()),
    )
    if restored is not None:
        print(f"Loaded checkpoint at step {step}")
        variables = {
            "params": restored.params,
            "batch_stats": restored.batch_stats,
        }
    elif not args.allow_random_init:
        raise SystemExit(
            f"no checkpoint under {args.basedir}/{args.expname or 'exp'} "
            "— train first, or pass --allow_random_init 1"
        )
    else:
        print("WARNING: exporting RANDOM-INIT weights "
              "(--allow_random_init 1)")

    out_dir = args.bundle_dir or os.path.join(
        args.basedir, args.expname or "exp", "bundle"
    )
    platforms = (
        tuple(p.strip() for p in args.export_platforms.split(","))
        if args.export_platforms else None
    )
    export_serving_bundle(
        out_dir, model, variables, smpl_models,
        dict(sp_item), dict(tp_item),
        chunk=args.serve_chunk, n_samples=args.N_samples,
        white_bkgd=bool(args.white_bkgd), platforms=platforms,
        shard_devices=args.shard_devices,
        global_compact=bool(args.serve_global),
        serve_tile=args.serve_tile, serve_headroom=args.serve_headroom,
        mesh_chunk=args.serve_mesh_chunk,
    )
    sizes = {
        f: os.path.getsize(os.path.join(out_dir, f))
        for f in sorted(os.listdir(out_dir))
    }
    total = sum(sizes.values())
    print(f"bundle written to {out_dir} ({total/1e6:.1f} MB):")
    for f, s in sizes.items():
        print(f"  {f:24s} {s/1e6:8.2f} MB")


if __name__ == "__main__":
    main()

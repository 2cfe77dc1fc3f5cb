#!/usr/bin/env python
"""Normal-map mesh rendering CLI (reference-surface parity).

Renders every ``.obj`` under ``objs/THuman/<expname>/`` from cameras
4/12/20 (ref render_thuman_mesh.py:163-195) as vertex-normal color maps.

Usage: ``python render_thuman_mesh.py --config ... [--objs_dir ...]``.
"""

from __future__ import annotations

import os

import numpy as np


def _load_obj(path: str):
    verts, tris = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:4]]
                tris.append(idx)
    return np.asarray(verts, np.float32), np.asarray(tris, np.int32)


def main(argv=None):
    from mpsnerf_tpu.config import config_parser, parse_args
    from mpsnerf_tpu.geometry import render_normal_map

    parser = config_parser()
    parser.add_argument("--objs_dir", type=str, default=None)
    parser.add_argument("--cameras", type=int, nargs="*", default=[4, 12, 20])
    args = parse_args(argv, parser=parser)

    objs_dir = args.objs_dir or os.path.join(
        "objs", "THuman", args.expname or "exp"
    )

    ann_path = os.path.join(args.data_root, "annots.npy")
    if os.path.exists(ann_path):
        annots = np.load(ann_path, allow_pickle=True).item()
        cams = annots["cams"]
        Ks = np.array(cams["K"])
        Rs = np.array(cams["R"])
        Ts = np.array(cams["T"]).reshape(len(Ks), 3)
    else:
        # fallback ring cameras (synthetic / no capture data)
        from mpsnerf_tpu.data.synthetic import _ring_camera

        cams = [_ring_camera(2 * np.pi * i / 24, 2.2, 0.1, 512, 512)
                for i in range(24)]
        Ks = np.stack([c[0] for c in cams])
        Rs = np.stack([c[1] for c in cams])
        Ts = np.stack([c[2].reshape(3) for c in cams])

    obj_files = [
        os.path.join(objs_dir, f)
        for f in sorted(os.listdir(objs_dir))
        if f.endswith(".obj")
    ]
    for mesh_path in obj_files:
        print(os.path.basename(mesh_path))
        verts, tris = _load_obj(mesh_path)
        for j, cam_idx in enumerate(args.cameras):
            out = f"{mesh_path[:-4]}_view_{j:03d}_normal.png"
            render_normal_map(
                verts, tris, Ks[cam_idx], Rs[cam_idx], Ts[cam_idx],
                save_path=out,
            )
            print("  ->", out)


if __name__ == "__main__":
    main()

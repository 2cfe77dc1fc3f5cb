"""The THuman/H36M evaluation protocols.

Behavioral reference: ``test_THuman_ssim`` (``lib/all_test.py:54-307``) and
``test_H36M`` (``:310-583``):

  * novel-pose pass: pose 0 of the window is the source (sp_input); poses
    1..P are targets; render the 8 novel views; metrics on mask_at_box
    pixels; PNGs named ``frame{:04d}_view{:04d}[_gt].png``.
  * novel-view pass: source == target pose (poses 0..P-1).
  * ``metrics.json``: {novel_view,novel_pose}_{mean_human,all_human};
    ``metrics.npy``: the full metric dict including per-image arrays of
    shape (humans, poses, views).

The evaluator is dataset-agnostic: anything exposing the sp/tp item schema
works (synthetic stand-in or the real THuman/H36M loaders).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from mpsnerf_tpu.eval.metrics import psnr_metric, ssim_metric

to8b = lambda x: (255 * np.clip(x, 0, 1)).astype(np.uint8)


def _imwrite(path: str, img8: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, img8[..., ::-1] if img8.ndim == 3 else img8)


def _eval_pass(
    render_view: Callable,
    items: List[Dict],
    sp_index: Optional[int],
    novel_views: Sequence[int],
    H: int,
    W: int,
    save_path: str,
    frame_offset: int = 0,
    verbose: bool = True,
    gt_fn: Optional[Callable] = None,
    render_async: Optional[tuple] = None,
):
    """One pass over poses x views.  ``sp_index`` selects a fixed source
    item (novel-pose mode); None means sp == tp (novel-view mode).
    ``gt_fn(item, k) -> (H, W, 3)`` overrides the GT source (H36M uses
    the unmasked original image, all_test.py:402).

    ``render_async=(dispatch, finish)`` enables a 1-deep software
    pipeline: view i+1's device render is dispatched BEFORE view i's
    image is fetched, so the tunnel fetch, SSIM/PSNR, PNG writes, and GT
    loads for view i all run while the device renders view i+1 (the
    sequential loop leaves the device idle for all of that host work).
    Results are identical to the sequential path — only the host-side
    ordering changes.  "Time per image" then reports the pipeline stage
    latency (dispatch-to-finish), i.e. the true per-view throughput.

    Returns (mse, psnr, ssim) lists-of-lists [pose][view]."""
    os.makedirs(save_path, exist_ok=True)
    tp_items = items[1:] if sp_index is not None else items
    sp_item = items[sp_index] if sp_index is not None else None

    if render_async is not None:
        dispatch, finish = render_async
    else:
        dispatch, finish = render_view, lambda x: x

    # size by len(): iterating a lazy DatasetWindow here would construct
    # every full-res item dict a second time
    nv, np_ = len(novel_views), len(tp_items)
    all_mse = [[None] * nv for _ in range(np_)]
    all_psnr = [[None] * nv for _ in range(np_)]
    all_ssim = [[None] * nv for _ in range(np_)]

    def process(entry):
        pi, vi, item, k, t0, handle = entry
        rgb_pred = finish(handle)  # (H*W, 3) in [0,1]
        if verbose:
            print("Time per image: ", time.time() - t0)

        if gt_fn is not None:
            target = np.asarray(gt_fn(item, k)).reshape(H, W, 3)
        else:
            target = np.asarray(item["rgb_all"][k]).reshape(H, W, 3)
        pred = np.asarray(rgb_pred).reshape(H, W, 3)
        mask = np.asarray(item["mask_at_box_all"][k]).reshape(H, W) > 0

        pose_idx = int(item["pose_index"])
        _imwrite(
            os.path.join(
                save_path,
                f"frame{pose_idx + frame_offset:04d}_view{k:04d}_gt.png",
            ),
            to8b(target),
        )
        _imwrite(
            os.path.join(
                save_path,
                f"frame{pose_idx + frame_offset:04d}_view{k:04d}.png",
            ),
            to8b(pred),
        )

        mse = float(np.mean((pred[mask] - target[mask]) ** 2))
        psnr = psnr_metric(pred[mask], target[mask])
        ssim = ssim_metric(pred[mask], target[mask], mask, H, W)
        if verbose:
            print(
                "[Test] pose:", pose_idx, " view:", k,
                " mse:", round(mse, 5), " psnr:", round(psnr, 5),
                " ssim:", round(ssim, 5),
            )
        all_mse[pi][vi] = mse
        all_psnr[pi][vi] = psnr
        all_ssim[pi][vi] = ssim

    # pipeline depth 1 only with a real async pair: in the sequential
    # fallback, deferring process() past the NEXT dispatch (a full
    # synchronous render) would make the verbose per-image time span two
    # renders
    pipelined = render_async is not None
    pending = None
    for pi, item in enumerate(tp_items):
        sp = sp_item if sp_item is not None else item
        for vi, k in enumerate(novel_views):
            t0 = time.time()
            handle = dispatch(sp, item, k)
            if not pipelined:
                process((pi, vi, item, k, t0, handle))
                continue
            if pending is not None:
                process(pending)
            pending = (pi, vi, item, k, t0, handle)
    if pending is not None:
        process(pending)
    return all_mse, all_psnr, all_ssim


def evaluate_novel_view_pose(
    render_view: Callable,
    humans: Dict[str, Dict[str, List[Dict]]],
    novel_views: Sequence[int],
    H: int,
    W: int,
    savedir: str,
    start_poses: Optional[Dict[str, int]] = None,
    verbose: bool = True,
    gt_fn: Optional[Callable] = None,
    render_async: Optional[tuple] = None,
) -> Dict:
    """Run both protocol passes for every human and serialize metrics.

    Args:
      render_view: ``(sp_item, tp_item, view_index) -> (H*W, 3)`` renders
        one full view.
      humans: name -> {"novel_pose": [items], "novel_view": [items]} — the
        reference uses two dataset windows (start_pose vs 0;
        all_test.py:99,205).  For the novel-pose pass the first item is
        the source and the rest are targets; for the novel-view pass every
        item is its own source.
      start_poses: name -> frame offset used only in saved filenames.

    Returns the metric dict (also written to metrics.json/metrics.npy).
    """
    start_poses = start_poses or {}
    metric = {
        "novel_view_mean_human": [], "novel_view_all_human": [],
        "novel_view_mse": [], "novel_view_psnr": [], "novel_view_ssim": [],
        "novel_pose_mean_human": [], "novel_pose_all_human": [],
        "novel_pose_mse": [], "novel_pose_psnr": [], "novel_pose_ssim": [],
        "all_human_names": list(humans.keys()),
    }

    for prefix, sp_mode in (("novel_pose", 0), ("novel_view", None)):
        h_mse, h_psnr, h_ssim = [], [], []
        for name, passes in humans.items():
            items = passes[prefix]
            save_path = os.path.join(savedir, prefix, name)
            mse, psnr, ssim = _eval_pass(
                render_view, items, sp_mode, novel_views, H, W, save_path,
                frame_offset=start_poses.get(name, 0) if sp_mode == 0 else 0,
                verbose=verbose, gt_fn=gt_fn, render_async=render_async,
            )
            h_mse.append(mse)
            h_psnr.append(psnr)
            h_ssim.append(ssim)

        n = len(h_mse)
        metric[f"{prefix}_mse"] = np.array(h_mse)
        metric[f"{prefix}_psnr"] = np.array(h_psnr)
        metric[f"{prefix}_ssim"] = np.array(h_ssim)
        metric[f"{prefix}_mean_human"] = np.array(
            [
                np.mean(metric[f"{prefix}_mse"]),
                np.mean(metric[f"{prefix}_psnr"]),
                np.mean(metric[f"{prefix}_ssim"]),
            ]
        )
        metric[f"{prefix}_all_human"] = np.array(
            [
                np.mean(metric[f"{prefix}_mse"].reshape(n, -1), axis=-1),
                np.mean(metric[f"{prefix}_psnr"].reshape(n, -1), axis=-1),
                np.mean(metric[f"{prefix}_ssim"].reshape(n, -1), axis=-1),
            ]
        )

    os.makedirs(savedir, exist_ok=True)
    with open(os.path.join(savedir, "metrics.json"), "w") as f:
        json.dump(
            {
                "novel_view_mean_human": metric["novel_view_mean_human"].tolist(),
                "novel_pose_mean_human": metric["novel_pose_mean_human"].tolist(),
                "novel_view_all_human": metric["novel_view_all_human"].tolist(),
                "novel_pose_all_human": metric["novel_pose_all_human"].tolist(),
            },
            f,
        )
    np.save(os.path.join(savedir, "metrics.npy"), metric)  # type: ignore
    return metric

"""First-contact validator for real THuman / H36M capture roots.

The loaders (``mpsnerf_tpu/data/{thuman,h36m}.py``) reproduce the
reference's directory layout from code reading alone
(``lib/THuman_dataset.py:279-350``, ``lib/h36m_dataset.py:269-330``); no
real captures exist in the build environment.  This tool de-risks the
first run against real data: it walks a dataset root, checks every layout
and schema assumption the loaders make, and fails loudly with actionable
messages instead of deep inside a training run.

Usage:
  python tools/validate_dataset.py --type thuman <data_root> [--poses N]
  python tools/validate_dataset.py --type h36m   <data_root> [--poses N]

Checks (each prints PASS/FAIL + detail):
  * annots.npy loads as a dict with cams {K, D, R, T} and ims
  * camera array shapes / dtypes; per-pose image lists long enough for
    the 24-view (THuman) / 4-camera (H36M) windows
  * image + mask files exist for the first pose; masks binarize
  * new_vertices/<i>.npy are (6890, 3) float; new_params/<i>.npy carry
    poses(72) shapes(10) R/Rh Th
  * canonical template (X_vertices.npy / 45_big_pose_tvertices.npy)
  * SMPL pickle loading incl. scipy-sparse J_regressor handling
  * ray invariants on one real view: get_near_far mask hits the body,
    near < far everywhere the box is hit

Exit code: 0 all pass, 1 otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np

# `python tools/validate_dataset.py` puts tools/ (not the repo root) on
# sys.path; the mpsnerf_tpu imports below need the root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name):
    def deco(fn):
        def run(*a, **k):
            try:
                detail = fn(*a, **k)
                print(f"  PASS {name}" + (f" — {detail}" if detail else ""))
                return True
            except Exception as e:
                FAILURES.append(name)
                print(f"  FAIL {name}: {type(e).__name__}: {e}")
                if os.environ.get("VALIDATE_TRACE"):
                    traceback.print_exc()
                return False
        return run
    return deco


@check("annots.npy loads and has cams/ims")
def check_annots(root):
    path = os.path.join(root, "annots.npy")
    assert os.path.isfile(path), f"missing {path}"
    annots = np.load(path, allow_pickle=True).item()
    assert isinstance(annots, dict), f"annots is {type(annots)}, not dict"
    assert "cams" in annots and "ims" in annots, sorted(annots.keys())
    return f"{len(annots['ims'])} poses"


def load_annots(root):
    return np.load(
        os.path.join(root, "annots.npy"), allow_pickle=True
    ).item()


@check("camera arrays K/D/R/T shaped (V,3,3)/(V,5|4,..)/(V,3,3)/(V,3,1)")
def check_cams(annots, n_views):
    cams = annots["cams"]
    for key in ("K", "D", "R", "T"):
        assert key in cams, f"cams missing {key!r}: has {sorted(cams)}"
        arr = np.asarray(cams[key][0], np.float64)
        if key in ("K", "R"):
            assert arr.shape == (3, 3), f"cams[{key}][0].shape={arr.shape}"
        if key == "T":
            assert arr.reshape(-1).shape[0] == 3, (
                f"cams[T][0] has {arr.size} elements, expected 3"
            )
    n = len(cams["K"])
    assert n >= n_views, (
        f"{n} cameras < required {n_views} output views"
    )
    return f"{n} cameras"


@check("per-pose image lists cover the output views")
def check_ims(annots, n_views):
    for pi, d in enumerate(annots["ims"][:3]):
        ims = d["ims"] if isinstance(d, dict) else d
        assert len(ims) >= n_views, (
            f"pose {pi} lists {len(ims)} images < {n_views} views"
        )
    return None


@check("first-pose images + masks exist on disk")
def check_files(root, annots, mask_dir, n_views):
    d = annots["ims"][0]
    ims = d["ims"] if isinstance(d, dict) else d
    missing = []
    for rel in list(ims)[:n_views]:
        rel = str(rel).replace("\\", "/")
        img = os.path.join(root, rel)
        msk = os.path.join(root, mask_dir, rel.replace("jpg", "png"))
        msk_alt = os.path.join(root, mask_dir, rel)
        if not os.path.isfile(img):
            missing.append(img)
        if not (os.path.isfile(msk) or os.path.isfile(msk_alt)):
            missing.append(msk)
    assert not missing, f"{len(missing)} missing, first: {missing[0]}"
    return f"checked {min(len(ims), n_views)} views"


@check("mask binarizes to a plausible foreground fraction")
def check_mask_content(root, annots, mask_dir):
    import cv2

    d = annots["ims"][0]
    ims = d["ims"] if isinstance(d, dict) else d
    rel = str(ims[0]).replace("\\", "/")
    for cand in (rel.replace("jpg", "png"), rel):
        path = os.path.join(root, mask_dir, cand)
        if os.path.isfile(path):
            break
    msk = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert msk is not None, f"cv2 cannot read {path}"
    if msk.ndim == 3:
        msk = msk[..., 0]
    frac = float((msk != 0).mean())
    assert 0.001 < frac < 0.9, (
        f"foreground fraction {frac:.4f} implausible (mask level "
        f"conventions drifted? H36M uses values 1/100/200)"
    )
    return f"foreground {frac:.1%}, levels {sorted(np.unique(msk))[:5]}"


@check("new_vertices/<i>.npy is (6890, 3) float")
def check_vertices(root, frame_idx):
    path = os.path.join(root, "new_vertices", f"{frame_idx}.npy")
    assert os.path.isfile(path), f"missing {path}"
    xyz = np.load(path)
    assert xyz.shape == (6890, 3), f"shape {xyz.shape}"
    ext = xyz.max(0) - xyz.min(0)
    assert 0.3 < float(ext.max()) < 3.0, (
        f"bbox extent {ext} not human-scale metres — unit convention "
        f"drift? (H36M torch code divides T by 1000)"
    )
    return f"extent {np.round(ext, 2)} m"


@check("new_params/<i>.npy carries poses/shapes/R|Rh/Th")
def check_params(root, frame_idx, rot_key):
    path = os.path.join(root, "new_params", f"{frame_idx}.npy")
    assert os.path.isfile(path), f"missing {path}"
    params = np.load(path, allow_pickle=True).item()
    assert isinstance(params, dict), type(params)
    for key, size in (("poses", 72), ("shapes", 10), ("Th", 3)):
        assert key in params, f"params missing {key!r}: {sorted(params)}"
        assert np.asarray(params[key]).size == size, (
            f"params[{key}] has {np.asarray(params[key]).size} elements, "
            f"expected {size}"
        )
    assert rot_key in params, (
        f"params missing rotation {rot_key!r}: {sorted(params)}"
    )
    rsize = np.asarray(params[rot_key]).size
    expect = 9 if rot_key == "R" else 3
    assert rsize == expect, f"params[{rot_key}] size {rsize} != {expect}"
    return f"keys {sorted(params)}"


@check("canonical template verts load as (6890, 3)")
def check_template(path):
    assert os.path.isfile(path), f"missing {path}"
    t = np.load(path)
    assert t.shape == (6890, 3), f"shape {t.shape}"
    return path


@check("SMPL pickle loads (scipy-sparse J_regressor handled)")
def check_smpl():
    from mpsnerf_tpu.smpl.assets import load_smpl_models

    smpl = load_smpl_models()[2]  # neutral
    J = np.asarray(smpl.J_regressor)
    assert J.shape == (24, 6890), J.shape
    s = J.sum(axis=1)
    assert np.allclose(s, 1.0, atol=1e-3), (
        f"J_regressor rows sum to {s.min():.3f}..{s.max():.3f}, not 1 — "
        f"sparse-matrix densification bug?"
    )
    return "J_regressor rows normalized"


@check("ray invariants on one real view (get_near_far)")
def check_rays(root, annots, frame_idx, t_divisor):
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far

    xyz = np.load(os.path.join(root, "new_vertices", f"{frame_idx}.npy"))
    bounds = np.stack([xyz.min(0) - 0.05, xyz.max(0) + 0.05]).astype(
        np.float32
    )
    cams = annots["cams"]
    K = np.asarray(cams["K"][0], np.float32)
    R = np.asarray(cams["R"][0], np.float32)
    T = np.asarray(cams["T"][0], np.float32).reshape(3, 1) / t_divisor
    H = W = int(2 * K[1, 2])  # principal point ~ image centre
    ray_o, ray_d = get_rays(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    near, far, hit = get_near_far(bounds, ray_o.copy(), ray_d.copy())
    frac = hit.mean() if hit.dtype == bool else (hit > 0).mean()
    # convention drift (world-to-cam vs cam-to-world, T units) puts the
    # body behind or far outside the frustum -> hit fraction ~ 0
    assert float(frac) > 0.001, (
        f"AABB hit fraction {float(frac):.4f} implausible — camera "
        f"convention (world-to-cam vs cam-to-world, T units) drift?"
    )
    assert np.all(near < far), "near >= far on hit rays"
    return f"hit fraction {float(frac):.1%}"


def first_frame_index(root, annots):
    """The loaders derive the SMPL frame from the image basename
    (thuman.py:234-236); mirror that."""
    d = annots["ims"][0]
    ims = d["ims"] if isinstance(d, dict) else d
    base = os.path.basename(str(ims[0]).replace("\\", "/"))
    try:
        return int(os.path.splitext(base)[0])
    except ValueError:
        return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--type", choices=["thuman", "h36m"], required=True)
    args = ap.parse_args()
    root = args.data_root

    print(f"validating {args.type} root: {root}")
    if not check_annots(root):
        sys.exit(1)
    annots = load_annots(root)

    if args.type == "thuman":
        n_views, mask_dir, rot_key, t_div = 24, "mask_cihp", "R", 1.0
        template = os.path.join(root, "X_vertices.npy")
    else:
        n_views, mask_dir, rot_key, t_div = 4, "mask_cihp", "Rh", 1000.0
        template = os.path.join(root, "45_big_pose_tvertices.npy")

    check_cams(annots, n_views)
    check_ims(annots, n_views)
    check_files(root, annots, mask_dir, n_views)
    check_mask_content(root, annots, mask_dir)
    fi = first_frame_index(root, annots)
    check_vertices(root, fi)
    check_params(root, fi, rot_key)
    check_template(template)
    check_smpl()
    check_rays(root, annots, fi, t_div)

    if FAILURES:
        print(f"\n{len(FAILURES)} check(s) FAILED: {FAILURES}")
        sys.exit(1)
    print("\nall checks passed")


if __name__ == "__main__":
    main()

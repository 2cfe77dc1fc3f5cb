"""tools/validate_dataset.py against a synthetic on-disk THuman layout:
clean layout passes, schema drift fails loudly with an actionable message
(the tool's contract — it is the first-contact instrument for real
captures, which do not exist in this environment)."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

H = W = 64
N_VIEWS = 24


def _camera(i):
    a = 2 * np.pi * i / N_VIEWS
    pos = np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.0])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    T = -R @ pos
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1.0]])
    return K, R, T.reshape(3, 1)


@pytest.fixture(scope="module")
def thuman_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("thuman_val") / "subject_F"
    rng = np.random.default_rng(0)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(N_VIEWS):
        K, R, T = _camera(v)
        cams["K"].append(K)
        cams["D"].append(np.zeros(5))
        cams["R"].append(R)
        cams["T"].append(T)

    ims = []
    paths = []
    for v in range(N_VIEWS):
        rel = os.path.join(f"{v:02d}", "0.jpg")
        paths.append(rel)
        img = np.zeros((H, W, 3), np.uint8)
        img[24:40, 24:40] = rng.integers(64, 255, (16, 16, 3))
        msk = np.zeros((H, W), np.uint8)
        msk[24:40, 24:40] = 255
        ipath = root / rel
        mpath = root / "mask_cihp" / rel.replace("jpg", "png")
        ipath.parent.mkdir(parents=True, exist_ok=True)
        mpath.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ipath), img)
        cv2.imwrite(str(mpath), msk)
    ims.append({"ims": paths})
    np.save(root / "annots.npy", {"cams": cams, "ims": ims})

    (root / "new_vertices").mkdir()
    (root / "new_params").mkdir()
    # human-scale extent (the validator sanity-checks metres)
    verts = (0.25 * rng.standard_normal((6890, 3))).astype(np.float32)
    np.save(root / "new_vertices" / "0.npy", verts)
    np.save(
        root / "new_params" / "0.npy",
        {
            "poses": np.zeros(72, np.float32),
            "shapes": np.zeros(10, np.float32),
            "R": np.eye(3, dtype=np.float32),
            "Th": np.zeros((1, 3), np.float32),
        },
    )
    np.save(root / "X_vertices.npy", verts)
    return str(root)


def _run(root):
    return subprocess.run(
        [sys.executable, "tools/validate_dataset.py", "--type", "thuman",
         root],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_clean_layout_passes(thuman_root):
    r = _run(thuman_root)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all checks passed" in r.stdout


def test_schema_drift_fails_loudly(thuman_root, tmp_path):
    import shutil

    drifted = tmp_path / "drifted"
    shutil.copytree(thuman_root, drifted)
    # drop the rotation key — the exact drift a real capture could carry
    np.save(
        drifted / "new_params" / "0.npy",
        {
            "poses": np.zeros(72, np.float32),
            "shapes": np.zeros(10, np.float32),
            "Th": np.zeros((1, 3), np.float32),
        },
    )
    r = _run(str(drifted))
    assert r.returncode == 1
    assert "missing rotation 'R'" in r.stdout


def test_missing_mask_fails(thuman_root, tmp_path):
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(thuman_root, broken)
    os.remove(broken / "mask_cihp" / "00" / "0.png")
    r = _run(str(broken))
    assert r.returncode == 1
    assert "missing" in r.stdout

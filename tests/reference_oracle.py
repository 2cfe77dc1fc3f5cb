"""Harness for running the reference's own PyTorch code as a numerical
oracle (CPU).  Nothing here is part of the framework — it exists so the
test suite can assert parity against ``/root/reference`` directly, the
strongest available instrument for the PSNR-parity bar while real data and
trained checkpoints are absent.

Two mechanisms:
  * :func:`load_ref_module` — import a reference module (with shims for its
    stale ``numpy.lib.npyio.save`` import and the optional memory_profiler
    dependency).
  * :func:`extract_fn` — pull a single function/method out of a reference
    source file by name and exec it against caller-supplied globals.  Used
    for code that lives in modules with unimportable deps (pytorch3d,
    spconv) or module-level argparse.
"""

from __future__ import annotations

import ast
import importlib
import os
import sys
import textwrap
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "lib"))


def _install_shims() -> None:
    import numpy.lib.npyio as npyio

    if not hasattr(npyio, "save"):
        npyio.save = np.save
    if "memory_profiler" not in sys.modules:
        try:
            import memory_profiler  # noqa: F401
        except ImportError:
            mod = types.ModuleType("memory_profiler")

            def profile(fn=None, **kwargs):
                if callable(fn):
                    return fn
                return lambda g: g

            mod.profile = profile
            sys.modules["memory_profiler"] = mod


def load_ref_module(name: str):
    """Import e.g. ``lib.run_nerf_helpers`` from the reference tree."""
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mod = importlib.import_module(name)
    import torch

    # run_nerf_helpers enables anomaly detection at import time; keep the
    # oracle runs fast
    torch.autograd.set_detect_anomaly(False)
    return mod


def extract_fn(relpath: str, name: str, glb: dict):
    """Extract function/method ``name`` from ``<reference>/<relpath>`` and
    exec its source with ``glb`` as globals.  Returns the function object
    (methods come back as plain functions taking ``self`` first)."""
    path = os.path.join(REFERENCE_ROOT, relpath)
    with open(path) as f:
        src = f.read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            seg = ast.get_source_segment(src, node)
            ns = dict(glb)
            exec(compile(textwrap.dedent(seg), path, "exec"), ns)
            return ns[name]
    raise KeyError(f"{name} not found in {relpath}")


def extract_method(relpath: str, cls_name: str, name: str, glb: dict):
    """Like :func:`extract_fn` but scoped to ``class cls_name`` — needed
    when several classes in the file define a method of the same name
    (e.g. ``forward``)."""
    path = os.path.join(REFERENCE_ROOT, relpath)
    with open(path) as f:
        src = f.read()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.ClassDef) and node.name == cls_name:
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == name:
                    seg = ast.get_source_segment(src, sub)
                    ns = dict(glb)
                    exec(compile(textwrap.dedent(seg), path, "exec"), ns)
                    return ns[name]
    raise KeyError(f"{cls_name}.{name} not found in {relpath}")


def patch_cuda_to_cpu(monkeypatch) -> None:
    """Reference code calls ``.cuda()`` unconditionally; run it on CPU."""
    import torch

    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False
    )


def knn_points_exact(query, points, K=1):
    """Drop-in for ``pytorch3d.ops.knn.knn_points`` (1-batch, K=1): exact
    nearest neighbour by brute-force distances."""
    import torch

    assert K == 1 and query.shape[0] == 1 and points.shape[0] == 1
    d = torch.cdist(query[0], points[0])  # (N, V)
    dists, idx = d.min(dim=1)
    return dists[None, :, None] ** 2, idx[None, :, None], None

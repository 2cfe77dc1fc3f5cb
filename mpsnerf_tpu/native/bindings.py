"""ctypes bindings for the native geometry kernels (native/mesh_native.cpp).

The shared library is compiled on first use (g++, ~2s) and cached next to
the source.  Replaces PyMCubes (``extract_thuman_mesh.py:9,164``) and the
pytorch3d/pyrender rasterization stack (``lib/mesh_animation_renderer.py``,
``render_thuman_mesh.py``) — see the .cpp header for semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "mesh_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libmeshnative.so")

_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", _SRC, "-o", _LIB],
                check=True,
            )
        lib = ctypes.CDLL(_LIB)

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        iso_argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            f32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.extract_isosurface.restype = ctypes.c_int
        lib.extract_isosurface.argtypes = iso_argtypes
        lib.extract_isosurface_mc.restype = ctypes.c_int
        lib.extract_isosurface_mc.argtypes = iso_argtypes
        lib.rasterize_mesh.restype = None
        lib.rasterize_mesh.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32p, f32p, f32p,
        ]
        _lib = lib
        return lib


def extract_isosurface(
    grid: np.ndarray, iso: float, max_verts: int = 4_000_000,
    max_tris: int = 8_000_000, method: str = "mc",
) -> Tuple[np.ndarray, np.ndarray]:
    """Iso-surface of ``grid`` (nx, ny, nz) at threshold ``iso``.

    ``method="mc"`` (default) is classic marching-cubes topology — the
    exact PyMCubes vertex set (one linearly-interpolated vertex per
    sign-crossing cell edge), matching ``mcubes.marching_cubes`` at
    ``extract_thuman_mesh.py:164``.  ``method="tet"`` is the marching-
    tetrahedra fallback (same surface, denser triangulation).

    Returns ``(verts (V, 3) in grid-index coordinates, tris (T, 3))``.
    """
    lib = _load()
    fn = {"mc": lib.extract_isosurface_mc, "tet": lib.extract_isosurface}[
        method
    ]
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    verts = np.empty((max_verts, 3), np.float32)
    tris = np.empty((max_tris, 3), np.int32)
    nv = ctypes.c_int(0)
    nt = ctypes.c_int(0)
    rc = fn(
        grid, nx, ny, nz, iso, verts, max_verts, tris, max_tris,
        ctypes.byref(nv), ctypes.byref(nt),
    )
    if rc != 0:
        raise RuntimeError("isosurface extraction overflowed buffers")
    return verts[: nv.value].copy(), tris[: nt.value].copy()


def rasterize_mesh(
    verts_screen: np.ndarray, tris: np.ndarray, height: int, width: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Z-buffer rasterization.

    verts_screen: (V, 3) = (x_pix, y_pix, depth>0); tris: (T, 3).
    Returns ``(pix_to_face (H, W) int32 [-1 = miss],
    barycentric (H, W, 3), zbuf (H, W))`` with perspective-correct
    barycentrics — the pytorch3d ``rasterize_meshes`` information content.
    """
    lib = _load()
    verts_screen = np.ascontiguousarray(verts_screen, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    p2f = np.empty(height * width, np.int32)
    bary = np.empty(height * width * 3, np.float32)
    zbuf = np.empty(height * width, np.float32)
    lib.rasterize_mesh(
        verts_screen, len(verts_screen), tris, len(tris), height, width,
        p2f, bary, zbuf,
    )
    return (
        p2f.reshape(height, width),
        bary.reshape(height, width, 3),
        zbuf.reshape(height, width),
    )


def export_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Minimal OBJ writer (PyMCubes ``export_obj`` role)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")

"""Minimal production HTTP front-end for a serving bundle (stdlib only).

Wire protocol (binary, numpy-native — no JSON round-trip for tensors):

    GET  /healthz          -> {"status": "ok", "backend": ..., ...}
    GET  /manifest         -> the bundle's manifest.json
    POST /render?view=K    -> body: one ``.npz`` whose keys are
                              ``sp.<key>`` / ``tp.<key>`` item arrays
                              (nested dicts dotted: ``tp.params.poses``);
                              response: ``.npy`` bytes of the rendered
                              (H*W, 3) float32 view K.
                              Optional key ``ray_mask`` restricts
                              rendering to masked rays (H36M masked-ray
                              semantics).  ``&sharded=1`` renders on the
                              pod-scale graph (bundle must have been
                              exported with ``shard_devices``).
                              ``&global=0`` forces the chunked graph off
                              the default globally-compacted fast path
                              (bundles of human-sample models).
    POST /camera?h=H&w=W   -> same body plus ``camera.K``, ``camera.R``,
                              ``camera.T`` arrays: renders that ARBITRARY
                              pinhole camera (novel viewpoint — no
                              precomputed rays needed); ``.npy`` (H*W, 3).
    POST /spiral?frames=N  -> free-viewpoint video: N spiral cameras
                              around the subject; ``.npy`` (N, H, W, 3).
                              Optional ``&h=``/``&w=`` override the
                              bundle's native resolution;
                              ``&format=video&fps=3`` returns an encoded
                              MJPG ``.avi`` instead of raw frames (the
                              reference's images_to_video workflow,
                              lib/run_nerf_helpers.py:32-40).
    POST /mesh?n=256       -> mesh the subject in the tp pose (density
                              grid + SMPL carve + native marching
                              cubes); response ``.npz`` with ``verts``
                              (V, 3) world float32 and ``tris`` (T, 3).
                              ``&threshold=`` overrides the iso level.
    POST /animate?view=K   -> mesh-anchored fast animation of the tp
                              pose (bake + LBS + rasterize + M-sample
                              composite); ``.npy`` (H, W, 3).  Optional
                              body keys ``mesh.verts``/``mesh.tris``
                              supply a previously extracted canonical
                              mesh; ``&fast=1`` skips the ray sampling
                              (direct baked-rgb interpolation).

Device work is single-flighted inside :class:`ServedRenderer`; the
threaded server keeps request parsing and response IO off the render
path.  Run stand-alone::

    python -m mpsnerf_tpu.serve.server --bundle /path/to/bundle --port 8080
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from mpsnerf_tpu.serve.bundle import ServedRenderer, load_serving_bundle

__all__ = ["items_to_npz_bytes", "npz_bytes_to_items", "BundleServer"]


def items_to_npz_bytes(sp_item: Dict, tp_item: Dict,
                       ray_mask: Optional[np.ndarray] = None,
                       camera: Optional[Dict] = None,
                       mesh: Optional[Dict] = None) -> bytes:
    """Client-side encoder: two item dicts -> one ``.npz`` request body.

    ``camera`` is a {"K", "R", "T"} dict for the ``/camera`` route;
    ``mesh`` a {"verts", "tris"} dict giving ``/animate`` a previously
    extracted canonical mesh (skips the server-side extraction)."""
    flat = {}
    if camera:
        for k, v in camera.items():
            flat[f"camera.{k}"] = np.asarray(v)
    if mesh:
        for k, v in mesh.items():
            flat[f"mesh.{k}"] = np.asarray(v)
    for side, item in (("sp", sp_item), ("tp", tp_item)):
        for k, v in item.items():
            if k.startswith("_"):
                continue  # caches never cross the wire
            if isinstance(v, dict):
                for kk, vv in v.items():
                    flat[f"{side}.{k}.{kk}"] = np.asarray(vv)
            elif isinstance(v, tuple) and hasattr(v, "_fields"):
                continue  # attachments (plans/grids) are rebuilt server-side
            else:
                flat[f"{side}.{k}"] = np.asarray(v)
    if ray_mask is not None:
        flat["ray_mask"] = np.asarray(ray_mask)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


def npz_bytes_to_items(
    body: bytes,
) -> Tuple[Dict, Dict, Optional[np.ndarray], Dict[str, np.ndarray],
           Dict[str, np.ndarray]]:
    """Server-side decoder: request body ->
    (sp_item, tp_item, ray_mask, camera, mesh)."""
    items: Dict[str, Dict] = {"sp": {}, "tp": {}, "camera": {},
                              "mesh": {}}
    ray_mask = None
    with np.load(io.BytesIO(body)) as z:
        for key in z.files:
            if key == "ray_mask":
                ray_mask = z[key]
                continue
            parts = key.split(".", 2)
            if len(parts) < 2 or parts[0] not in items:
                raise ValueError(f"bad request key {key!r}")
            side, name = parts[0], parts[1]
            if len(parts) == 3:
                items[side].setdefault(name, {})[parts[2]] = z[key]
            else:
                items[side][name] = z[key]
    return (items["sp"], items["tp"], ray_mask, items["camera"],
            items["mesh"])


class BundleServer:
    """Threaded HTTP server wrapping one or many loaded bundles.

    A dict maps actor names to bundles: the roster is listed at
    ``GET /actors`` and every POST route gains an
    ``/actors/<name>/...`` form.  With a single bundle the unprefixed
    routes keep working (and also serve the one actor's name)."""

    def __init__(self,
                 bundle: "ServedRenderer | str | Dict[str, object]",
                 host: str = "127.0.0.1",
                 port: int = 0, warmup: bool = False):
        def _load(b):
            return (b if isinstance(b, ServedRenderer)
                    else load_serving_bundle(b))

        if isinstance(bundle, dict):
            self.renderers = {k: _load(v) for k, v in bundle.items()}
        else:
            self.renderers = {"default": _load(bundle)}
        # legacy single-bundle attribute (probes/tests use it); also the
        # target of the unprefixed routes when there is exactly one
        self.renderer = (
            next(iter(self.renderers.values()))
            if len(self.renderers) == 1 else None
        )
        if warmup:
            for name, r in self.renderers.items():
                warmed = r.warmup()
                print(f"warmed {name}: {', '.join(warmed)}")
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet by default; errors still surface as HTTP statuses
            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode(),
                           "application/json")

            def _resolve(self, path):
                """path -> (renderer, route) honoring /actors/<name>/
                prefixes; raises KeyError with a useful message."""
                if path.startswith("/actors/"):
                    rest = path[len("/actors/"):]
                    name, _, route = rest.partition("/")
                    if name not in outer.renderers:
                        raise KeyError(
                            f"unknown actor {name!r} "
                            f"(have {sorted(outer.renderers)})"
                        )
                    return outer.renderers[name], "/" + route
                if outer.renderer is None:
                    raise KeyError(
                        "multi-actor server: use /actors/<name>"
                        f"{path} (have {sorted(outer.renderers)})"
                    )
                return outer.renderer, path

            def do_GET(self):  # noqa: N802
                path = urlparse(self.path).path
                if path == "/healthz":
                    import jax

                    self._json(200, {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "actors": {
                            name: {
                                "model_class": r.manifest["model_class"],
                                "chunk": r.chunk,
                                "overflow_chunks": r.n_overflow_chunks,
                                "global_fallbacks": r.n_global_fallbacks,
                                "item_cache_hits": r.n_cache_hits,
                                "has_global": r.manifest.get(
                                    "has_global", False),
                            }
                            for name, r in outer.renderers.items()
                        },
                        # legacy single-bundle fields
                        **({
                            "model_class":
                                outer.renderer.manifest["model_class"],
                            "chunk": outer.renderer.chunk,
                            "overflow_chunks":
                                outer.renderer.n_overflow_chunks,
                            "global_fallbacks":
                                outer.renderer.n_global_fallbacks,
                            "item_cache_hits":
                                outer.renderer.n_cache_hits,
                            "has_global": outer.renderer.manifest.get(
                                "has_global", False),
                        } if outer.renderer is not None else {}),
                    })
                elif path == "/actors":
                    self._json(200, {
                        name: r.manifest["model_class"]
                        for name, r in outer.renderers.items()
                    })
                else:
                    try:
                        r, route = self._resolve(path)
                    except KeyError as e:
                        self._json(404, {"error": str(e)})
                        return
                    if route == "/manifest":
                        self._json(200, r.manifest)
                    else:
                        self._json(404, {"error": f"no route {path!r}"})

            def do_POST(self):  # noqa: N802
                url = urlparse(self.path)
                try:
                    r, route = self._resolve(url.path)
                except KeyError as e:
                    self._json(404, {"error": str(e)})
                    return
                if route not in ("/render", "/camera", "/spiral",
                                 "/mesh", "/animate"):
                    self._json(404, {"error": f"no route {url.path!r}"})
                    return
                try:
                    q = parse_qs(url.query)
                    sharded = bool(int(q.get("sharded", ["0"])[0]))
                    use_global = (
                        bool(int(q["global"][0])) if "global" in q
                        else None
                    )
                    length = int(self.headers.get("Content-Length", "0"))
                    sp, tp, mask, cam, mesh = npz_bytes_to_items(
                        self.rfile.read(length)
                    )
                    if route == "/render":
                        view = int(q.get("view", ["0"])[0])
                        out = r.render_view(sp, tp, view, mask,
                                            sharded=sharded,
                                            use_global=use_global)
                    elif route == "/camera":
                        native = r.manifest["image_shape"][-2:]
                        h = int(q.get("h", [native[0]])[0])
                        w = int(q.get("w", [native[1]])[0])
                        out = r.render_camera(
                            sp, tp, cam["K"], cam["R"], cam["T"], h, w,
                            sharded=sharded, use_global=use_global,
                        )
                    elif route == "/animate":
                        native = r.manifest["image_shape"][-2:]
                        out = r.animate(
                            sp, tp,
                            view_index=int(q.get("view", ["0"])[0]),
                            height=int(q.get("h", [native[0]])[0]),
                            width=int(q.get("w", [native[1]])[0]),
                            can_verts=mesh.get("verts"),
                            tris=mesh.get("tris"),
                            mesh_n=int(q.get("n", ["128"])[0]),
                            fast=bool(int(q.get("fast", ["0"])[0])),
                        )
                    elif route == "/mesh":
                        verts, tris = r.extract_mesh(
                            sp, tp,
                            n=int(q.get("n", ["256"])[0]),
                            threshold=float(
                                q.get("threshold", ["30.0"])[0]
                            ),
                        )
                        buf = io.BytesIO()
                        np.savez(buf, verts=verts, tris=tris)
                        self._send(200, buf.getvalue(),
                                   "application/octet-stream")
                        return
                    else:  # /spiral
                        frames = int(q.get("frames", ["40"])[0])
                        hw = None
                        if "h" in q or "w" in q:
                            native = r.manifest["image_shape"][-2:]
                            hw = (int(q.get("h", [native[0]])[0]),
                                  int(q.get("w", [native[1]])[0]))
                        out = r.render_spiral(sp, tp, n_frames=frames,
                                              hw=hw, sharded=sharded,
                                              use_global=use_global)
                        if q.get("format", ["npy"])[0] == "video":
                            from mpsnerf_tpu.eval.video import (
                                frames_to_video_bytes,
                            )

                            body = frames_to_video_bytes(
                                out, fps=int(q.get("fps", ["3"])[0])
                            )
                            self._send(200, body, "video/x-msvideo")
                            return
                except (ValueError, KeyError, IndexError) as e:
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                buf = io.BytesIO()
                np.save(buf, out)
                self._send(200, buf.getvalue(), "application/octet-stream")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> "BundleServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


def main(argv=None) -> None:
    import argparse

    import os

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--bundle", required=True, action="append",
                   help="bundle directory, optionally 'name=dir'; repeat "
                        "for a multi-actor roster (/actors/<name>/...)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--warmup", action="store_true",
                   help="compile the serving graphs before accepting "
                        "requests (first-request latency -> steady state)")
    args = p.parse_args(argv)
    if len(args.bundle) == 1 and "=" not in args.bundle[0]:
        bundles = args.bundle[0]
    else:
        bundles = {}
        for spec in args.bundle:
            name, eq, path = spec.partition("=")
            if not eq:
                name, path = (
                    os.path.basename(os.path.normpath(spec)), spec
                )
            if name in bundles:
                raise SystemExit(
                    f"duplicate actor name {name!r} "
                    f"({bundles[name]!r} vs {path!r}) — "
                    "disambiguate with 'name=dir'"
                )
            bundles[name] = path
    srv = BundleServer(bundles, args.host, args.port, warmup=args.warmup)
    print(f"serving {args.bundle} on {srv.address[0]}:{srv.address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()

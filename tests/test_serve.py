"""Serving bundles: export → load parity with the eval renderer, schema
validation, and the HTTP wire protocol end-to-end.

The bundle must reproduce the chunked eval path exactly
(``eval/runner.py:662-715``): a served deployment is a drop-in for the
research eval, which is the property the reference's users lose when
they move off the ``all_test.py`` script."""

import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.eval.runner import ViewRenderer
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.serve import export_serving_bundle, load_serving_bundle
from mpsnerf_tpu.serve.server import (
    BundleServer, items_to_npz_bytes, npz_bytes_to_items,
)
from mpsnerf_tpu.train.trainer import to_device_input

CHUNK = 512
N_SAMPLES = 8


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticHumanDataset(
        n_poses=2, n_cameras=4, image_size=64, n_rays=32, n_verts=500,
        num_instances=1, split="test",
    )
    items = [ds.get_item(i, instance_idx=0) for i in range(2)]
    smpl = ds.smpl_for(0)
    inp = to_device_input(items[0])
    model = MPSNeRF(num_instances=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    return ds, items, smpl, model, variables


@pytest.fixture(scope="module")
def bundle(setup, tmp_path_factory):
    ds, items, smpl, model, variables = setup
    out = str(tmp_path_factory.mktemp("bundle"))
    gender = int(np.asarray(items[0]["gender"]))
    export_serving_bundle(
        out, model, variables, {gender: smpl},
        dict(items[0]), dict(items[0]),
        chunk=CHUNK, n_samples=N_SAMPLES,
        mesh_chunk=32768,  # test-scale grids; default is 262144
    )
    return out


class TestBundle:
    def test_round_trip_matches_eval_renderer(self, setup, bundle):
        """Exported+reloaded render == the live chunked eval render."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        live = ViewRenderer(
            model, lambda g: smpl, chunk=CHUNK, n_samples=N_SAMPLES,
            shuffle_rays=False, global_compact=False,
        )
        for k in (0, 1):
            a = served.render_view(dict(items[0]), dict(items[0]), k)
            b = live.render_view(variables, items[0], items[0], k)
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_novel_pose_item(self, setup, bundle):
        """A second pose (fresh tp geometry) through the same bundle."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        live = ViewRenderer(
            model, lambda g: smpl, chunk=CHUNK, n_samples=N_SAMPLES,
            shuffle_rays=False, global_compact=False,
        )
        a = served.render_view(dict(items[0]), dict(items[1]), 1)
        b = live.render_view(variables, items[0], items[1], 1)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_masked_rays(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        k = 1
        mask = np.asarray(items[0]["mask_at_box_all"][k]).reshape(-1)
        out = served.render_view(dict(items[0]), dict(items[0]), k,
                                 ray_mask=mask)
        full = served.render_view(dict(items[0]), dict(items[0]), k)
        assert (out[~mask] == 0).all()
        np.testing.assert_allclose(out[mask], full[mask], atol=1e-6)

    def test_schema_validation(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        bad = dict(items[0])
        del bad["vertices"]
        with pytest.raises(ValueError, match="missing keys.*vertices"):
            served.render_view(dict(items[0]), bad, 0)
        bad = dict(items[0])
        bad["vertices"] = np.zeros((7, 3), np.float32)
        with pytest.raises(ValueError, match="shape"):
            served.render_view(dict(items[0]), bad, 0)

    def test_cross_platform_export(self, setup, tmp_path_factory):
        """One bundle lowered for BOTH tpu and cpu: exports from the CPU
        test host (tracing the portable XLA 1-NN path) and still loads
        and renders here."""
        ds, items, smpl, model, variables = setup
        out = str(tmp_path_factory.mktemp("xplat"))
        gender = int(np.asarray(items[0]["gender"]))
        export_serving_bundle(
            out, model, variables, {gender: smpl},
            dict(items[0]), dict(items[0]),
            chunk=CHUNK, n_samples=N_SAMPLES, platforms=("tpu", "cpu"),
            mesh_chunk=0,
        )
        served = load_serving_bundle(out)
        assert served.manifest["platforms"] == ["tpu", "cpu"]
        assert served.manifest["exported_backend"] == "cpu"
        rgb = served.render_view(dict(items[0]), dict(items[0]), 0)
        assert rgb.shape[1] == 3 and np.isfinite(rgb).all()

    def test_manifest_contents(self, bundle):
        served = load_serving_bundle(bundle)
        m = served.manifest
        assert m["chunk"] == CHUNK and m["n_samples"] == N_SAMPLES
        assert m["model_class"] == "MPSNeRF"
        assert "body_grid" in m["attached_tp"]
        assert "vertices" in m["tp_schema"]


class TestSharded:
    """Pod-scale serving: the exported ray-sharded graph re-binds to the
    local device mesh and matches the single-device chunk loop."""

    @pytest.fixture(scope="class")
    def sharded_bundle(self, setup, tmp_path_factory):
        ds, items, smpl, model, variables = setup
        out = str(tmp_path_factory.mktemp("sharded_bundle"))
        gender = int(np.asarray(items[0]["gender"]))
        export_serving_bundle(
            out, model, variables, {gender: smpl},
            dict(items[0]), dict(items[0]),
            chunk=CHUNK, n_samples=N_SAMPLES,
            shard_devices=4, shard_rays_per_device=256, mesh_chunk=0,
        )
        return out

    def test_sharded_matches_chunked(self, setup, sharded_bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(sharded_bundle)
        assert served.manifest["shard_devices"] == 4
        assert served.manifest["shard_rays"] == 1024
        a = served.render_view(dict(items[0]), dict(items[0]), 1,
                               sharded=True)
        b = served.render_view(dict(items[0]), dict(items[0]), 1)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_unsharded_bundle_rejects_sharded_request(self, bundle):
        served = load_serving_bundle(bundle)
        with pytest.raises(ValueError, match="without shard_devices"):
            served._sharded_fn()


class TestExportCLI:
    def test_checkpoint_to_bundle_cli(self, tmp_path):
        """The full deployment loop from the standard config surface:
        config -> (checkpoint|random-init) -> bundle -> load -> render."""
        from mpsnerf_tpu.factory import return_dataset
        from mpsnerf_tpu.config import parse_args
        from mpsnerf_tpu.serve.export import main as export_main

        out = str(tmp_path / "bundle")
        export_main([
            "--config", "configs/synthetic_smoke.txt",
            "--bundle_dir", out, "--allow_random_init", "1",
            "--serve_chunk", "512",
        ])
        served = load_serving_bundle(out)
        assert served.manifest["n_samples"] == 12  # from the config file
        args = parse_args(["--config", "configs/synthetic_smoke.txt"])
        ds = return_dataset(args, split="test")
        item = ds[0]
        rgb = served.render_view(dict(item), dict(item), 0)
        assert rgb.shape[1] == 3 and np.isfinite(rgb).all()


class TestWireProtocol:
    def test_npz_round_trip(self, setup):
        ds, items, smpl, model, variables = setup
        body = items_to_npz_bytes(items[0], items[1])
        sp, tp, mask, cam, mesh = npz_bytes_to_items(body)
        assert mask is None and cam == {} and mesh == {}
        np.testing.assert_array_equal(sp["vertices"],
                                      np.asarray(items[0]["vertices"]))
        np.testing.assert_array_equal(
            tp["params"]["poses"], np.asarray(items[1]["params"]["poses"])
        )

    def test_http_end_to_end(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        srv = BundleServer(served).start()
        try:
            host, port = srv.address
            base = f"http://{host}:{port}"

            with urllib.request.urlopen(f"{base}/healthz") as r:
                assert b'"status": "ok"' in r.read()
            with urllib.request.urlopen(f"{base}/manifest") as r:
                assert b'"chunk"' in r.read()

            body = items_to_npz_bytes(items[0], items[0])
            req = urllib.request.Request(
                f"{base}/render?view=1", data=body, method="POST"
            )
            with urllib.request.urlopen(req) as r:
                import io

                rgb = np.load(io.BytesIO(r.read()))
            direct = served.render_view(dict(items[0]), dict(items[0]), 1)
            np.testing.assert_allclose(rgb, direct, atol=1e-6)
        finally:
            srv.stop()

    def test_camera_matches_view(self, setup, bundle):
        """Rendering an item's OWN camera through the novel-camera
        primitive reproduces render_view exactly (ray + near/far
        construction mirrors the dataset recipe)."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        k = 1
        item = dict(items[0])
        H = W = 64
        a = served.render_camera(
            item, item, np.asarray(item["K_all"])[k],
            np.asarray(item["R_all"])[k],
            np.asarray(item["T_all"])[k], H, W,
        )
        b = served.render_view(item, item, k)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_spiral_over_http(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(items[0], items[0])
            req = urllib.request.Request(
                f"http://{host}:{port}/spiral?frames=2&h=32&w=32",
                data=body, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                import io

                frames = np.load(io.BytesIO(r.read()))
            assert frames.shape == (2, 32, 32, 3)
            assert np.isfinite(frames).all()
        finally:
            srv.stop()

    def test_http_bad_request(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            sp = dict(items[0])
            del sp["vertices"]
            body = items_to_npz_bytes(items[0], sp)  # tp missing a key
            req = urllib.request.Request(
                f"http://{host}:{port}/render?view=0", data=body,
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
        finally:
            srv.stop()


class TestGlobalServe:
    """The globally-compacted serving path (plan_global/fine_global/
    render_global graphs): the eval protocol's fast renderer
    (``renderer/render.py:render_rays_compact``) exported AOT.  Pixel-
    exact vs the chunked graph; static-capacity overflow falls back to
    the chunked graph instead of dropping samples."""

    def test_manifest_and_exact_parity(self, setup, bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        m = served.manifest
        assert m["has_global"] and m["global"]["serve_rays"] == 4096
        assert m["global"]["capacity"] % m["global"]["tile"] == 0
        a = served.render_view(dict(items[0]), dict(items[0]), 1)
        b = served.render_view(dict(items[0]), dict(items[0]), 1,
                               use_global=False)
        np.testing.assert_array_equal(a, b)
        assert served.n_global_fallbacks == 0

    def test_novel_pose_through_global(self, setup, bundle):
        """A fresh tp geometry re-runs the plan pre-pass per request."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        a = served.render_view(dict(items[0]), dict(items[1]), 0)
        b = served.render_view(dict(items[0]), dict(items[1]), 0,
                               use_global=False)
        np.testing.assert_array_equal(a, b)

    @pytest.fixture(scope="class")
    def tight_bundle(self, setup, tmp_path_factory):
        """Capacities probed with ~no headroom: every real view
        overflows the static buckets."""
        ds, items, smpl, model, variables = setup
        out = str(tmp_path_factory.mktemp("tight"))
        gender = int(np.asarray(items[0]["gender"]))
        export_serving_bundle(
            out, model, variables, {gender: smpl},
            dict(items[0]), dict(items[0]),
            # chunk 768 does NOT divide serve_rays=4096: the overflow
            # fallback's chunk loop pads past the block and must slice
            chunk=768, n_samples=N_SAMPLES,
            serve_tile=512, serve_headroom=0.05, mesh_chunk=0,
        )
        return out

    def test_overflow_falls_back_exactly(self, setup, tight_bundle):
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(tight_bundle)
        assert served.manifest["global"]["capacity"] == 512
        assert served.serve_rays % served.chunk != 0  # the hard case
        a = served.render_view(dict(items[0]), dict(items[0]), 1)
        assert served.n_global_fallbacks >= 1
        b = served.render_view(dict(items[0]), dict(items[0]), 1,
                               use_global=False)
        np.testing.assert_array_equal(a, b)

    def test_global_compact_off_export(self, setup, tmp_path_factory):
        """global_compact=False skips the three extra graphs and the
        loaded bundle serves through the chunked path."""
        import os

        ds, items, smpl, model, variables = setup
        out = str(tmp_path_factory.mktemp("noglobal"))
        gender = int(np.asarray(items[0]["gender"]))
        export_serving_bundle(
            out, model, variables, {gender: smpl},
            dict(items[0]), dict(items[0]),
            chunk=CHUNK, n_samples=N_SAMPLES, global_compact=False,
            mesh_chunk=0,
        )
        assert not os.path.exists(out + "/render_global.bin")
        served = load_serving_bundle(out)
        assert not served.manifest["has_global"]
        rgb = served.render_view(dict(items[0]), dict(items[0]), 0)
        assert rgb.shape[1] == 3 and np.isfinite(rgb).all()

    def test_http_global_param(self, setup, bundle):
        """&global=0 forces the chunked graph; output is identical."""
        import io

        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(items[0], items[0])

            def post(url):
                req = urllib.request.Request(url, data=body,
                                             method="POST")
                with urllib.request.urlopen(req) as r:
                    return np.load(io.BytesIO(r.read()))

            a = post(f"http://{host}:{port}/render?view=0")
            b = post(f"http://{host}:{port}/render?view=0&global=0")
            np.testing.assert_array_equal(a, b)
            with urllib.request.urlopen(
                f"http://{host}:{port}/healthz"
            ) as r:
                health = r.read()
            assert b'"has_global": true' in health
        finally:
            srv.stop()


class TestMeshServe:
    """Mesh extraction from a served bundle (/mesh): the exported
    density+carve graph + host marching cubes reproduces the live
    ``geometry/extract.py`` pipeline with no model code server-side."""

    def test_mesh_matches_live_pipeline(self, setup, bundle):
        from mpsnerf_tpu.data import attach_body_grid
        from mpsnerf_tpu.geometry import GridSpec, extract_density_mesh

        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        assert served.manifest["has_mesh"]
        item = dict(items[0])
        sv, st = served.extract_mesh(dict(item), dict(item), n=24)
        assert len(sv) > 0  # interior fill guarantees a closed surface
        assert st.min() >= 0 and st.max() < len(sv)

        # live reference: same grid through the in-process pipeline
        attach_body_grid(item)
        inp = to_device_input(
            {k: v for k, v in item.items() if not k.startswith("_")}
        )
        latent = model.apply(variables, inp["img_all"], train=False,
                             method="encode")
        model_nc = (model.clone(compact_fraction=None)
                    if model.compact_fraction is not None else model)

        @jax.jit
        def dens(pts):
            raw = model_nc.apply(
                variables, smpl, inp, inp, latent, pts,
                jnp.zeros_like(pts), train=False, mode="full",
                method="query",
            )
            return raw.sigma

        grid = GridSpec.from_vertices(
            np.asarray(item["vertices"], np.float32), n=24
        )
        lv, lt = extract_density_mesh(
            dens, grid, np.asarray(item["vertices"]),
            np.asarray(smpl.faces),
        )
        assert st.shape == lt.shape
        np.testing.assert_array_equal(st, lt)
        np.testing.assert_allclose(sv, lv, atol=1e-4)

    def test_mesh_over_http(self, setup, bundle):
        import io

        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(items[0], items[0])
            req = urllib.request.Request(
                f"http://{host}:{port}/mesh?n=16", data=body,
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                z = np.load(io.BytesIO(r.read()))
            assert z["verts"].shape[1] == 3 and z["tris"].shape[1] == 3
        finally:
            srv.stop()

    def test_mesh_off_export(self, setup, tmp_path_factory):
        ds, items, smpl, model, variables = setup
        out = str(tmp_path_factory.mktemp("nomesh"))
        gender = int(np.asarray(items[0]["gender"]))
        export_serving_bundle(
            out, model, variables, {gender: smpl},
            dict(items[0]), dict(items[0]),
            chunk=CHUNK, n_samples=N_SAMPLES, global_compact=False,
            mesh_chunk=0,
        )
        served = load_serving_bundle(out)
        assert not served.manifest["has_mesh"]
        with pytest.raises(ValueError, match="without a mesh graph"):
            served.extract_mesh(dict(items[0]), dict(items[0]), n=8)


class TestAnimServe:
    """Mesh-anchored animation from a served bundle (/animate): bake at
    canonical mesh verts through the exported anim_query graph, LBS +
    native rasterize + M-sample composite on host — the reference's
    lib/mesh_animation_renderer.py flow with no model code."""

    def test_animate_matches_live_renderer(self, setup, bundle):
        """Same client-supplied canonical mesh through the served path
        and the live MeshAnimationRenderer -> same image."""
        from scipy.spatial import ConvexHull

        from mpsnerf_tpu.geometry import MeshAnimationRenderer

        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        assert served.manifest["has_anim"]
        tv = np.asarray(items[0]["t_vertices"], np.float32)
        tris = ConvexHull(tv).simplices.astype(np.int32)

        a = served.animate(dict(items[0]), dict(items[1]), view_index=0,
                           height=64, width=64, can_verts=tv, tris=tris,
                           m_samples=5)

        live = MeshAnimationRenderer(model, variables, smpl, tv, tris,
                                     m_samples=5)
        live.bake(dict(items[0]))
        b = live.render_pose(dict(items[1]), 0, 64, 64)
        assert a.shape == (64, 64, 3) and np.isfinite(a).all()
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_animate_extracts_canonical_mesh(self, setup, bundle):
        """No client mesh: the canonical-frame mesh graph provides one."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        cv, ct = served.extract_mesh(dict(items[0]), dict(items[0]),
                                     n=16, canonical=True)
        assert len(cv) > 0
        img = served.animate(dict(items[0]), dict(items[0]),
                             view_index=1, height=32, width=32,
                             mesh_n=16, fast=True)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    def test_animate_over_http_with_client_mesh(self, setup, bundle):
        import io

        from scipy.spatial import ConvexHull

        ds, items, smpl, model, variables = setup
        tv = np.asarray(items[0]["t_vertices"], np.float32)
        tris = ConvexHull(tv).simplices.astype(np.int32)
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(
                items[0], items[1], mesh={"verts": tv, "tris": tris}
            )
            req = urllib.request.Request(
                f"http://{host}:{port}/animate?view=0&h=32&w=32&fast=1",
                data=body, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                img = np.load(io.BytesIO(r.read()))
            assert img.shape == (32, 32, 3) and np.isfinite(img).all()
        finally:
            srv.stop()


class TestSpiralVideo:
    def test_spiral_video_format(self, setup, bundle):
        """&format=video returns an encoded MJPG avi (RIFF container) —
        the reference's images_to_video workflow served directly."""
        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(items[0], items[0])
            req = urllib.request.Request(
                f"http://{host}:{port}/spiral?frames=2&h=32&w=32"
                "&format=video&fps=2",
                data=body, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                assert r.headers["Content-Type"] == "video/x-msvideo"
                blob = r.read()
            assert blob[:4] == b"RIFF" and b"AVI " in blob[:16]
            assert len(blob) > 1000
        finally:
            srv.stop()


class TestContentCache:
    def test_repeat_request_hits_device_cache(self, setup, bundle):
        """Two FRESH dicts with the same arrays (the HTTP pattern): the
        second request skips upload + encode via the content-keyed cache
        and renders identically."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        a = served.render_view(dict(items[0]), dict(items[0]), 0)
        hits0 = served.n_cache_hits
        b = served.render_view(dict(items[0]), dict(items[0]), 0)
        assert served.n_cache_hits >= hits0 + 2  # sp and tp both hit
        np.testing.assert_array_equal(a, b)

    def test_changed_arrays_miss(self, setup, bundle):
        """A different pose must NOT reuse the cached device dict."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        served.render_view(dict(items[0]), dict(items[0]), 0)
        a = served.render_view(dict(items[0]), dict(items[1]), 0)
        b = served.render_view(dict(items[0]), dict(items[1]), 0,
                               use_global=False)
        np.testing.assert_array_equal(a, b)

    def test_reshaped_bytes_change_the_key(self, setup, bundle):
        """Byte-identical content in a different layout must MISS (a
        hit would skip schema validation)."""
        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        a = dict(items[0])
        b = dict(items[0])
        v = np.ascontiguousarray(np.asarray(a["vertices"]))
        b["vertices"] = v.reshape(3, -1)  # same bytes, new shape
        assert (served._item_key(a, "tp")
                != served._item_key(b, "tp"))

    def test_cache_is_bounded(self, setup, bundle):
        import os as _os

        ds, items, smpl, model, variables = setup
        served = load_serving_bundle(bundle)
        assert served._content_cache_max == int(
            _os.environ.get("MPSNERF_SERVE_ITEM_CACHE", "4")
        )
        for i in range(6):
            it = dict(items[0])
            it["params"] = dict(it["params"])
            it["params"]["poses"] = (
                np.asarray(it["params"]["poses"]) + 1e-4 * (i + 1)
            )
            served._prep(it, "tp")
        assert len(served._content_cache) <= served._content_cache_max
        assert (len(served._content_order)
                == len(served._content_cache))


class TestWarmup:
    def test_warmup_compiles_hot_graphs(self, setup, bundle):
        """warmup() runs every hot graph on schema-shaped dummies; a
        real request afterwards renders identically to a cold bundle."""
        ds, items, smpl, model, variables = setup
        warm = load_serving_bundle(bundle)
        warmed = warm.warmup()
        assert set(warmed) >= {"encode", "render_chunk", "global",
                               "mesh", "mesh_canonical", "anim_query"}
        cold = load_serving_bundle(bundle)
        a = warm.render_view(dict(items[0]), dict(items[0]), 0)
        b = cold.render_view(dict(items[0]), dict(items[0]), 0)
        np.testing.assert_array_equal(a, b)


class TestMultiActor:
    def test_roster_routes(self, setup, bundle, tmp_path_factory):
        """Two actors behind one server: /actors lists them, prefixed
        routes render each, unprefixed routes 404 with a hint."""
        import io
        import json as _json

        ds, items, smpl, model, variables = setup
        srv = BundleServer(
            {"a1": load_serving_bundle(bundle), "a2": bundle}
        ).start()
        try:
            host, port = srv.address
            base = f"http://{host}:{port}"
            with urllib.request.urlopen(f"{base}/actors") as r:
                roster = _json.loads(r.read())
            assert sorted(roster) == ["a1", "a2"]

            body = items_to_npz_bytes(items[0], items[0])
            req = urllib.request.Request(
                f"{base}/actors/a2/render?view=0", data=body,
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                rgb = np.load(io.BytesIO(r.read()))
            assert rgb.shape[1] == 3

            req = urllib.request.Request(
                f"{base}/render?view=0", data=body, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 404

            with urllib.request.urlopen(f"{base}/healthz") as r:
                h = _json.loads(r.read())
            assert set(h["actors"]) == {"a1", "a2"}
            with urllib.request.urlopen(
                f"{base}/actors/a1/manifest"
            ) as r:
                assert b'"chunk"' in r.read()
        finally:
            srv.stop()

    def test_single_bundle_keeps_legacy_and_prefixed_routes(
        self, setup, bundle
    ):
        import io

        ds, items, smpl, model, variables = setup
        srv = BundleServer(load_serving_bundle(bundle)).start()
        try:
            host, port = srv.address
            body = items_to_npz_bytes(items[0], items[0])

            def post(url):
                req = urllib.request.Request(url, data=body,
                                             method="POST")
                with urllib.request.urlopen(req) as r:
                    return np.load(io.BytesIO(r.read()))

            a = post(f"http://{host}:{port}/render?view=0")
            b = post(
                f"http://{host}:{port}/actors/default/render?view=0"
            )
            np.testing.assert_array_equal(a, b)
        finally:
            srv.stop()

"""Native geometry kernels: iso-surface + rasterizer correctness."""

import numpy as np
import pytest

from mpsnerf_tpu.native import extract_isosurface, rasterize_mesh, export_obj


METHODS = ["mc", "tet"]


def _sphere_grid(n, r):
    c = (n - 1) / 2.0
    ax = np.arange(n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    dist = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    return (r - dist).astype(np.float32), c  # >0 inside


@pytest.mark.parametrize("method", METHODS)
class TestIsosurface:
    def test_sphere_surface(self, method):
        """Iso-surface of a sphere SDF: vertices on the sphere, area and
        centroid match the analytic values."""
        r = 15.0
        grid, c = _sphere_grid(48, r)

        verts, tris = extract_isosurface(grid, 0.0, method=method)
        assert len(verts) > 500 and len(tris) > 1000
        radii = np.linalg.norm(verts - c, axis=1)
        np.testing.assert_allclose(radii, r, atol=0.35)
        np.testing.assert_allclose(verts.mean(0), c, atol=0.1)

        # surface area within 3% of 4*pi*r^2
        a = verts[tris[:, 0]]
        b = verts[tris[:, 1]]
        d = verts[tris[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, d - a), axis=1).sum()
        np.testing.assert_allclose(area, 4 * np.pi * r * r, rtol=0.03)

    def test_empty_grid(self, method):
        grid = np.full((8, 8, 8), -1.0, np.float32)
        verts, tris = extract_isosurface(grid, 0.0, method=method)
        assert len(verts) == 0 and len(tris) == 0

    def test_no_degenerate_triangles(self, method):
        rng = np.random.default_rng(0)
        grid = rng.normal(size=(12, 12, 12)).astype(np.float32)
        verts, tris = extract_isosurface(grid, 0.0, method=method)
        assert tris.max() < len(verts)
        a = verts[tris[:, 0]]
        b = verts[tris[:, 1]]
        c = verts[tris[:, 2]]
        areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        # allow rare slivers but not systematically-degenerate output
        assert (areas > 1e-9).mean() > 0.95

    def test_watertight_closed_surface(self, method):
        """Every edge of a closed iso-surface is shared by exactly 2 tris."""
        grid, _ = _sphere_grid(24, 8.0)
        verts, tris = extract_isosurface(grid, 0.0, method=method)
        from collections import Counter

        edges = Counter()
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges[tuple(sorted(e))] += 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).mean() > 0.99


class TestMarchingCubesParity:
    """The MC extractor's vertex set is exactly PyMCubes' — one
    linearly-interpolated vertex per sign-crossing cell edge
    (``mcubes.marching_cubes``, used at ``extract_thuman_mesh.py:164``)."""

    @staticmethod
    def _cut_edge_verts(g, iso):
        """Enumerate every sign-crossing grid edge with linear interp."""
        pts = []
        ins = g > iso
        for axis in range(3):
            sl0 = [slice(None)] * 3
            sl1 = [slice(None)] * 3
            sl0[axis] = slice(0, -1)
            sl1[axis] = slice(1, None)
            v0, v1 = g[tuple(sl0)], g[tuple(sl1)]
            cut = ins[tuple(sl0)] != ins[tuple(sl1)]
            idx = np.argwhere(cut)
            t = (iso - v0[cut]) / (v1[cut] - v0[cut])
            p = idx.astype(np.float64)
            p[:, axis] += t
            pts.append(p)
        return np.concatenate(pts) if pts else np.zeros((0, 3))

    @pytest.mark.parametrize("seed", [0, 1])
    def test_vertex_set_is_cut_edges(self, seed):
        rng = np.random.default_rng(seed)
        grid = rng.normal(size=(12, 12, 12)).astype(np.float32)
        verts, _ = extract_isosurface(grid, 0.0, method="mc")
        ref = self._cut_edge_verts(grid.astype(np.float64), 0.0)
        assert len(verts) == len(ref)
        vs = verts[np.lexsort(verts.T[::-1])]
        rs = ref[np.lexsort(ref.T[::-1])]
        np.testing.assert_allclose(vs, rs, atol=1e-5)

    def test_outward_orientation(self):
        """Triangles wind so normals point out of the >iso body."""
        grid, c = _sphere_grid(32, 10.0)
        verts, tris = extract_isosurface(grid, 0.0, method="mc")
        a, b, d = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
        nrm = np.cross(b - a, d - a)
        outward = np.einsum("ij,ij->i", nrm, (a + b + d) / 3 - c)
        assert (outward > 0).all()

    def test_coarser_than_tet(self):
        """MC emits the classic (sparser) triangulation of the surface."""
        grid, _ = _sphere_grid(32, 10.0)
        vm, tm = extract_isosurface(grid, 0.0, method="mc")
        vt, tt = extract_isosurface(grid, 0.0, method="tet")
        assert len(tm) < len(tt)
        assert len(vm) < len(vt)

    def test_export_obj(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        p = tmp_path / "m.obj"
        export_obj(str(p), verts, tris)
        text = p.read_text()
        assert text.count("v ") == 3 and "f 1 2 3" in text


class TestRasterizer:
    def test_single_triangle_coverage(self):
        verts = np.array(
            [[10, 10, 2.0], [50, 10, 2.0], [10, 50, 2.0]], np.float32
        )
        tris = np.array([[0, 1, 2]], np.int32)
        p2f, bary, zbuf = rasterize_mesh(verts, tris, 64, 64)
        assert p2f[15, 15] == 0       # inside
        assert p2f[5, 5] == -1        # outside
        assert p2f[55, 55] == -1      # beyond hypotenuse
        inside = p2f == 0
        np.testing.assert_allclose(bary[inside].sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(zbuf[inside], 2.0, atol=1e-5)

    def test_zbuffer_ordering(self):
        verts = np.array(
            [
                [10, 10, 5.0], [50, 10, 5.0], [10, 50, 5.0],   # far
                [10, 10, 2.0], [50, 10, 2.0], [10, 50, 2.0],   # near
            ],
            np.float32,
        )
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        p2f, _, zbuf = rasterize_mesh(verts, tris, 64, 64)
        assert p2f[15, 15] == 1  # near triangle wins
        np.testing.assert_allclose(zbuf[15, 15], 2.0, atol=1e-5)

    def test_barycentric_interpolation(self):
        """Interpolating vertex attributes with the returned barycentrics
        reproduces a linear function over the triangle."""
        verts = np.array(
            [[0, 0, 1.0], [63, 0, 1.0], [0, 63, 1.0]], np.float32
        )
        tris = np.array([[0, 1, 2]], np.int32)
        attr = np.array([0.0, 1.0, 2.0])  # per-vertex scalar
        p2f, bary, _ = rasterize_mesh(verts, tris, 64, 64)
        ys, xs = np.nonzero(p2f == 0)
        interp = (bary[ys, xs] * attr[tris[0]]).sum(-1)
        # linear field: f(x, y) = x/63 + 2*y/63 at pixel centers
        expected = (xs + 0.5) / 63.0 + 2 * (ys + 0.5) / 63.0
        np.testing.assert_allclose(interp, expected, atol=2e-2)

    def test_behind_camera_culled(self):
        verts = np.array(
            [[10, 10, -1.0], [50, 10, 2.0], [10, 50, 2.0]], np.float32
        )
        tris = np.array([[0, 1, 2]], np.int32)
        p2f, _, _ = rasterize_mesh(verts, tris, 64, 64)
        assert (p2f == -1).all()

from mpsnerf_tpu.geometry.extract import extract_density_mesh, GridSpec
from mpsnerf_tpu.geometry.normal_render import render_normal_map
from mpsnerf_tpu.geometry.animation import MeshAnimationRenderer
from mpsnerf_tpu.geometry.spiral import gen_path, load_cam, viewmatrix

__all__ = [
    "extract_density_mesh", "GridSpec", "render_normal_map",
    "MeshAnimationRenderer", "gen_path", "load_cam", "viewmatrix",
]

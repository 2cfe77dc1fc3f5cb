from mpsnerf_tpu.renderer.render import render_rays, render_image, RenderResult

__all__ = ["render_rays", "render_image", "RenderResult"]

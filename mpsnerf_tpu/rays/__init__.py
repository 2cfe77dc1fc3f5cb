from mpsnerf_tpu.rays.rays import (
    get_rays,
    get_near_far,
    get_bound_2d_mask,
    sample_rays_batch,
    sample_rays_h36m_batch,
    project_points,
)

__all__ = [
    "get_rays", "get_near_far", "get_bound_2d_mask",
    "sample_rays_batch", "sample_rays_h36m_batch", "project_points",
]

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.data.voxelize import voxelize_vertices


def attach_spconv_plan(item, canonical: bool = False):
    """Add the sparse-conv gather tables for this item's voxelization
    (needed when correction_field is enabled).  ``canonical=True`` also
    builds the plan for the canonical (t_*) grid — the numpy-era
    CorrectionF3D model conditions its NeRF on canonical-grid features
    (ref lib/correction.py:339-341)."""
    from mpsnerf_tpu.models.sparse_conv import build_plan

    item["spconv_plan"] = build_plan(item["coord"], item["out_sh"])
    if canonical:
        item["t_spconv_plan"] = build_plan(item["t_coord"], item["t_out_sh"])
    return item


def attach_body_grid(item, voxel: float = 0.02):
    """Add the conservative body-occupancy grid (O(1) human-region
    candidate test — ops/body_grid.py).  Built from the SMPL-frame
    vertices (= the 'feature' field)."""
    from mpsnerf_tpu.ops.body_grid import build_body_grid

    item["body_grid"] = build_body_grid(item["feature"], voxel=voxel)
    return item


__all__ = ["SyntheticHumanDataset", "voxelize_vertices", "attach_spconv_plan"]

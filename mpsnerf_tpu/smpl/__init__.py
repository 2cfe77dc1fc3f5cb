from mpsnerf_tpu.smpl.model import (
    SMPLModel,
    load_smpl_pickle,
    synthetic_smpl,
)
from mpsnerf_tpu.smpl.kinematics import (
    rodrigues,
    rigid_transforms,
    transform_params,
    pose_blend_offsets,
    shape_blend_offsets,
    big_pose_vector,
    BIG_POSE_AXES,
)
from mpsnerf_tpu.smpl.lbs import (
    world_to_smpl,
    smpl_to_world,
    deform_target_to_canonical,
    deform_canonical_to_source,
    posed_vertices,
)

__all__ = [
    "SMPLModel", "load_smpl_pickle", "synthetic_smpl",
    "rodrigues", "rigid_transforms", "transform_params",
    "pose_blend_offsets", "shape_blend_offsets", "big_pose_vector",
    "BIG_POSE_AXES",
    "world_to_smpl", "smpl_to_world",
    "deform_target_to_canonical", "deform_canonical_to_source",
    "posed_vertices",
]

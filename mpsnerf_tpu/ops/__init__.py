from mpsnerf_tpu.ops.knn import nearest_vertex, knn_points, nearest_vertex_xla
from mpsnerf_tpu.ops.composite import composite_rays, shifted_softplus, wide_sigmoid
from mpsnerf_tpu.ops.grid_sample import grid_sample_2d, index_features
from mpsnerf_tpu.ops.positional import positional_encoding, pe_dim

__all__ = [
    "nearest_vertex", "knn_points", "nearest_vertex_xla",
    "composite_rays", "shifted_softplus", "wide_sigmoid",
    "grid_sample_2d", "index_features",
    "positional_encoding", "pe_dim",
]

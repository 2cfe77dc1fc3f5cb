from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.data.voxelize import voxelize_vertices

__all__ = ["SyntheticHumanDataset", "voxelize_vertices"]

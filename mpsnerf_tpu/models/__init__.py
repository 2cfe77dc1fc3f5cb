from mpsnerf_tpu.models.layers import TorchLinear
from mpsnerf_tpu.models.resnet import SpatialEncoder
from mpsnerf_tpu.models.transformer import ViewFusionTransformer
from mpsnerf_tpu.models.deform import DeformField
from mpsnerf_tpu.models.mps_nerf import MPSNeRF, RawOutput

__all__ = [
    "TorchLinear", "SpatialEncoder", "ViewFusionTransformer",
    "DeformField", "MPSNeRF", "RawOutput",
]

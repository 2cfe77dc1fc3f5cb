from mpsnerf_tpu.eval.metrics import psnr_metric, ssim_metric, structural_similarity
from mpsnerf_tpu.eval.protocol import evaluate_novel_view_pose

__all__ = [
    "psnr_metric", "ssim_metric", "structural_similarity",
    "evaluate_novel_view_pose",
]

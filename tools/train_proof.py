"""Round-1 learning-proof run: train on the synthetic scene on the real
TPU and record PSNR progression + eval metrics (artifacts/)."""

import json
import os
import time
import warnings

warnings.filterwarnings("ignore")

import numpy as np
import jax
import jax.numpy as jnp

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import Trainer, TrainConfig, to_device_input
from mpsnerf_tpu.eval.runner import ViewRenderer
from mpsnerf_tpu.eval.metrics import psnr_metric, ssim_metric

SIZE = 256
ds = SyntheticHumanDataset(
    n_poses=2, n_cameras=6, image_size=SIZE, n_rays=512, n_verts=6890,
    num_instances=1, input_views=[0, 2, 4], split="train", seed=3,
)
test_ds = SyntheticHumanDataset(
    n_poses=2, n_cameras=6, image_size=SIZE, n_rays=64, n_verts=6890,
    num_instances=1, input_views=[0, 2, 4], split="test", seed=3,
)
smpl = ds.smpl_for(0)
items = [to_device_input(ds.get_item(i, instance_idx=0)) for i in range(2)]

model = MPSNeRF(num_instances=1, compact_fraction=0.5)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.PRNGKey(0)}, smpl, items[0], items[0],
    jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
)
cfg = TrainConfig(
    n_samples=64, smooth_loss=True, smooth_interval=4, decay_steps=30000,
)
trainer = Trainer(model, cfg, variables)

key = jax.random.PRNGKey(42)
history = []
t0 = time.time()
N_ITEMS = 400  # x6 views = 2400 view-steps
for it in range(N_ITEMS):
    key, sub = jax.random.split(key)
    logs = trainer.train_item(smpl, items[it % 2], items[it % 2], sub)
    if it % 20 == 0:
        rec = {"item": it, "step": trainer.global_step,
               "loss": logs["loss"], "psnr": logs["psnr"],
               "t": round(time.time() - t0, 1)}
        history.append(rec)
        print(rec, flush=True)

# --- eval: held-out views (1, 3, 5) of both poses
os.makedirs("artifacts", exist_ok=True)
vv = {"params": trainer.state.params,
      "batch_stats": trainer.state.batch_stats}
renderer = ViewRenderer(model, lambda g: smpl, chunk=4096, n_samples=64)
test_items = [test_ds.get_item(i, instance_idx=0) for i in range(2)]

results = []
import cv2

for pi, item in enumerate(test_items):
    for k in (1, 3, 5):
        rgb = renderer.render_view(vv, item, item, k)
        pred = rgb.reshape(SIZE, SIZE, 3)
        gt = np.asarray(item["rgb_all"][k]).reshape(SIZE, SIZE, 3)
        mask = np.asarray(item["mask_at_box_all"][k]).reshape(SIZE, SIZE) > 0
        psnr = psnr_metric(pred[mask], gt[mask])
        ssim = ssim_metric(pred[mask], gt[mask], mask, SIZE, SIZE)
        results.append({"pose": pi, "view": k, "psnr": round(psnr, 3),
                        "ssim": round(ssim, 4)})
        print(results[-1], flush=True)
        if pi == 0 and k == 1:
            side = np.concatenate([pred, gt], axis=1)
            cv2.imwrite(
                "artifacts/synthetic_novel_view.png",
                (np.clip(side, 0, 1) * 255).astype(np.uint8)[..., ::-1],
            )

summary = {
    "setup": "synthetic subject, 3 input views @256, 64 samples, "
             f"{trainer.global_step} view-steps on one v5e chip",
    "train_minutes": round((time.time() - t0) / 60, 1),
    "history": history,
    "heldout_view_metrics": results,
    "mean_heldout_psnr": round(float(np.mean([r["psnr"] for r in results])), 3),
    "mean_heldout_ssim": round(float(np.mean([r["ssim"] for r in results])), 4),
}
with open("artifacts/synthetic_training_proof.json", "w") as f:
    json.dump(summary, f, indent=1)
print("DONE", summary["mean_heldout_psnr"], summary["mean_heldout_ssim"])

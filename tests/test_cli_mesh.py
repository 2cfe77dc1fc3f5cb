"""End-to-end CLI training on the 8-device virtual mesh.

Exercises the reference's DataParallel/DDP launch surface
(run_nerf_batch.py:344-350) TPU-style: ``--mesh_devices 8 --batch_size 2``
routes run_nerf_batch through MeshTrainer (items over the data axis, rays
over the ray axis) with checkpointing on.
"""

import json
import os

import numpy as np
import pytest


class TestCLIMesh:
    def test_mesh_training_end_to_end(self, tmp_path):
        import run_nerf_batch

        run_nerf_batch.main([
            "--config", "configs/synthetic_smoke.txt",
            "--basedir", str(tmp_path),
            "--expname", "mesh_smoke",
            "--mesh_devices", "8",
            "--batch_size", "2",
            # tiny shapes: the CPU-mesh compile dominates, so keep ONE
            # compiled program (smooth off; the smooth branch is covered
            # on the same mesh by dryrun_multichip / test_batched_step)
            "--smooth_loss", "0",
            "--image_scaling", "0.0625",
            "--N_rand", "32",
            "--N_samples", "8",
            "--N_iteration", "6",
            "--i_print", "4",
            "--i_weights", "6",
            "--i_testset", "1000000",
            "--num_worker", "0",
        ])

        exp = tmp_path / "mesh_smoke"
        ckpts = sorted(os.listdir(exp / "checkpoints"))
        assert ckpts, "mesh run saved no checkpoint"

        metrics = (
            tmp_path / "summaries" / "mesh_smoke" / "scalars.jsonl"
        ).read_text().strip().splitlines()
        rows = [json.loads(x) for x in metrics]
        assert rows, "no metrics logged"
        assert all(np.isfinite(r["loss"]) for r in rows)
        assert all(np.isfinite(r["psnr"]) for r in rows)

    def test_mesh_flag_validation(self, tmp_path):
        import run_nerf_batch

        with pytest.raises(ValueError, match="not divisible"):
            run_nerf_batch.main([
                "--config", "configs/synthetic_smoke.txt",
                "--basedir", str(tmp_path),
                "--expname", "bad_mesh",
                "--mesh_devices", "8",
                "--batch_size", "3",
                "--num_worker", "0",
            ])

from mpsnerf_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate_to_mesh,
    RAY_AXIS,
)

__all__ = ["make_mesh", "make_sharded_train_step", "replicate_to_mesh", "RAY_AXIS"]

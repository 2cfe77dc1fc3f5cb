from mpsnerf_tpu.compat.torch_import import (
    convert_reference_state_dict,
    load_reference_checkpoint,
)

__all__ = ["convert_reference_state_dict", "load_reference_checkpoint"]

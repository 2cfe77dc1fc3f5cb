from mpsnerf_tpu.native.bindings import (
    extract_isosurface,
    rasterize_mesh,
    export_obj,
)

__all__ = ["extract_isosurface", "rasterize_mesh", "export_obj"]

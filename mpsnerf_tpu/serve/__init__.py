"""AOT serving: hermetic jax.export bundles + a stdlib HTTP front-end.

See :mod:`mpsnerf_tpu.serve.bundle` for the artifact format and
:mod:`mpsnerf_tpu.serve.server` for the wire protocol.
"""

from mpsnerf_tpu.serve.bundle import (
    ServedRenderer,
    export_serving_bundle,
    load_serving_bundle,
)

__all__ = [
    "ServedRenderer",
    "export_serving_bundle",
    "load_serving_bundle",
]

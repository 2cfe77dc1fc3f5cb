"""MPS-NeRF TPU: a TPU-native generalizable human NeRF framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
gaoxiangjun/MPS-NeRF (TPAMI 2022): generalizable 3D human rendering from a
few multi-view images, with SMPL linear-blend-skinning warps into a canonical
pose space, pixel-aligned image conditioning, transformer multi-view fusion,
and volume rendering — plus mesh extraction and mesh-anchored animation.

Design stance (vs. the PyTorch/CUDA reference):
  * static shapes everywhere — masked compute instead of boolean compaction
  * functional state — no module side-channels; flax.linen + explicit pytrees
  * the image encoder runs once per step, not once per ray chunk
  * ray batches shard over a ``jax.sharding.Mesh`` instead of DataParallel
  * the KNN / warp / compositing hot path is fused Pallas/XLA kernels
"""

__version__ = "0.1.0"

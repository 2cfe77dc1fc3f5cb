"""Pixel-aligned 2D image encoder: ResNet-34 feature pyramid.

Behavioral reference: ``/root/reference/lib/encoder.py:186-306``
(``SpatialEncoder``): torchvision ResNet-34 backbone, feature_scale=0.5
("area" downsample of the input), conv1+bn+relu then the first
``num_layers - 1`` residual stages with the initial maxpool skipped, all
stage outputs bilinearly upsampled to the first stage's resolution and
concatenated.  num_layers=2 (the trained config) -> 64 + 64 = 128 channels
at 1/4 of the original image resolution.

TPU-first: NCHW->NHWC internally (XLA's preferred conv layout), fp32 params,
BatchNorm with running stats (training mode updates ``batch_stats`` exactly
like torch's momentum-0.1 running averages; cross-replica stats use
``axis_name`` when set — the SyncBatchNorm equivalent).

ImageNet-pretrained torchvision weights can be imported with
:func:`load_torchvision_state_dict` when a weights file is available (this
environment has no network egress, so random init is the default).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

_STAGE_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
_STAGE_CHANNELS = (64, 128, 256, 512)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False, name="conv2"
        )(y)
        y = bn("bn2")(y)

        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


def _area_downsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(mode="area", scale=0.5) == 2x2 average pooling."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _bilinear_resize_align_corners(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (torch upsample parity)."""
    hh, ww = x.shape[1], x.shape[2]
    if (hh, ww) == (h, w):
        return x
    ys = jnp.linspace(0.0, hh - 1.0, h)
    xs = jnp.linspace(0.0, ww - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys), 0, hh - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, ww - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, hh - 1)
    x1 = jnp.minimum(x0 + 1, ww - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yy, xx: x[:, yy][:, :, xx]
    return (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )


class SpatialEncoder(nn.Module):
    """ResNet-34 feature pyramid (``SpatialEncoder`` equivalent).

    Input:  images (V, 3, H, W) in NCHW (matching the data schema).
    Output: latent (V, C, H/4, W/4) with C = 64 * num_layers stage concat.
    """

    backbone: str = "resnet34"
    num_layers: int = 2
    feature_scale: float = 0.5
    use_first_pool: bool = False
    bn_axis_name: Optional[str] = None

    @property
    def latent_channels(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
        if self.feature_scale == 0.5:
            x = _area_downsample_2x(x)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = bn("bn1")(x)
        x = nn.relu(x)

        latents = [x]
        blocks = _STAGE_BLOCKS[self.backbone]
        for stage in range(1, self.num_layers):
            if stage == 1 and self.use_first_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            stride = 1 if stage == 1 else 2
            for b in range(blocks[stage - 1]):
                x = BasicBlock(
                    _STAGE_CHANNELS[stage - 1],
                    stride=stride if b == 0 else 1,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage}_block{b}",
                )(x, train)
            latents.append(x)

        h, w = latents[0].shape[1], latents[0].shape[2]
        latents = [_bilinear_resize_align_corners(l, h, w) for l in latents]
        latent = jnp.concatenate(latents, axis=-1)
        return jnp.transpose(latent, (0, 3, 1, 2))  # NHWC -> NCHW


class GlobalImageEncoder(nn.Module):
    """Global (non-pixel-aligned) image encoder — ``ImageEncoder``
    equivalent (ref lib/encoder.py:309-364): full ResNet trunk, global
    average pool, optional projection to 512."""

    backbone: str = "resnet34"
    latent_size: int = 512
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(images, (0, 2, 3, 1))

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None, name=name,
            )

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        blocks = _STAGE_BLOCKS[self.backbone]
        for stage in range(1, 5):
            stride = 1 if stage == 1 else 2
            for b in range(blocks[stage - 1]):
                x = BasicBlock(
                    _STAGE_CHANNELS[stage - 1],
                    stride=stride if b == 0 else 1,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage}_block{b}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.latent_size != 512:
            x = nn.Dense(512, name="fc")(x)
        return x


def load_torchvision_state_dict(variables: Any, state_dict: dict, num_layers: int = 2):
    """Map a torchvision resnet34 ``state_dict`` (numpy arrays) onto this
    module's variables.  Conv kernels transpose OIHW -> HWIO.

    Only the stages this encoder uses are consumed.  Returns new variables.
    """
    import numpy as np
    from flax.core import freeze, unfreeze

    v = unfreeze(variables)

    def _nav(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return node

    def put_conv(dst, src):
        _nav(v["params"], dst)["kernel"] = jnp.asarray(
            np.transpose(state_dict[src], (2, 3, 1, 0))
        )

    def put_bn(dst, src):
        p = _nav(v["params"], dst)
        s = _nav(v["batch_stats"], dst)
        p["scale"] = jnp.asarray(state_dict[src + ".weight"])
        p["bias"] = jnp.asarray(state_dict[src + ".bias"])
        s["mean"] = jnp.asarray(state_dict[src + ".running_mean"])
        s["var"] = jnp.asarray(state_dict[src + ".running_var"])

    put_conv("conv1", "conv1.weight")
    put_bn("bn1", "bn1")
    blocks = _STAGE_BLOCKS["resnet34"]
    for stage in range(1, num_layers):
        for b in range(blocks[stage - 1]):
            pfx = f"layer{stage}.{b}"
            dst = f"layer{stage}_block{b}"
            put_conv(f"{dst}/conv1", f"{pfx}.conv1.weight")
            put_conv(f"{dst}/conv2", f"{pfx}.conv2.weight")
            put_bn(f"{dst}/bn1", f"{pfx}.bn1")
            put_bn(f"{dst}/bn2", f"{pfx}.bn2")
            if f"{pfx}.downsample.0.weight" in state_dict:
                put_conv(f"{dst}/downsample_conv", f"{pfx}.downsample.0.weight")
                put_bn(f"{dst}/downsample_bn", f"{pfx}.downsample.1")
    return freeze(v) if not isinstance(variables, dict) else v

"""Import reference (PyTorch ``SKinningBatch``) checkpoints.

The reference saves ``{global_step, network_fn_state_dict}`` .tar files
(run_nerf_batch.py:606-617).  This maps that state dict onto this
framework's parameter tree so a trained reference model can be evaluated
here directly (the PSNR/SSIM-parity instrument).

Layout conversions: torch ``nn.Linear`` stores (out, in) -> transposed to
(in, out); conv kernels OIHW -> HWIO; BatchNorm weight/bias/running stats
map to flax scale/bias/mean/var.

Covered modules (the full trained config): encoder_2d (ResNet-34 stages),
transformer, NeRF MLP heads, latent codes, forward/backward deform fields.
The sparse-conv 3D encoder uses a different (gather/einsum) weight layout;
importing it requires spconv's kernel layout and is flagged if present.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w):  # torch Linear -> flax Dense kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_reference_state_dict(
    sd: Dict[str, Any],
    resnet_layers: int = 2,
) -> Tuple[Dict, Dict, Dict]:
    """torch name->tensor dict -> (params, batch_stats, report).

    ``report`` lists consumed / skipped torch keys for auditability.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def put_linear(dst: str, src: str):
        params[dst] = {"Dense_0": {
            "kernel": _t(take(src + ".weight")),
            "bias": np.asarray(take(src + ".bias")),
        }}

    def bn_pair(src: str):
        p = {"scale": np.asarray(take(src + ".weight")),
             "bias": np.asarray(take(src + ".bias"))}
        s = {"mean": np.asarray(take(src + ".running_mean")),
             "var": np.asarray(take(src + ".running_var"))}
        used.add(src + ".num_batches_tracked")
        return p, s

    # ---- 2D encoder (SpatialEncoder -> encoder_2d) ----
    # partial state dicts (e.g. a single sub-module) simply skip absent
    # sections instead of KeyError-ing
    has_encoder = "encoder_2d.model.conv1.weight" in sd
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    if has_encoder:
        enc_p["conv1"] = {
            "kernel": _conv(take("encoder_2d.model.conv1.weight"))
        }
        enc_p["bn1"], enc_s["bn1"] = bn_pair("encoder_2d.model.bn1")
        blocks = {"resnet34": (3, 4, 6, 3)}["resnet34"]
        for stage in range(1, resnet_layers):
            for b in range(blocks[stage - 1]):
                src = f"encoder_2d.model.layer{stage}.{b}"
                dst = f"layer{stage}_block{b}"
                d_p: Dict[str, Any] = {}
                d_s: Dict[str, Any] = {}
                d_p["conv1"] = {"kernel": _conv(take(src + ".conv1.weight"))}
                d_p["conv2"] = {"kernel": _conv(take(src + ".conv2.weight"))}
                d_p["bn1"], d_s["bn1"] = bn_pair(src + ".bn1")
                d_p["bn2"], d_s["bn2"] = bn_pair(src + ".bn2")
                if src + ".downsample.0.weight" in sd:
                    d_p["downsample_conv"] = {
                        "kernel": _conv(take(src + ".downsample.0.weight"))
                    }
                    d_p["downsample_bn"], d_s["downsample_bn"] = bn_pair(
                        src + ".downsample.1"
                    )
                enc_p[dst] = d_p
                enc_s[dst] = d_s
        params["encoder_2d"] = enc_p
        stats["encoder_2d"] = enc_s

    # ---- transformer ----
    if any(k.startswith("transformer.") for k in sd):
        tr: Dict[str, Any] = {}
        depth = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers.")
        )
        for i in range(depth):
            base = f"transformer.layers.{i}"
            tr[f"norm_attn_{i}"] = {
                "scale": np.asarray(take(f"{base}.0.fn.norm.weight")),
                "bias": np.asarray(take(f"{base}.0.fn.norm.bias")),
            }
            tr[f"attn_{i}"] = {
                "to_qkv": {"Dense_0": {
                    "kernel": _t(take(f"{base}.0.fn.fn.to_qkv.weight")),
                }},
                "to_out": {"Dense_0": {
                    "kernel": _t(take(f"{base}.0.fn.fn.to_out.0.weight")),
                    "bias": np.asarray(take(f"{base}.0.fn.fn.to_out.0.bias")),
                }},
            }
            tr[f"norm_ff_{i}"] = {
                "scale": np.asarray(take(f"{base}.1.fn.norm.weight")),
                "bias": np.asarray(take(f"{base}.1.fn.norm.bias")),
            }
            tr[f"ff_{i}"] = {
                "fc1": {"Dense_0": {
                    "kernel": _t(take(f"{base}.1.fn.fn.net.0.weight")),
                    "bias": np.asarray(take(f"{base}.1.fn.fn.net.0.bias")),
                }},
                "fc2": {"Dense_0": {
                    "kernel": _t(take(f"{base}.1.fn.fn.net.3.weight")),
                    "bias": np.asarray(take(f"{base}.1.fn.fn.net.3.bias")),
                }},
            }
        params["transformer"] = tr

    # ---- NeRF MLP + heads ----
    i = 0
    while f"pts_linears.{i}.weight" in sd:
        put_linear(f"pts_linear_{i}", f"pts_linears.{i}")
        i += 1
    for name in ("alpha_linear", "feature_linear", "views_linear", "rgb_linear"):
        if f"{name}.weight" in sd:
            put_linear(name, name)

    if "latent_codes.weight" in sd:
        params["latent_codes"] = {
            "embedding": np.asarray(take("latent_codes.weight"))
        }

    # ---- deform fields ----
    for field, dst in (("forward_deform", "forward_deform"),
                       ("backward_deform", "backward_deform")):
        if f"{field}.output_linear.weight" not in sd:
            continue
        f_p: Dict[str, Any] = {}
        j = 0
        while f"{field}.pts_time_linears.{j}.weight" in sd:
            f_p[f"fc{j}"] = {"Dense_0": {
                "kernel": _t(take(f"{field}.pts_time_linears.{j}.weight")),
                "bias": np.asarray(take(f"{field}.pts_time_linears.{j}.bias")),
            }}
            j += 1
        f_p["out"] = {"Dense_0": {
            "kernel": _t(take(f"{field}.output_linear.weight")),
            "bias": np.asarray(take(f"{field}.output_linear.bias")),
        }}
        params[dst] = f_p

    skipped = sorted(set(sd) - used)
    report = {
        "consumed": sorted(used & set(sd)),
        "skipped": skipped,
        "has_encoder_3d": any(k.startswith("encoder_3d.") for k in skipped),
    }
    return params, stats, report


def load_reference_checkpoint(tar_path: str, variables: Dict,
                              resnet_layers: int = 2):
    """Load a reference ``.tar`` checkpoint into this framework's
    variables.  Returns ``(variables, global_step, report)``.

    Converted leaves REPLACE matching leaves of ``variables``; shapes are
    asserted equal.  The sparse 3D encoder (if trained) is reported but
    not imported (layout mismatch, see module docstring).
    """
    import copy

    import jax
    import jax.numpy as jnp
    import torch

    ckpt = torch.load(tar_path, map_location="cpu")
    step = int(ckpt.get("global_step", 0))
    sd = {k: v.numpy() for k, v in ckpt["network_fn_state_dict"].items()}
    new_params, new_stats, report = convert_reference_state_dict(
        sd, resnet_layers
    )

    unused_modules = []

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    if not path:
                        # top-level module the target model never invokes
                        # (e.g. latent_codes in the flagship config: the
                        # reference computes-and-discards the embedding,
                        # skinnning_batch.py:401-403, so our query never
                        # creates its params) — skip, but surface it
                        unused_modules.append(k)
                        continue
                    raise KeyError(f"no target module at {path}{k}")
                merge(dst[k], v, f"{path}{k}/")
            else:
                if k not in dst:
                    raise KeyError(f"no target leaf at {path}{k}")
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}{k}: "
                        f"{dst[k].shape} vs {np.shape(v)}"
                    )
                dst[k] = jnp.asarray(v)

    variables = {
        "params": copy.deepcopy(jax.device_get(variables["params"])),
        "batch_stats": copy.deepcopy(
            jax.device_get(variables.get("batch_stats", {}))
        ),
    }
    merge(variables["params"], new_params)
    merge(variables["batch_stats"], new_stats)
    report["unused_modules"] = unused_modules
    return variables, step, report

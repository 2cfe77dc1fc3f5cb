"""Import reference (PyTorch ``SKinningBatch``) checkpoints.

The reference saves ``{global_step, network_fn_state_dict}`` .tar files
(run_nerf_batch.py:606-617).  This maps that state dict onto this
framework's parameter tree so a trained reference model can be evaluated
here directly (the PSNR/SSIM-parity instrument).

Layout conversions: torch ``nn.Linear`` stores (out, in) -> transposed to
(in, out); conv kernels OIHW -> HWIO; BatchNorm weight/bias/running stats
map to flax scale/bias/mean/var.

Covered modules (the full trained config): encoder_2d (ResNet-34 stages),
transformer, NeRF MLP heads, latent codes, forward/backward deform fields,
and the sparse-conv 3D encoder (spconv 1.x/2.x kernels reshaped onto the
gather/einsum (27, Cin, Cout) layout; full-chain oracle in
tests/test_sparse_conv.py::TestSpconvImport).
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

    # ---- 3D sparse-conv encoder (spconv kernels -> gather/einsum) ----
    # the reference's SparseConvNet (encoder.py:367-527) at num_layers=2
    # runs conv0 -> down0 -> conv1; its torch module CONSTRUCTS conv2..4 /
    # down1..3 too, so those keys exist in every checkpoint but are dead
    # weight — they stay in ``skipped``.  spconv applies torch conv3d
    # cross-correlation semantics, so weight spatial index k maps to the
    # neighbor offset k-1 — exactly models/sparse_conv._OFFSETS's
    # row-major enumeration (the mapping the dense-conv3d oracle tests
    # pin down, tests/test_sparse_conv.py::TestConvParity).
    if "encoder_3d.conv0.0.weight" in sd:
        def spconv_kernel(src, ci, co):
            """Disambiguate by the layer's KNOWN channel dims (shape
            sniffing alone misreads a 2.x kernel with Cout == 3 as 1.x
            and silently mis-reshapes it)."""
            w = take(src + ".weight")
            ambiguous = ci == 3 and co == 3  # (3,3,3,3,3) fits BOTH layouts
            if w.shape == (3, 3, 3, ci, co) and not ambiguous:
                # spconv 1.x layout: (kD, kH, kW, Cin, Cout)
                w27 = w.reshape(27, ci, co)
            elif w.shape == (co, 3, 3, 3, ci) and not ambiguous:
                # spconv 2.x KRSC layout (the reference's spconv-cu111):
                # (Cout, kD, kH, kW, Cin)
                w27 = np.transpose(w, (1, 2, 3, 4, 0)).reshape(27, ci, co)
            elif ambiguous and w.shape == (3, 3, 3, 3, 3):
                raise ValueError(
                    f"{src}: ambiguous spconv kernel shape {w.shape} "
                    f"(Cin == Cout == 3 fits both layouts); cannot infer"
                )
            else:
                raise ValueError(
                    f"{src}: unrecognized spconv kernel shape {w.shape} "
                    f"for Cin={ci}, Cout={co}"
                )
            return {"kernel": np.ascontiguousarray(w27)}

        e3_p: Dict[str, Any] = {}
        e3_s: Dict[str, Any] = {}
        for dst, src, dims in (
            ("conv0_0", "encoder_3d.conv0.0", (3, 16)),
            ("conv0_bn0", "encoder_3d.conv0.1", None),
            ("conv0_1", "encoder_3d.conv0.3", (16, 16)),
            ("conv0_bn1", "encoder_3d.conv0.4", None),
            ("down0", "encoder_3d.down0.0", (16, 32)),
            ("down0_bn", "encoder_3d.down0.1", None),
            ("conv1_0", "encoder_3d.conv1.0", (32, 32)),
            ("conv1_bn0", "encoder_3d.conv1.1", None),
            ("conv1_1", "encoder_3d.conv1.3", (32, 32)),
            ("conv1_bn1", "encoder_3d.conv1.4", None),
        ):
            if dims is not None:
                e3_p[dst] = spconv_kernel(src, *dims)
            else:
                p, s = bn_pair(src)
                e3_p[dst] = {"BatchNorm_0": p}
                e3_s[dst] = {"BatchNorm_0": s}
        params["encoder_3d"] = e3_p
        stats["encoder_3d"] = e3_s

    skipped = sorted(set(sd) - used)
    report = {
        "consumed": sorted(used & set(sd)),
        "skipped": skipped,
        # encoder_3d.{conv2..4,down1..3} are constructed-but-never-run
        # modules of the reference; only OTHER leftover encoder_3d keys
        # indicate an import gap
        "has_encoder_3d": any(
            k.startswith("encoder_3d.")
            and not k.split(".")[1] in (
                "conv2", "conv3", "conv4", "down1", "down2", "down3"
            )
            for k in skipped
        ),
    }
    return params, stats, report


def load_reference_checkpoint(tar_path: str, variables: Dict,
                              resnet_layers: int = 2):
    """Load a reference ``.tar`` checkpoint into this framework's
    variables.  Returns ``(variables, global_step, report)``.

    Converted leaves REPLACE matching leaves of ``variables``; shapes are
    asserted equal.
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

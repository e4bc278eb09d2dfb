"""Import reference (PyTorch) checkpoints into the flax PVNet.

The reference trains with torch and publishes `.pth` checkpoints
(`<model_dir>/<epoch>.pth` holding {'net': state_dict, ...}; reference
lib/utils/net_utils.py:289-324) whose network is `Resnet18`
(lib/networks/pvnet/resnet18.py:9-59) wrapping a torchvision-style dilated
ResNet-18 (lib/networks/pvnet/resnet.py). This module converts such state
dicts — and plain torchvision ImageNet `resnet18` state dicts for backbone
pre-initialization (ref resnet.py:223-232) — into this framework's
{params, batch_stats} variables, so reference users can bring their trained
models along.

Layout conversion: torch convs are OIHW, flax convs are HWIO; torch
BatchNorm (weight, bias, running_mean, running_var) maps to flax
(scale, bias) params + (mean, var) batch stats.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _to_np(v) -> np.ndarray:
    """Accept torch tensors or array-likes without importing torch."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(v) -> np.ndarray:
    return _to_np(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference `.pth` and return the network state dict.

    Handles both full training checkpoints ({'net': ...}; ref
    net_utils.py:289-297) and bare state dicts, and strips DataParallel's
    'module.' prefix (ref net_utils.py:327-341 does the same surgery).
    """
    import torch

    obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "net" in obj:
        obj = obj["net"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def _backbone_map(state: Mapping[str, Any], prefix: str,
                  stage_sizes=(2, 2, 2, 2)) -> tuple[dict, dict]:
    """Map a torchvision-style ResNet trunk state dict to the flax
    `ResNetStride8` subtree. Returns (params_subtree, stats_subtree)."""
    params: dict = {}
    stats: dict = {}

    def put_conv(flax_name, torch_name):
        params[flax_name] = {"kernel": _conv_kernel(state[prefix + torch_name])}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": _to_np(state[prefix + torch_name + ".weight"]),
            "bias": _to_np(state[prefix + torch_name + ".bias"]),
        }
        stats[flax_name] = {
            "mean": _to_np(state[prefix + torch_name + ".running_mean"]),
            "var": _to_np(state[prefix + torch_name + ".running_var"]),
        }

    put_conv("Conv_0", "conv1.weight")
    put_bn("BatchNorm_0", "bn1")

    idx = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for j in range(n_blocks):
            t = f"layer{stage}.{j}."
            blk_p: dict = {}
            blk_s: dict = {}

            def bput_conv(flax_name, torch_name):
                blk_p[flax_name] = {"kernel": _conv_kernel(state[prefix + t + torch_name])}

            def bput_bn(flax_name, torch_name):
                blk_p[flax_name] = {
                    "scale": _to_np(state[prefix + t + torch_name + ".weight"]),
                    "bias": _to_np(state[prefix + t + torch_name + ".bias"]),
                }
                blk_s[flax_name] = {
                    "mean": _to_np(state[prefix + t + torch_name + ".running_mean"]),
                    "var": _to_np(state[prefix + t + torch_name + ".running_var"]),
                }

            bput_conv("Conv_0", "conv1.weight")
            bput_bn("BatchNorm_0", "bn1")
            bput_conv("Conv_1", "conv2.weight")
            bput_bn("BatchNorm_1", "bn2")
            if prefix + t + "downsample.0.weight" in state:
                bput_conv("Conv_2", "downsample.0.weight")
                bput_bn("BatchNorm_2", "downsample.1")
            params[f"BasicBlock_{idx}"] = blk_p
            stats[f"BasicBlock_{idx}"] = blk_s
            idx += 1
    return params, stats


def _check_tree(loaded, reference, path="") -> None:
    """Raise on any shape/structure mismatch between the converted subtree
    and the model's initialized subtree (strict: catches renamed layers)."""
    if isinstance(reference, Mapping) or isinstance(loaded, Mapping):
        lk, rk = set(loaded.keys()), set(reference.keys())
        if lk != rk:
            raise ValueError(
                f"structure mismatch at '{path}': converted={sorted(lk)} "
                f"model={sorted(rk)}"
            )
        for k in rk:
            _check_tree(loaded[k], reference[k], f"{path}/{k}")
        return
    if tuple(np.shape(loaded)) != tuple(np.shape(reference)):
        raise ValueError(
            f"shape mismatch at '{path}': converted={np.shape(loaded)} "
            f"model={np.shape(reference)}"
        )


def import_pvnet_state_dict(state: Mapping[str, Any], variables) -> dict:
    """Convert a full reference `Resnet18` state dict into this framework's
    PVNet variables ({'params', 'batch_stats'}), validated leaf-by-leaf
    against the initialized `variables` structure.

    Torch module → flax module (names per lib/networks/pvnet/resnet18.py:9-59):
      resnet18_8s.{conv1,bn1,layerN,fc} → backbone
      conv8s/conv4s/conv2s (conv+bn)    → conv_{8s,4s,2s} + bn_{8s,4s,2s}
      convraw.{0,1}                     → conv_raw + bn_raw
      convraw.3 (1x1, bias)             → head
    """
    bb_params, bb_stats = _backbone_map(state, "resnet18_8s.")
    # fc head-conv (ref resnet18.py:23-28 replaces fc with conv3x3+bn+relu)
    bb_params["Conv_1"] = {"kernel": _conv_kernel(state["resnet18_8s.fc.0.weight"])}
    bb_params["BatchNorm_1"] = {
        "scale": _to_np(state["resnet18_8s.fc.1.weight"]),
        "bias": _to_np(state["resnet18_8s.fc.1.bias"]),
    }
    bb_stats["BatchNorm_1"] = {
        "mean": _to_np(state["resnet18_8s.fc.1.running_mean"]),
        "var": _to_np(state["resnet18_8s.fc.1.running_var"]),
    }

    params: dict = {"backbone": bb_params}
    stats: dict = {"backbone": bb_stats}
    for torch_name, flax_name in (
        ("conv8s", "8s"), ("conv4s", "4s"), ("conv2s", "2s"), ("convraw", "raw"),
    ):
        params[f"conv_{flax_name}"] = {
            "kernel": _conv_kernel(state[f"{torch_name}.0.weight"])
        }
        params[f"bn_{flax_name}"] = {
            "scale": _to_np(state[f"{torch_name}.1.weight"]),
            "bias": _to_np(state[f"{torch_name}.1.bias"]),
        }
        stats[f"bn_{flax_name}"] = {
            "mean": _to_np(state[f"{torch_name}.1.running_mean"]),
            "var": _to_np(state[f"{torch_name}.1.running_var"]),
        }
    params["head"] = {
        "kernel": _conv_kernel(state["convraw.3.weight"]),
        "bias": _to_np(state["convraw.3.bias"]),
    }

    out = {"params": params, "batch_stats": stats}
    _check_tree(out["params"], variables["params"])
    _check_tree(out["batch_stats"], variables["batch_stats"])
    return out


def import_resnet_backbone(state: Mapping[str, Any], variables) -> dict:
    """Initialize only the backbone trunk from a torchvision ImageNet
    `resnet18` state dict (the reference's pretrained init, ref
    resnet.py:223-232); decoder/fc stay at their current values.

    Returns new variables (copies; input untouched).
    """
    bb_params, bb_stats = _backbone_map(state, "")
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    bb_p = dict(params["backbone"])
    bb_s = dict(stats["backbone"])
    for k, v in bb_params.items():
        _check_tree(v, bb_p[k], f"backbone/{k}")
        bb_p[k] = v
    for k, v in bb_stats.items():
        if v:  # blocks without BN stats (none in practice) stay as-is
            _check_tree(v, bb_s[k], f"backbone/{k}")
            bb_s[k] = v
    params["backbone"] = bb_p
    stats["backbone"] = bb_s
    return {"params": params, "batch_stats": stats}


def export_pvnet_state_dict(variables) -> dict:
    """Inverse of `import_pvnet_state_dict`: emit a reference-layout torch
    state dict (numpy values, OIHW convs) from flax variables — lets models
    trained here be evaluated by the reference stack."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict = {}

    def conv(name, p):
        out[name + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)

    def bn(name, p, s):
        out[name + ".weight"] = np.asarray(p["scale"])
        out[name + ".bias"] = np.asarray(p["bias"])
        out[name + ".running_mean"] = np.asarray(s["mean"])
        out[name + ".running_var"] = np.asarray(s["var"])

    bb_p, bb_s = params["backbone"], stats["backbone"]
    conv("resnet18_8s.conv1", bb_p["Conv_0"])
    bn("resnet18_8s.bn1", bb_p["BatchNorm_0"], bb_s["BatchNorm_0"])
    idx = 0
    for stage, n_blocks in enumerate((2, 2, 2, 2), start=1):
        for j in range(n_blocks):
            blk_p, blk_s = bb_p[f"BasicBlock_{idx}"], bb_s[f"BasicBlock_{idx}"]
            t = f"resnet18_8s.layer{stage}.{j}"
            conv(t + ".conv1", blk_p["Conv_0"])
            bn(t + ".bn1", blk_p["BatchNorm_0"], blk_s["BatchNorm_0"])
            conv(t + ".conv2", blk_p["Conv_1"])
            bn(t + ".bn2", blk_p["BatchNorm_1"], blk_s["BatchNorm_1"])
            if "Conv_2" in blk_p:
                conv(t + ".downsample.0", blk_p["Conv_2"])
                bn(t + ".downsample.1", blk_p["BatchNorm_2"], blk_s["BatchNorm_2"])
            idx += 1
    conv("resnet18_8s.fc.0", bb_p["Conv_1"])
    bn("resnet18_8s.fc.1", bb_p["BatchNorm_1"], bb_s["BatchNorm_1"])

    for torch_name, flax_name in (
        ("conv8s", "8s"), ("conv4s", "4s"), ("conv2s", "2s"), ("convraw", "raw"),
    ):
        conv(f"{torch_name}.0", params[f"conv_{flax_name}"])
        bn(f"{torch_name}.1", params[f"bn_{flax_name}"], stats[f"bn_{flax_name}"])
    out["convraw.3.weight"] = np.asarray(
        params["head"]["kernel"]).transpose(3, 2, 0, 1)
    out["convraw.3.bias"] = np.asarray(params["head"]["bias"])
    return out

"""Fold frozen BatchNorms into adjacent convolutions (inference transform).

The CLIP ResNet tower is a frozen feature extractor (the reference never
trains it — model.eval() at load, clip/model.py:436), so every BatchNorm is
an affine transform of running statistics:

    bn(conv(x)) = conv(x) * inv + shift
                = conv_with(kernel * inv, bias = shift)(x)

with ``inv = scale / sqrt(var + eps)`` and ``shift = bias - mean * inv``.
``fold_resnet_bn`` rewrites a converted variable tree into the parameters of
the ``fuse_bn=True`` model variant (models/resnet.py): scaled conv kernels
with explicit biases, no batch_stats collection for the visual tower.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_EPS = 1e-5

# conv name -> bn name pairs inside each ResNet scope
_STEM_PAIRS = [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
_BLOCK_PAIRS = _STEM_PAIRS + [("downsample_conv", "downsample_bn")]


def _fold_pair(conv_params: Dict[str, Any], bn_params: Dict[str, Any], bn_stats):
    inv = np.asarray(bn_params["scale"], np.float64) / np.sqrt(
        np.asarray(bn_stats["var"], np.float64) + _EPS
    )
    shift = np.asarray(bn_params["bias"], np.float64) - np.asarray(
        bn_stats["mean"], np.float64
    ) * inv
    kernel = np.asarray(conv_params["kernel"], np.float64) * inv  # [kh,kw,I,O]*[O]
    return {
        "kernel": kernel.astype(np.float32),
        "bias": shift.astype(np.float32),
    }


def fold_resnet_bn(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Variables of a ModifiedResNet CLIP -> variables for ``fuse_bn=True``.

    Non-visual collections pass through untouched; the visual batch_stats
    disappear.  Raises if the tree has no visual BatchNorms (e.g. a ViT)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    visual_p = params["visual"]
    visual_s = stats.get("visual")
    if visual_s is None:
        raise ValueError("no visual batch_stats to fold (ViT tower?)")

    new_visual: Dict[str, Any] = {}
    for name, sub in visual_p.items():
        if name.startswith("bn"):
            continue  # folded into the stem convs
        if name.startswith("conv"):
            bn_name = "bn" + name[len("conv"):]
            new_visual[name] = _fold_pair(sub, visual_p[bn_name], visual_s[bn_name])
        elif name.startswith("layer"):
            block_p: Dict[str, Any] = {}
            for conv_name, bn_name in _BLOCK_PAIRS:
                if conv_name not in sub:
                    continue
                block_p[conv_name] = _fold_pair(
                    sub[conv_name], sub[bn_name], visual_s[name][bn_name]
                )
            new_visual[name] = block_p
        else:  # attnpool etc.
            new_visual[name] = sub

    new_params = dict(params)
    new_params["visual"] = new_visual
    out = {"params": new_params}
    other_stats = {k: v for k, v in stats.items() if k != "visual"}
    if other_stats:
        out["batch_stats"] = other_stats
    return out

"""OpenAI CLIP checkpoint -> Flax variables converter.

Parity surface: reference ``build_model`` (clip/model.py:399-436) infers the
architecture from state-dict shapes (ViT iff ``visual.proj`` present; ResNet
stage depths from ``visual.layerN`` key counts; resolutions from positional-
embedding lengths).  ``config_from_state_dict`` reproduces that inference;
``variables_from_state_dict`` remaps tensors into this package's Flax tree:

- torch Linear ``weight [out, in]``       -> Dense ``kernel [in, out]`` (T)
- torch Conv2d ``weight [O, I, kh, kw]``  -> Conv ``kernel [kh, kw, I, O]``
- packed ``attn.in_proj_weight [3D, D]``  -> separate q/k/v Dense kernels
- ViT patch conv ``[W, 3, P, P]``         -> patch GEMM kernel ``[P*P*3, W]``
  flattened in (row, col, channel) order (models/vit.py layout contract)
- BatchNorm running stats                 -> ``batch_stats`` collection (fp32)

All tensors are cast to fp32 (OpenAI ships fp16 — clip/model.py:375-396); the
compute dtype is a property of the model, not the parameters.

``torch`` is imported lazily: it is only needed to *read* a ``.pt`` file, the
converted output is pure numpy / Orbax.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from debiasing_multi_modal_tpu.models.config import CLIPConfig


def load_openai_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read an OpenAI CLIP ``.pt`` (TorchScript archive or raw state dict)
    into a flat {name: float32 ndarray} dict.  Mirrors the jit/state-dict
    fallback of reference clip/clip.py:120-143."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        state_dict = model.state_dict()
    except RuntimeError:
        # weights_only=False: torch >= 2.6 defaults to weights_only=True,
        # which raises UnpicklingError on whole-module saves — the exact
        # input this fallback exists for (reference clip.py:129-137).  The
        # zoo path is trusted: downloads are sha256-verified before load.
        obj = torch.load(path, map_location="cpu", weights_only=False)
        state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {
        k: v.detach().cpu().float().numpy()
        for k, v in state_dict.items()
        if isinstance(v, torch.Tensor)
    }


def config_from_state_dict(sd: Mapping[str, np.ndarray], name: str = "converted") -> CLIPConfig:
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            {
                m.group(1)
                for k in sd
                if (m := re.match(r"visual\.transformer\.resblocks\.(\d+)\.", k))
            }
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        pos_rows = sd["visual.positional_embedding"].shape[0]
        grid = round((pos_rows - 1) ** 0.5)
        if grid ** 2 + 1 != pos_rows:
            # same square-grid sanity as the RN attnpool check below
            raise ValueError(
                f"ViT positional embedding has {pos_rows} rows — not a "
                "square patch grid + 1; corrupt or unsupported checkpoint"
            )
        image_resolution = vision_patch_size * grid
    else:
        counts = []
        for stage in (1, 2, 3, 4):
            blocks = {
                m.group(1)
                for k in sd
                if (m := re.match(rf"visual\.layer{stage}\.(\d+)\.", k))
            }
            counts.append(len(blocks))
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        pos_rows = sd["visual.attnpool.positional_embedding"].shape[0]
        out_width = round((pos_rows - 1) ** 0.5)
        if out_width ** 2 + 1 != pos_rows:
            # the reference's sanity assert (clip/model.py:413): a corrupt
            # or non-square-grid checkpoint must fail HERE, not as an opaque
            # Flax shape mismatch (or a silently wrong resolution) later
            raise ValueError(
                f"attnpool positional embedding has {pos_rows} rows — not a "
                "square spatial grid + 1; corrupt or unsupported checkpoint"
            )
        vision_patch_size = None
        image_resolution = out_width * 32

    embed_dim = sd["text_projection"].shape[1]
    transformer_width = sd["ln_final.weight"].shape[0]
    text_layers = len(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))
        }
    )
    return CLIPConfig(
        name=name,
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=text_layers,
    )


# --------------------------------------------------------------------------- #
# tree building helpers


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _dense(params, path, sd, torch_name):
    _set(params, path + ("kernel",), sd[f"{torch_name}.weight"].T)
    if f"{torch_name}.bias" in sd:
        _set(params, path + ("bias",), sd[f"{torch_name}.bias"])


def _conv(params, path, sd, torch_name):
    _set(params, path + ("kernel",), sd[f"{torch_name}.weight"].transpose(2, 3, 1, 0))


def _bn(params, stats, path, sd, torch_name):
    _set(params, path + ("scale",), sd[f"{torch_name}.weight"])
    _set(params, path + ("bias",), sd[f"{torch_name}.bias"])
    _set(stats, path + ("mean",), sd[f"{torch_name}.running_mean"])
    _set(stats, path + ("var",), sd[f"{torch_name}.running_var"])


def _ln(params, path, sd, torch_name):
    # LayerNormF32 wraps an inner nn.LayerNorm named "ln"
    _set(params, path + ("ln", "scale"), sd[f"{torch_name}.weight"])
    _set(params, path + ("ln", "bias"), sd[f"{torch_name}.bias"])


def _attention_block(params, path, sd, torch_name):
    d = sd[f"{torch_name}.in_proj_weight"].shape[1]
    w = sd[f"{torch_name}.in_proj_weight"]
    b = sd[f"{torch_name}.in_proj_bias"]
    for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
        _set(params, path + (proj, "kernel"), w[i * d : (i + 1) * d].T)
        _set(params, path + (proj, "bias"), b[i * d : (i + 1) * d])
    _dense(params, path + ("out_proj",), sd, f"{torch_name}.out_proj")


def _transformer(params, path, sd, torch_prefix, n_layers):
    for i in range(n_layers):
        t = f"{torch_prefix}.resblocks.{i}"
        p = path + (f"resblocks_{i}",)
        _attention_block(params, p + ("attn",), sd, f"{t}.attn")
        _ln(params, p + ("ln_1",), sd, f"{t}.ln_1")
        _ln(params, p + ("ln_2",), sd, f"{t}.ln_2")
        _dense(params, p + ("mlp", "c_fc"), sd, f"{t}.mlp.c_fc")
        _dense(params, p + ("mlp", "c_proj"), sd, f"{t}.mlp.c_proj")


def variables_from_state_dict(
    sd: Mapping[str, np.ndarray], config: CLIPConfig = None
) -> Dict[str, Any]:
    """Build the {'params': ..., 'batch_stats': ...} variable tree."""
    cfg = config or config_from_state_dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    v = ("visual",)
    if cfg.is_vit:
        pk = sd["visual.conv1.weight"]  # [W, 3, P, P]
        patch_kernel = pk.transpose(2, 3, 1, 0).reshape(-1, pk.shape[0])
        _set(params, v + ("patch_kernel",), patch_kernel)
        _set(params, v + ("class_embedding",), sd["visual.class_embedding"])
        _set(params, v + ("positional_embedding",), sd["visual.positional_embedding"])
        _ln(params, v + ("ln_pre",), sd, "visual.ln_pre")
        _ln(params, v + ("ln_post",), sd, "visual.ln_post")
        _set(params, v + ("proj",), sd["visual.proj"])
        _transformer(
            params, v + ("transformer",), sd, "visual.transformer", cfg.vision_layers
        )
    else:
        for i in (1, 2, 3):
            _conv(params, v + (f"conv{i}",), sd, f"visual.conv{i}")
            _bn(params, stats, v + (f"bn{i}",), sd, f"visual.bn{i}")
        for stage, blocks in zip((1, 2, 3, 4), cfg.vision_layers):
            for blk in range(blocks):
                t = f"visual.layer{stage}.{blk}"
                p = v + (f"layer{stage}_{blk}",)
                for c in (1, 2, 3):
                    _conv(params, p + (f"conv{c}",), sd, f"{t}.conv{c}")
                    _bn(params, stats, p + (f"bn{c}",), sd, f"{t}.bn{c}")
                if f"{t}.downsample.0.weight" in sd:
                    _conv(params, p + ("downsample_conv",), sd, f"{t}.downsample.0")
                    _bn(params, stats, p + ("downsample_bn",), sd, f"{t}.downsample.1")
        ap = v + ("attnpool",)
        _set(params, ap + ("positional_embedding",), sd["visual.attnpool.positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            _dense(params, ap + (proj,), sd, f"visual.attnpool.{proj}")

    t = ("text",)
    _set(params, t + ("token_embedding", "embedding"), sd["token_embedding.weight"])
    _set(params, t + ("positional_embedding",), sd["positional_embedding"])
    _ln(params, t + ("ln_final",), sd, "ln_final")
    _set(params, t + ("text_projection",), sd["text_projection"])
    _transformer(params, t + ("transformer",), sd, "transformer", cfg.transformer_layers)

    _set(params, ("logit_scale",), sd["logit_scale"])
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def _adapter_mlp_from_torch(sd: Mapping[str, np.ndarray], prefix: str):
    """Reference ``Adapter`` state (``layers.0`` Linear / ``layers.1``
    BatchNorm1d / ``layers.3`` Linear, final_main.py:160-174) -> AdapterMLP
    params + batch_stats."""
    params = {
        "fc1": {
            "kernel": np.asarray(sd[f"{prefix}layers.0.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{prefix}layers.0.bias"], np.float32),
        },
        "bn": {
            "scale": np.asarray(sd[f"{prefix}layers.1.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}layers.1.bias"], np.float32),
        },
        "fc2": {
            "kernel": np.asarray(sd[f"{prefix}layers.3.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{prefix}layers.3.bias"], np.float32),
        },
    }
    stats = {
        "bn": {
            "mean": np.asarray(sd[f"{prefix}layers.1.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}layers.1.running_var"], np.float32),
        }
    }
    return params, stats


def adapter_variables_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference adapter checkpoint (CustomCLIP or MultipleAdapter
    state dict, e.g. trained_model/*.pth) into this package's classifier
    variables."""
    if any(k.startswith("old_cls.") for k in sd):
        old_p, old_s = _adapter_mlp_from_torch(sd, "old_cls.adapter.")
        new_p, new_s = _adapter_mlp_from_torch(sd, "new_adapter.")
        return {
            "params": {"old": old_p, "new": new_p},
            "batch_stats": {"old": old_s, "new": new_s},
        }
    p, s = _adapter_mlp_from_torch(sd, "adapter.")
    return {"params": {"adapter": p}, "batch_stats": {"adapter": s}}


def _adapter_mlp_to_torch(params, stats, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}layers.0.weight"] = np.asarray(params["fc1"]["kernel"], np.float32).T
    out[f"{prefix}layers.0.bias"] = np.asarray(params["fc1"]["bias"], np.float32)
    out[f"{prefix}layers.1.weight"] = np.asarray(params["bn"]["scale"], np.float32)
    out[f"{prefix}layers.1.bias"] = np.asarray(params["bn"]["bias"], np.float32)
    out[f"{prefix}layers.1.running_mean"] = np.asarray(stats["bn"]["mean"], np.float32)
    out[f"{prefix}layers.1.running_var"] = np.asarray(stats["bn"]["var"], np.float32)
    out[f"{prefix}layers.1.num_batches_tracked"] = np.asarray(0, np.int64)
    out[f"{prefix}layers.3.weight"] = np.asarray(params["fc2"]["kernel"], np.float32).T
    out[f"{prefix}layers.3.bias"] = np.asarray(params["fc2"]["bias"], np.float32)


def adapter_variables_to_torch(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`adapter_variables_from_torch`: export this package's
    trained adapter variables as the reference's state-dict layout
    (final_main.py:160-174 ``Adapter`` under ``adapter.`` / MultipleAdapter's
    ``old_cls.adapter.`` + ``new_adapter.``), so adapters trained here load
    directly into the reference's evaluation code via
    ``torch.load``-compatible arrays (wrap values with ``torch.tensor`` or
    save with ``torch.save({k: torch.tensor(v) ...})``)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    if "old" in params:
        _adapter_mlp_to_torch(params["old"], stats["old"], "old_cls.adapter.", out)
        _adapter_mlp_to_torch(params["new"], stats["new"], "new_adapter.", out)
    else:
        _adapter_mlp_to_torch(params["adapter"], stats["adapter"], "adapter.", out)
    return out


def save_jit_state_dict_archive(sd: Mapping[str, Any], path: str) -> None:
    """Wrap a flat state dict in a TorchScript archive whose ``state_dict()``
    reproduces the keys byte-for-byte — the distribution format of the
    OpenAI checkpoints (``torch.jit.load(...).state_dict()``, reference
    clip/clip.py:129,136).  The inverse of :func:`load_openai_checkpoint`;
    used by the conversion rehearsal tests and the synthetic-fixture
    generator so both emulate the same archive shape."""
    import torch

    root = torch.nn.Module()
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            child = getattr(node, p, None)
            if child is None:
                child = torch.nn.Module()
                node.add_module(p, child)
            node = child
        node.register_buffer(parts[-1], torch.as_tensor(val))
    root.forward = lambda: torch.zeros(1)
    torch.jit.trace(root, ()).save(path)


def save_orbax(variables, path: str):
    """Persist converted variables with Orbax (the framework's native format)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, variables)


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)

"""Stage A CLI: embedding extraction + zero-shot prediction.

Parity surface: reference ``clip_inference.py`` argparse (:274-286) and main
flow (:29-271).  Usage:

    python -m debiasing_multi_modal_tpu.cli.extract_main \
        --data_dir data --dataset waterbirds --embedding_dir embeddings_unnormalized \
        --save --split all --backbone RN50 --checkpoint /path/to/RN50.pt

Differences from the reference (documented, intentional):
- ``--checkpoint`` points at a local OpenAI ``.pt`` (no network download in
  this environment); omit it to run with random weights (pipeline testing).
- output is written BOTH as the reference ``clip.json`` schema and as the
  native ``clip.npz`` (``--format`` selects).
- the reference's broken ``run.sweeping.ca`` template import
  (clip_inference.py:17) is simply the root template registry here.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("clip embedding extraction")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--dataset", default="celeba", choices=["celeba", "waterbirds"])
    p.add_argument("--split", default="all", choices=["train", "val", "test", "all"])
    p.add_argument(
        "--backbone",
        default="RN50",
        choices=[
            "RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
            "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px",
        ],
    )
    p.add_argument("--normalized", default=False, action="store_true",
                   help="store L2-normalized embeddings (reference stores un-normalized)")
    p.add_argument("--embedding_dir", default="./embeddings")
    p.add_argument("--save", default=False, action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="local OpenAI .pt checkpoint; random init if omitted")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--format", default="both", choices=["json", "npz", "both"])
    p.add_argument("--host_resolution", type=int, default=224,
                   help="host-side resize/crop target; 0 = raw decode, geometry on device")
    p.add_argument("--fuse_bn", action="store_true",
                   help="fold the frozen ResNet BatchNorms into the convs "
                        "(deployment inference variant; ResNet backbones only)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of the first "
                        "split into this directory (TensorBoard/xprof)")
    p.add_argument("--num_workers", type=int, default=None,
                   help="decode threads (reference DataLoader num_workers, "
                        "clip_inference.py:123); default = host cpu count")
    p.add_argument("--shard_every", type=int, default=0,
                   help="crash-safe mode: persist a result shard every N "
                        "batches; a re-run resumes after the last complete "
                        "shard instead of starting over")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int8_pallas"],
                   help="dynamic W8A8 int8 GEMMs in the vision tower "
                        "(ops/quant.py; ViT backbones only — int8 convs "
                        "measured null, docs/DESIGN.md §8). Validate "
                        "accuracy on real data before production use")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard encoder params over a model axis of this size "
                        "(Megatron pattern, parallel/tp.py) on top of data-"
                        "parallel batch sharding; must divide the device "
                        "count and every tower's head count")
    return p


def main(args):
    import jax
    import jax.numpy as jnp

    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    from debiasing_multi_modal_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_persistent_cache()

    from debiasing_multi_modal_tpu.data.embeddings_store import (
        save_embeddings,
        save_text_embeddings,
    )
    from debiasing_multi_modal_tpu.data.groups import load_metadata
    from debiasing_multi_modal_tpu.data.images import image_batches
    from debiasing_multi_modal_tpu.extract.runner import (
        ExtractionRunner,
        encode_text_prompts,
        minority_report,
    )
    from debiasing_multi_modal_tpu.models import create_clip, init_clip
    from debiasing_multi_modal_tpu.templates import get_prompts
    from debiasing_multi_modal_tpu.weights.convert import (
        config_from_state_dict,
        load_openai_checkpoint,
        variables_from_state_dict,
    )

    on_accel = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32

    if args.checkpoint:
        sd = load_openai_checkpoint(args.checkpoint)
        cfg = config_from_state_dict(sd, name=args.backbone).with_dtype(dtype)
        model = create_clip(cfg)
        variables = variables_from_state_dict(sd, cfg)
        print(f"loaded checkpoint {args.checkpoint} ({cfg.name})")
    else:
        model = create_clip(args.backbone, dtype=dtype)
        variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
        print(f"WARNING: no --checkpoint given; {args.backbone} runs with random weights")

    if args.fuse_bn:
        from debiasing_multi_modal_tpu.weights.fold import fold_resnet_bn

        if model.config.is_vit:
            raise SystemExit("--fuse_bn applies to ResNet backbones only")
        variables = fold_resnet_bn(jax.device_get(variables))
        model = create_clip(model.config, fuse_bn=True)
        print("folded frozen BatchNorms into the convolutions")

    if args.quantize != "none":
        if not model.config.is_vit:
            raise SystemExit("--quantize applies to ViT backbones only "
                             "(int8 convs measured null, docs/DESIGN.md §8)")
        # same variables — the W8A8 path quantizes in-graph (ops/quant.py),
        # so the converted checkpoint tree loads unchanged
        model = create_clip(model.config, quant=args.quantize)
        print(f"vision tower Dense GEMMs running {args.quantize} W8A8")

    prompts = get_prompts(args.dataset)
    text = encode_text_prompts(
        model,
        variables,
        {
            "class": prompts.prompts("class"),
            "spurious": prompts.prompts("spurious"),
            "group": prompts.prompts("group"),
        },
        templates_per_phrase=len(prompts.templates),
    )

    emb_root = os.path.join(args.data_dir, args.embedding_dir, args.dataset)
    if args.save:
        os.makedirs(emb_root, exist_ok=True)
        tpp = len(prompts.templates)
        for kind in ("class", "spurious", "group"):
            # text[kind] has ONE pooled row per phrase; with a multi-template
            # set, key each row by its FIRST template's rendering (the
            # reference always runs one template, clip_inference.py:63-74)
            save_text_embeddings(
                os.path.join(emb_root, f"clip_{kind}.json"),
                list(prompts.prompts(kind))[::tpp],
                text[kind],
            )
            print(f"save text emb ({kind})")

    tp = args.tensor_parallel
    if tp > 1:
        from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % tp:
            raise SystemExit(
                f"--tensor_parallel {tp} does not divide {n_dev} devices"
            )
        mesh = make_mesh((n_dev // tp, tp), ("data", "model"))
    else:
        mesh = None
    runner = ExtractionRunner(
        model, variables, text["class"], normalized=args.normalized,
        mesh=mesh, tensor_parallel=tp > 1,
    )

    if args.dataset == "waterbirds":
        image_root = os.path.join(
            args.data_dir, "waterbirds", "waterbird_complete95_forest2water2"
        )
        meta_root = image_root
        path_for = None
    else:
        meta_root = os.path.join(args.data_dir, "celeba")
        img_dir = os.path.join(meta_root, "img_align_celeba", "img_align_celeba")
        path_for = lambda fn: os.path.join(img_dir, fn)  # noqa: E731
        image_root = img_dir

    splits = ["train", "val", "test"] if args.split == "all" else [args.split]
    host_res = args.host_resolution or None
    tables = []
    for split in splits:
        meta = load_metadata(args.dataset, meta_root, split)
        t0 = time.time()
        shard_dir = None
        shard_meta = None
        if args.shard_every:
            shard_dir = os.path.join(
                emb_root, args.backbone.replace("/", "-"), f"shards_{split}"
            )
            # fingerprint the settings that change the persisted numbers —
            # resuming into shards from a different configuration is an error
            shard_meta = {
                "backbone": args.backbone,
                "checkpoint": args.checkpoint or "random",
                "normalized": bool(getattr(args, "normalized", False)),
                "fuse_bn": bool(args.fuse_bn),
                "batch_size": args.batch_size,
                "host_resolution": args.host_resolution,
                "split": split,
                # backend-dependent numerics: a resume whose backend fell
                # back to CPU (fp32) or whose tp width changed would merge
                # numerically different shards without these
                "compute_dtype": jnp.dtype(dtype).name,
                "tensor_parallel": tp,
                "quantize": args.quantize,
            }
        from debiasing_multi_modal_tpu.utils.profiling import trace

        with trace(args.profile_dir or "", enabled=bool(args.profile_dir)
                   and split == splits[0]):
            table = runner.run(
                image_batches(meta, image_root, args.batch_size, host_res,
                              path_for, decode_workers=args.num_workers),
                shard_dir=shard_dir,
                shard_every=args.shard_every,
                shard_meta=shard_meta,
            )  # sharded runs return the merged table across all (resumed) runs
        dt = time.time() - t0
        print(
            f"{split}: {len(table)} images in {dt:.1f}s "
            f"({len(table) / max(dt, 1e-9):.0f} imgs/s)"
        )
        print(minority_report(table.y, table.place, table.y_pred, args.dataset))
        tables.append(table)

    if args.save:
        from debiasing_multi_modal_tpu.data.embeddings_store import EmbeddingTable

        merged = EmbeddingTable(
            filenames=np.concatenate([t.filenames for t in tables]),
            y=np.concatenate([t.y for t in tables]),
            place=np.concatenate([t.place for t in tables]),
            group=np.concatenate([t.group for t in tables]),
            split=np.concatenate([t.split for t in tables]),
            y_pred=np.concatenate([t.y_pred for t in tables]),
            embeddings=np.concatenate([t.embeddings for t in tables]),
        )
        out_dir = os.path.join(emb_root, args.backbone.replace("/", "-"))
        os.makedirs(out_dir, exist_ok=True)
        if args.format in ("json", "both"):
            save_embeddings(
                os.path.join(out_dir, "clip.json"), merged, fmt="json",
                dataset=args.dataset,
            )
        if args.format in ("npz", "both"):
            save_embeddings(os.path.join(out_dir, "clip.npz"), merged, fmt="npz")
        print(f"dataset size: {len(merged)}")
        print("save img and pred")




def _entry():
    """console-script entry point (pyproject.toml)."""
    sys.exit(main(build_parser().parse_args()))


if __name__ == "__main__":
    _entry()

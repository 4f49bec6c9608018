#!/usr/bin/env python
"""Build a synthetic on-disk fixture for the full reproduction chain.

    python scripts/make_synthetic_fixture.py ROOT [--n_per_split N] [--res R]

Creates, under ROOT, everything `scripts/reproduce_all.sh` needs when the
real assets (Waterbirds/CelebA images, OpenAI RN50 checkpoint) are absent:

- ``waterbirds/waterbird_complete95_forest2water2/`` — JPEG tree +
  ``metadata.csv`` in the Group-DRO layout the parsers expect
  (reference data/waterbirds.py:30-44),
- ``celeba/`` — ``img_align_celeba/img_align_celeba`` JPEG tree +
  ``list_attr_celeba.csv`` / ``list_eval_partition.csv``
  (reference data/celeba.py:22-30),
- ``RN50.pt`` — a random-valued, shape-sniffable ModifiedResNet CLIP
  checkpoint wrapped in a TorchScript archive exactly as OpenAI distributes
  theirs (reference clip/clip.py:120-143).  Narrow width by default so the
  CPU rehearsal is fast; the full-shape conversion path is pinned separately
  by tests/test_full_shape_conversion.py.

Pixels and weights are random: downstream accuracies are structural
(chance-level), which is what the dress rehearsal checks — the *chain*, not
the science.  See tests/test_reproduce_all.py.
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_MODEL = "/root/reference/clip/model.py"


def _write_images(root, filenames, res, rng):
    for fn in filenames:
        from PIL import Image

        path = os.path.join(root, fn)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arr = (rng.random((res, res + res // 4, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(path)


def make_waterbirds(root: str, n_per_split: int, res: int, rng) -> None:
    base = os.path.join(root, "waterbirds", "waterbird_complete95_forest2water2")
    os.makedirs(base, exist_ok=True)
    rows = ["img_id,img_filename,y,split,place"]
    filenames = []
    k = 0
    for split in range(3):
        for _ in range(n_per_split):
            fn = f"imgs/{k:05d}.jpg"
            filenames.append(fn)
            rows.append(
                f"{k},{fn},{int(rng.integers(0, 2))},{split},{int(rng.integers(0, 2))}"
            )
            k += 1
    with open(os.path.join(base, "metadata.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    _write_images(base, filenames, res, rng)


def make_celeba(root: str, n_per_split: int, res: int, rng) -> None:
    base = os.path.join(root, "celeba")
    img_dir = os.path.join(base, "img_align_celeba", "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    attrs = ["image_id,Blond_Hair,Male"]
    parts = ["image_id,partition"]
    filenames = []
    k = 0
    for split in range(3):
        for _ in range(n_per_split):
            fn = f"{k:06d}.jpg"
            filenames.append(fn)
            blond = 1 if rng.random() < 0.5 else -1
            male = 1 if rng.random() < 0.5 else -1
            attrs.append(f"{fn},{blond},{male}")
            parts.append(f"{fn},{split}")
            k += 1
    with open(os.path.join(base, "list_attr_celeba.csv"), "w") as f:
        f.write("\n".join(attrs) + "\n")
    with open(os.path.join(base, "list_eval_partition.csv"), "w") as f:
        f.write("\n".join(parts) + "\n")
    _write_images(img_dir, filenames, res, rng)


def make_checkpoint(path: str, width: int = 8) -> None:
    """Random-valued narrow ModifiedResNet CLIP in a TorchScript archive.

    Shape-sniffing (weights/convert.py::config_from_state_dict, mirroring
    reference clip/model.py:399-436) recovers the architecture from the
    tensors, so a narrow model exercises the identical load path.
    """
    import torch

    spec = importlib.util.spec_from_file_location("ref_clip_model", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    # vocab must cover real BPE token ids (tokenizer/bpe.py): 49408
    model = mod.CLIP(width * 32, 224, (1, 1, 1, 1), width, None, 77, 49408, 64, 1, 1)
    sd = model.float().state_dict()

    from debiasing_multi_modal_tpu.weights.convert import (
        save_jit_state_dict_archive,
    )

    save_jit_state_dict_archive(sd, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n_per_split", type=int, default=24)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--width", type=int, default=8, help="RN vision width")
    ap.add_argument("--skip_checkpoint", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    os.makedirs(args.root, exist_ok=True)
    make_waterbirds(args.root, args.n_per_split, args.res, rng)
    make_celeba(args.root, args.n_per_split, args.res, rng)
    if not args.skip_checkpoint:
        if os.path.isfile(REFERENCE_MODEL):
            make_checkpoint(os.path.join(args.root, "RN50.pt"), args.width)
        else:
            print("NOTE: reference tree absent; skipping checkpoint fixture")
    print(f"synthetic fixture ready under {args.root}")


if __name__ == "__main__":
    main()

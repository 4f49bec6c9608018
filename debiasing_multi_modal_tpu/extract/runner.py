"""Stage A: batched embedding extraction + zero-shot prediction.

Parity surface: reference ``clip_inference.py`` ``main`` (:29-271) —

- text: encode every templated class / spurious / group prompt, average over
  the template set per phrase, store UN-normalized (:55-84); dump the three
  ``clip_{class,spurious,group}.json`` files (:93-106).
- images: for each split, encode image batches, compute zero-shot logits
  against the normalized class weights at temperature 0.02 (:124-137),
  argmax predictions, minority-group bookkeeping (:142-153), and dump the
  per-image record table ``clip.json`` (:159-271).

TPU-native design: the whole per-batch pipeline — on-device preprocessing,
bf16 encoder forward, f32 zero-shot head — is ONE jitted function,
data-parallel over the mesh 'data' axis (params replicated, batch sharded;
XLA lays the all-gather of results).  Per-sample record building (the
reference's throughput killer, SURVEY.md §3.1) is replaced by batch-level
array accumulation into the columnar EmbeddingTable.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.data.embeddings_store import EmbeddingTable
from debiasing_multi_modal_tpu.models.clip import CLIP, l2_normalize
from debiasing_multi_modal_tpu.ops.preprocess import normalize_only, preprocess_uint8
from debiasing_multi_modal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
)
from debiasing_multi_modal_tpu.templates import DatasetPrompts
from debiasing_multi_modal_tpu.tokenizer import tokenize

ZS_TEMPERATURE = 0.02  # clip_inference.py:124


def encode_text_prompts(
    model: CLIP,
    variables,
    prompt_sets: Dict[str, Sequence[str]],
    templates_per_phrase: int = 1,
) -> Dict[str, np.ndarray]:
    """Encode prompt sets -> {kind: [C, D] un-normalized float32}.

    Multiple templates per phrase are mean-pooled (the reference averages the
    per-template embeddings before storing, clip_inference.py:63-65).
    """
    out = {}
    encode = jax.jit(functools.partial(model.apply, method=model.encode_text))
    for kind, prompts in prompt_sets.items():
        tokens = jnp.asarray(tokenize(list(prompts)))
        emb = np.asarray(encode(variables, tokens), np.float32)
        if templates_per_phrase > 1:
            emb = emb.reshape(-1, templates_per_phrase, emb.shape[-1]).mean(axis=1)
        out[kind] = emb
    return out


class ExtractionRunner:
    """Data-parallel image-embedding extraction over a device mesh."""

    def __init__(
        self,
        model: CLIP,
        variables,
        zeroshot_text: np.ndarray,  # [C, D] un-normalized class text embeddings
        mesh=None,
        preprocessed: bool = False,
        normalized: bool = False,
    ):
        self.model = model
        self.mesh = mesh or make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.preprocessed = preprocessed
        self.normalized = normalized  # --normalized flag: store normalized embeddings

        rep = replicated(self.mesh)
        self.variables = jax.device_put(variables, rep)
        # [D, C] normalized zero-shot weight matrix (stacked dim=1, :77)
        w = zeroshot_text.T.astype(np.float32)
        self.zs_weights = jax.device_put(jnp.asarray(w), rep)
        self._step = self._build_step()

    def _build_step(self):
        model = self.model
        preprocessed = self.preprocessed
        normalized = self.normalized
        data_sh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)

        def step(variables, zs_weights, images):
            if preprocessed:
                x = normalize_only(images.astype(jnp.float32) / 255.0, model.config.dtype)
            else:
                x = preprocess_uint8(
                    images, model.config.image_resolution, dtype=model.config.dtype
                )
            feats = model.apply(variables, x, method=model.encode_image)
            feats32 = feats.astype(jnp.float32)
            normed = l2_normalize(feats32)
            logits = (
                jnp.matmul(normed, zs_weights, precision=jax.lax.Precision.HIGHEST)
                / ZS_TEMPERATURE
            )
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            stored = normed if normalized else feats32
            return stored, preds

        return jax.jit(
            step,
            in_shardings=(rep, rep, data_sh),
            out_shardings=(data_sh, data_sh),
        )

    def encode_batch_async(self, images: np.ndarray):
        """Dispatch one batch; returns device arrays (no host sync).

        The batch is padded to a multiple of the mesh size; callers slice
        the first ``b`` rows after conversion.
        """
        b = images.shape[0]
        padded = pad_to_multiple(b, self.n_devices)
        if padded != b:
            images = np.concatenate(
                [images, np.repeat(images[-1:], padded - b, axis=0)], axis=0
            )
        emb, preds = self._step(self.variables, self.zs_weights, jnp.asarray(images))
        return emb, preds, b

    def encode_batch(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 [B, H, W, 3] -> (embeddings [B, D] f32, preds [B] i32)."""
        emb, preds, b = self.encode_batch_async(images)
        return np.asarray(emb)[:b], np.asarray(preds)[:b]

    def run(
        self,
        batches: Iterable[Tuple[np.ndarray, Dict[str, np.ndarray]]],
        prefetch_depth: int = 2,
        max_in_flight: int = 4,
    ) -> EmbeddingTable:
        """Drive extraction over an iterator of (uint8 images, metadata cols).

        Metadata cols must include filenames/y/place/group/split.  Host
        decode overlaps device compute via a background prefetch thread
        (depth 0 disables).  Dispatch runs ``max_in_flight`` batches ahead of
        result conversion — enough to pipeline host and device, bounded so
        queued input buffers and retained outputs can't exhaust HBM on long
        streams.
        """
        if prefetch_depth:
            from debiasing_multi_modal_tpu.data.prefetch import prefetch

            batches = prefetch(batches, depth=prefetch_depth)
        pending = []
        embs, preds = [], []
        cols = {k: [] for k in ("filenames", "y", "place", "group", "split")}

        def drain_one():
            e, p, b = pending.pop(0)
            embs.append(np.asarray(e)[:b])  # host sync = backpressure
            preds.append(np.asarray(p)[:b])

        for images, meta in batches:
            pending.append(self.encode_batch_async(images))
            for k in cols:
                cols[k].append(np.asarray(meta[k]))
            if len(pending) > max_in_flight:
                drain_one()
        while pending:
            drain_one()
        return EmbeddingTable(
            filenames=np.concatenate(cols["filenames"]),
            y=np.concatenate(cols["y"]).astype(np.int32),
            place=np.concatenate(cols["place"]).astype(np.int32),
            group=np.concatenate(cols["group"]).astype(np.int32),
            split=np.concatenate(cols["split"]).astype(np.int32),
            y_pred=np.concatenate(preds),
            embeddings=np.concatenate(embs),
        )


def minority_report(
    y: np.ndarray, place: np.ndarray, preds: np.ndarray, dataset: str
) -> str:
    """Minor-group prediction quality printout (clip_inference.py:142-153,
    184): waterbirds minority = class/background disagree; celeba minority =
    blond man."""
    if dataset == "waterbirds":
        is_minor_pred = ((y == 0) & (preds == 1)) | ((y == 1) & (preds == 0))
        is_minor = ((y == 0) & (place == 1)) | ((y == 1) & (place == 0))
    elif dataset == "celeba":
        is_minor_pred = (y == 1) & (preds == 1)
        is_minor = (y == 1) & (place == 1)
    else:
        raise ValueError(dataset)
    try:
        from sklearn.metrics import classification_report

        return classification_report(is_minor.astype(int), is_minor_pred.astype(int))
    except ImportError:  # pragma: no cover
        tp = int((is_minor & is_minor_pred).sum())
        fp = int((~is_minor & is_minor_pred).sum())
        fn = int((is_minor & ~is_minor_pred).sum())
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        return f"minority precision={prec:.3f} recall={rec:.3f}"

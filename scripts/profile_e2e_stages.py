#!/usr/bin/env python
"""Per-stage budget of the host-fed end-to-end extraction pipeline.

    python scripts/profile_e2e_stages.py [batch] [n_batches]

Measures, back-to-back in ONE process (so both backbones see the same tunnel
conditions — the r2 artifacts measured RN50 and ViT-B/32 in separate runs and
showed an unexplained 1.7x e2e spread, VERDICT r2 missing #5):

  host      stream iteration + metadata build (no device work)
  upload    H2D of one uint8 image batch, forced by a dependent scalar fetch
  kernel    the jitted preprocess+encode+ZS step, accumulator-chained
  download  D2H of one batch's embeddings+preds
  e2e       the real ExtractionRunner.run() pipeline (prefetch + bounded
            in-flight dispatch + host drain)

The pipeline overlaps upload/kernel/download across batches (max_in_flight),
so the e2e floor is ~max(stage costs), not their sum; the table prints both
bounds.  Feeds docs/DESIGN.md §9.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stage_budget(backbone: str, batch: int, n_batches: int, res_in: int = 256):
    from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner
    from debiasing_multi_modal_tpu.models import create_clip
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
    from debiasing_multi_modal_tpu.parallel.packing import packed_host_init
    from debiasing_multi_modal_tpu.utils.timing import (
        chain_time,
        measure_download_ms,
        measure_upload_ms,
    )

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = create_clip(backbone, dtype=dtype)
    variables = packed_host_init(model)

    rng = np.random.default_rng(0)
    text = rng.standard_normal((2, model.config.embed_dim)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((1,)))

    images = (rng.random((batch, res_in, res_in, 3)) * 255).astype(np.uint8)
    zeros = np.zeros(batch, np.int32)
    meta = {
        "filenames": np.char.add("img", np.arange(batch).astype(str)),
        "y": zeros, "place": zeros, "group": zeros, "split": zeros,
    }

    # -- host: stream + metadata handling only
    t0 = time.perf_counter()
    for _ in range(n_batches):
        m = {k: v.copy() for k, v in meta.items()}
        _ = images.shape, m
    host_ms = (time.perf_counter() - t0) / n_batches * 1e3

    # -- upload: force each H2D with a tiny dependent fetch (shared gauge)
    upload_ms = measure_upload_ms(images, iters=n_batches)

    # -- kernel: device-resident inputs, accumulator-chained
    images_dev = jnp.asarray(images)
    kernel_ms = chain_time(
        lambda v, w, x: runner._step(v, w, x)[0],
        runner.variables, runner.zs_weights, images_dev, iters=8,
    )

    # -- download: embeddings + preds, FRESH outputs per iteration (a
    # jax.Array caches its fetched host copy, so re-fetching one array
    # times a cache hit — the round-3 review caught an ~8x underreport)
    download_ms = measure_download_ms(
        lambda: runner._step(runner.variables, runner.zs_weights, images_dev),
        iters=3,
    )

    # -- e2e: the real pipeline
    runner.encode_batch(images)  # one-time full-shape compile outside timing
    t0 = time.perf_counter()
    table = runner.run(
        ((images, meta) for _ in range(n_batches)), prefetch_depth=2
    )
    e2e_s = time.perf_counter() - t0
    assert len(table) == batch * n_batches
    e2e_ms = e2e_s / n_batches * 1e3

    return {
        "backbone": backbone,
        "batch": batch,
        "host_ms": round(host_ms, 1),
        "upload_ms": round(upload_ms, 1),
        "kernel_ms": round(kernel_ms, 1),
        "download_ms": round(download_ms, 1),
        "e2e_ms_per_batch": round(e2e_ms, 1),
        "e2e_imgs_per_sec": round(batch * 1e3 / e2e_ms, 1),
        "overlap_floor_ms": round(
            max(host_ms, upload_ms, kernel_ms, download_ms), 1
        ),
        "serial_sum_ms": round(
            host_ms + upload_ms + kernel_ms + download_ms, 1
        ),
    }


def main():
    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    for backbone in ("RN50", "ViT-B/32"):
        print(json.dumps(stage_budget(backbone, batch, n_batches)))


if __name__ == "__main__":
    main()

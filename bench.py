#!/usr/bin/env python
"""Headline benchmark: CLIP RN50 image-embedding extraction throughput.

Measures imgs/sec/chip through the full Stage-A hot path — on-device
preprocess (resize+crop+normalize from uint8), bf16 RN50 forward, f32
zero-shot head — on whatever accelerator JAX exposes (one TPU chip under the
driver).  Weights are randomly initialized (numerics are irrelevant to
throughput; the architecture and dtypes are the real ones).

Prints ONE JSON line:
  {"metric": "rn50_extract_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec/chip", "vs_baseline": N / 5000.0}

vs_baseline is against the driver-set target of 5,000 imgs/sec/chip
(BASELINE.md).  Set BENCH_BACKBONE (e.g. "ViT-B/32") to measure another
backbone; the metric name follows it.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def wait_for_accelerator(platforms=None):
    """Bounded-wait guard against a hung device tunnel.

    The axon tunnel's failure modes include a TOTAL hang: ``jax.devices()``
    blocks forever in the claim leg (no error, no HTTP 500), so a bench run
    produces zero output and the round records no artifact.  Probe device
    discovery in a SUBPROCESS with a timeout (the hang is in native code —
    in-process alarms don't interrupt it) and retry on a bounded budget, so
    a transiently-down tunnel becomes a wait-and-succeed and a dead one a
    loud exit instead of a silent infinite hang.

    Skipped when the platform is pinned to host CPU (tests / smoke runs),
    where there is no tunnel to probe.
    """
    import subprocess

    if platforms is None:
        platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
            "JAX_PLATFORMS", ""
        )
    if platforms.split(",")[0].strip() == "cpu":
        return
    attempts = int(os.environ.get("BENCH_TUNNEL_PROBE_ATTEMPTS", "10"))
    probe_timeout = float(os.environ.get("BENCH_TUNNEL_PROBE_TIMEOUT_S", "120"))
    retry_sleep = float(os.environ.get("BENCH_TUNNEL_PROBE_SLEEP_S", "60"))
    for i in range(attempts):
        try:
            # the site preset is "axon,cpu": an axon init ERROR (vs hang)
            # silently falls back to CPU devices, so the probe must assert
            # an accelerator actually came up — otherwise a down tunnel
            # would pass the guard and bench would emit a meaningless
            # cpu_smoke artifact in the TPU artifact's place
            subprocess.run(
                [
                    sys.executable, "-c",
                    "import jax; d = jax.devices(); "
                    "assert d and d[0].platform != 'cpu', d",
                ],
                timeout=probe_timeout, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except subprocess.TimeoutExpired:
            msg = f"device discovery hung >{probe_timeout:.0f}s (tunnel down?)"
        except subprocess.CalledProcessError as e:
            msg = f"device discovery failed (exit {e.returncode})"
        print(
            f"bench: {msg} — attempt {i + 1}/{attempts}, retrying in "
            f"{retry_sleep:.0f}s", file=sys.stderr, flush=True,
        )
        if i + 1 < attempts:
            time.sleep(retry_sleep)
    sys.exit("bench: accelerator unreachable after retries — no artifact emitted")


def main():
    wait_for_accelerator()
    from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner
    from debiasing_multi_modal_tpu.models import create_clip, init_clip
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    # steady-state throughput is measured post-compile either way; the cache
    # only removes repeated ~10 s/program compile latency from re-runs
    enable_persistent_cache()

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    dtype = jnp.bfloat16 if on_accel else jnp.float32

    backbone = os.environ.get("BENCH_BACKBONE", "RN50")
    fuse_bn = os.environ.get("BENCH_FUSE_BN", "0") == "1"
    # probe knob: opt-in W8A8 Dense GEMMs (ViT only; ops/quant.py).  The
    # headline artifact stays bf16; set BENCH_QUANT=int8 to measure the
    # quantized mode (the metric name records it — see below).
    quant = os.environ.get("BENCH_QUANT", "none")
    if on_accel:
        # f32 params + bf16 compute: measured 2.3x faster than bf16 params
        # on v5e (XLA picks a better conv algorithm), and it is the
        # accuracy-policy dtype anyway.
        model = create_clip(backbone, dtype=dtype, fuse_bn=fuse_bn, quant=quant)
        batch = int(os.environ.get("BENCH_BATCH", "512"))
        res_in = 256  # exercise the on-device resize+crop path
        iters, warmup = 20, 2
        stage_packed = True  # one-buffer param staging (slow tunnel links)
    else:  # CPU smoke configuration (driver runs on TPU)
        from debiasing_multi_modal_tpu.models.config import CLIPConfig

        model = create_clip(
            CLIPConfig(
                name="tiny-rn",
                embed_dim=64,
                image_resolution=64,
                vision_layers=(1, 1, 1, 1),
                vision_width=8,
                vision_patch_size=None,
                transformer_width=64,
                transformer_heads=1,
                transformer_layers=1,
            )
        )
        batch = 32
        res_in = 72
        iters, warmup = 3, 1
        stage_packed = False
        backbone = "cpu_smoke_tiny_rn"  # metric name reflects what ran
        quant = "none"  # smoke model is RN (quant is ViT-only); never label int8

    if stage_packed:
        # Initialize on host CPU and ship ONE packed buffer: staging ~500
        # leaves individually over the axon tunnel pays a per-buffer round
        # trip (~2x slower).  Throughput is measured with resident weights,
        # so this only affects wall time.
        from debiasing_multi_modal_tpu.parallel.packing import packed_host_init

        variables = packed_host_init(model)
    else:
        variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    if os.environ.get("BENCH_PARAM_DTYPE", "") == "bf16":
        # probe knob: all-bf16 weights (vs the fp32-param policy).  Halves
        # weight HBM traffic; numerics out of policy — measurement only.
        # one jitted program: an eager per-leaf cast would dispatch hundreds
        # of tiny programs over the tunnel (~10 s compile latency each)
        variables = jax.jit(
            lambda v: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                v,
            )
        )(variables)
    text = np.random.default_rng(0).standard_normal(
        (2, model.config.embed_dim)
    ).astype(np.float32)

    n_chips = len(jax.devices())
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((n_chips,)))

    rng = np.random.default_rng(0)
    images = (rng.random((batch, res_in, res_in, 3)) * 255).astype(np.uint8)
    images_dev = jnp.asarray(images)

    # Timing uses an accumulated scalar dependency chain and a final host
    # fetch — block_until_ready alone is not a reliable barrier over the
    # remote-TPU (axon) tunnel.  The step + reduction is ONE jitted program
    # (per-program compile latency over the tunnel is ~10s; eager tail ops
    # would each pay it).
    @jax.jit
    def timed_step(variables, zs_weights, images_dev, acc):
        emb, preds = runner._step(variables, zs_weights, images_dev)
        return acc + emb.astype(jnp.float32).mean() + preds.sum().astype(jnp.float32)

    acc = jnp.float32(0.0)
    for _ in range(warmup):
        acc = timed_step(runner.variables, runner.zs_weights, images_dev, acc)
    float(acc)

    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = timed_step(runner.variables, runner.zs_weights, images_dev, acc)
    float(acc)  # host fetch = hard barrier
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    per_chip = imgs_per_sec / n_chips

    # ---- end-to-end host-fed extraction (VERDICT r1 item 3): drive the real
    # ExtractionRunner.run() pipeline — host uint8 stream, prefetch thread,
    # H2D staging, jitted step, bounded in-flight dispatch, result drain into
    # the columnar table.  On this bench host the TPU sits behind a slow
    # shared tunnel, so this number is dominated by host<->device transfer
    # (batch x 256x256x3 uint8 up + [batch, D] f32 down per step); on a real
    # TPU host it approaches the kernel number.  Reference comparison point:
    # the per-sample hot loop at clip_inference.py:202-257.
    # bound the streamed volume: the tunnel's H2D bandwidth is low/variable,
    # and the e2e number is a pipeline-shape measurement, not a soak test
    n_e2e = max(2, 4096 // batch) if on_accel else 2
    zeros = np.zeros(batch, np.int32)
    meta = {
        "filenames": np.char.add("img", np.arange(batch).astype(str)),
        "y": zeros, "place": zeros, "group": zeros, "split": zeros,
    }

    def stream():
        for _ in range(n_e2e):
            yield images, meta

    # untimed warmup at the FULL batch shape: runner._step is a separate
    # program from timed_step's inlined copy, and its first execution pays
    # the ~10 s tunnel compile — one-time cost, not pipeline throughput
    runner.encode_batch(images)

    # gauge the tunnel's H2D bandwidth at measurement time: the e2e number
    # is upload-bound here (scripts/profile_e2e_stages.py, DESIGN §9), and
    # tunnel bandwidth varies >2x between runs — recording it makes e2e
    # numbers comparable across artifacts
    from debiasing_multi_modal_tpu.utils.timing import measure_upload_ms

    upload_mb_s = images.nbytes / 2**20 / (measure_upload_ms(images) / 1e3)

    t0 = time.perf_counter()
    table = runner.run(stream(), prefetch_depth=2)
    dt_e2e = time.perf_counter() - t0
    assert len(table) == batch * n_e2e
    e2e_per_chip = batch * n_e2e / dt_e2e / n_chips

    # ---- Stage B: adapter-training epochs/sec at Waterbirds scale (4,795
    # train embeddings, D=1024, bs 1024) — the jitted whole-epoch scan,
    # steady state, dependency-chained through the train state.
    from debiasing_multi_modal_tpu.data.samplers import epoch_plan
    from debiasing_multi_modal_tpu.models.adapter import AdapterClassifier
    from debiasing_multi_modal_tpu.train.steps import (
        init_train_state, ones_mask, train_epoch,
    )

    dim = model.config.embed_dim if backbone == "RN50" else 1024
    n_train, tb = (4795, 1024) if on_accel else (256, 64)
    module = AdapterClassifier(hidden_dim=128, temperature=0.01)
    emb_t = jnp.asarray(rng.standard_normal((n_train, dim)).astype(np.float32))
    lab_t = jnp.asarray(rng.integers(0, 2, n_train).astype(np.int32))
    grp_t = jnp.asarray(rng.integers(0, 4, n_train).astype(np.int32))
    text_t = jnp.asarray(rng.standard_normal((dim, 2)).astype(np.float32))
    variables_t = module.init(
        jax.random.PRNGKey(0), emb_t[:2], text_t, train=True
    )
    state_t = init_train_state(variables_t["params"], variables_t["batch_stats"])
    mask_t = ones_mask(variables_t["params"])
    plan = epoch_plan(n_train, tb, shuffle=False)
    idx_t, msk_t = jnp.asarray(plan.indices), jnp.asarray(plan.mask)
    lrs_t = jnp.full((plan.num_batches,), 0.1, jnp.float32)

    def one_epoch(st):
        return train_epoch(
            module, st, emb_t, lab_t, grp_t, idx_t, msk_t, lrs_t, text_t,
            mask_t, n_groups=4, momentum=0.9, weight_decay=5e-5,
        )

    state_t, stats_t = one_epoch(state_t)  # compile + warm
    jax.block_until_ready(state_t.params)
    # One epoch is ~1.5-2 ms on-chip; a single short block is dominated by
    # the tunnel's host-fetch round trip (measured: same-round artifacts
    # 1.55x apart, VERDICT r3 weak #3).  Amortize the RTT with long blocks
    # and take the median over several, reporting the spread.  When the
    # spread exceeds 10% (VERDICT r4 weak #2: one ViT-L artifact hit 0.317)
    # keep adding blocks up to a cap — median over more blocks shrinks the
    # tunnel's per-fetch variance — and ship the raw per-block rates either
    # way so the artifact attributes its own dispersion.
    ep_block, n_blocks, max_blocks = (300, 5, 11) if on_accel else (3, 2, 2)

    def run_block():
        nonlocal state_t, stats_t
        t0 = time.perf_counter()
        for _ in range(ep_block):  # state dependency chains the epochs
            state_t, stats_t = one_epoch(state_t)
        float(stats_t.loss_sum)  # host fetch = barrier
        return ep_block / (time.perf_counter() - t0)

    block_rates = [run_block() for _ in range(n_blocks)]

    def median_spread(rates):
        med = float(np.median(rates))
        return med, (max(rates) - min(rates)) / med

    epochs_per_sec, epochs_spread = median_spread(block_rates)
    while epochs_spread > 0.1 and len(block_rates) < max_blocks:
        block_rates.append(run_block())
        epochs_per_sec, epochs_spread = median_spread(block_rates)
    stage_b_note = None
    if epochs_spread > 0.1 and on_accel:
        # self-describing attribution (VERDICT r4 weak #2): the epochs are a
        # dependency-chained on-chip scan, so block-to-block dispersion can
        # only come from the shared tunnel's host-fetch RTT (one float()
        # per block) or remote-chip contention — the raw rates let a reader
        # see whether it's one outlier block or a drifting baseline.
        stage_b_note = (
            "spread>0.1 after max blocks: tunnel host-fetch RTT variance / "
            "remote-chip contention (rates listed; median is the estimate)"
        )

    # ---- acceptance (BASELINE.md "Targets for the TPU rebuild"):
    # RN50: throughput vs the driver-set 5,000 imgs/sec/chip target.
    # ViTs: MFU vs the MFU floor — imgs/s x GF/img over the chip's peak
    # bf16 TF/s.  GF/img are XLA's own compiled cost_analysis numbers
    # (docs/DESIGN.md §1); peak defaults to v5e (197 TF/s bf16), override
    # with BENCH_PEAK_TFLOPS on other chip generations.
    GFLOPS_PER_IMG = {
        "RN50": 11.4,
        "ViT-B/32": 9.1,
        "ViT-L/14": 164.0,
        "ViT-L/14@336px": 383.0,
    }
    MFU_TARGET = {"ViT-B/32": 0.40, "ViT-L/14": 0.45, "ViT-L/14@336px": 0.45}
    peak_tf = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    mfu = None
    if backbone in GFLOPS_PER_IMG:
        mfu = per_chip * GFLOPS_PER_IMG[backbone] / 1e3 / peak_tf
    if quant != "none":
        # probe mode: mfu here is the bf16-peak-equivalent utilization (can
        # exceed the bf16 acceptance floors by design); no acceptance band
        # is defined for quantized runs, so vs_baseline stays None
        vs_baseline = None
    elif backbone == "RN50":
        vs_baseline = round(per_chip / 5000.0, 3)
    elif backbone in MFU_TARGET and mfu is not None:
        vs_baseline = round(mfu / MFU_TARGET[backbone], 3)
    else:
        vs_baseline = None

    print(
        json.dumps(
            {
                "metric": (
                    backbone.lower().replace("/", "_").replace("-", "_")
                    + (f"_{quant}" if quant != "none" else "")
                    + "_extract_imgs_per_sec_per_chip"
                ),
                "value": round(per_chip, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": vs_baseline,
                "mfu": round(mfu, 3) if mfu is not None else None,
                "e2e_host_fed_imgs_per_sec_per_chip": round(e2e_per_chip, 1),
                "e2e_upload_mb_per_sec": round(upload_mb_s, 1),
                "e2e_batches": n_e2e,
                "batch": batch,
                "stage_b_train_epochs_per_sec": round(epochs_per_sec, 2),
                "stage_b_epochs_per_sec_spread": round(epochs_spread, 3),
                # methodology tag (VERDICT r4 weak #3): v2 = median over
                # >=5 blocks of 300 dependency-chained epochs, adaptively
                # extended to <=11 blocks while spread > 0.1.  Rounds <= r03
                # used short single blocks — cross-round deltas against them
                # are measurement-method changes, not code changes.
                "stage_b_method": "median-of-300-epoch-blocks/v2-adaptive",
                "stage_b_block_rates": [round(r, 2) for r in block_rates],
                **({"stage_b_spread_note": stage_b_note} if stage_b_note else {}),
            }
        )
    )


def _is_transient_tunnel_error(exc: BaseException) -> bool:
    """Transient axon-tunnel failures (HTTP 500 flakes, dropped remote
    connections) are retryable; genuine compile errors are not.  A VMEM-OOM
    also surfaces as an HTTP 500 over the tunnel but carries the allocation
    message — never retry those (measured taxonomy: memory/axon notes)."""
    msg = str(exc)
    if "Ran out of memory" in msg or "Scoped allocation" in msg:
        return False
    return (
        "HTTP 500" in msg
        or "remote_compile" in msg
        or "Connection reset" in msg
        or "UNAVAILABLE" in msg
    )


if __name__ == "__main__":
    # the driver records this artifact once per round; retry the whole
    # bench on transient tunnel flakes so one dropped request doesn't void
    # the round's evidence (steady-state numbers are unaffected — the
    # retry recompiles from the persistent cache)
    attempts = max(1, int(os.environ.get("BENCH_ATTEMPTS", "3")))
    for attempt in range(attempts):
        try:
            sys.exit(main())
        except Exception as e:  # noqa: BLE001 - classified below
            if attempt + 1 >= attempts or not _is_transient_tunnel_error(e):
                raise
            print(
                f"transient tunnel error (attempt {attempt + 1}/{attempts}), "
                f"retrying: {type(e).__name__}",
                file=sys.stderr,
            )
            time.sleep(10 * (attempt + 1))

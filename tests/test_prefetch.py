"""Prefetch pipeline tests: ordering, error propagation, cancellation, and
weights Orbax round trip (grouped small-infra tests)."""

import threading
import time

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_single_thread():
    assert list(prefetch(range(100), depth=4)) == list(range(100))


def test_prefetch_depth_zero_is_synchronous_passthrough():
    src = iter(range(5))
    it = prefetch(src, depth=0)
    assert next(it) == 0
    # nothing consumed ahead: the source is exactly one element further
    assert next(src) == 1


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_overlaps_producer_and_consumer():
    timeline = []

    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            timeline.append(("produced", i, time.perf_counter()))
            yield i

    for i in prefetch(slow_gen(), depth=2):
        time.sleep(0.05)  # consumer work overlapping next produce
        timeline.append(("consumed", i, time.perf_counter()))

    # load-insensitive overlap property: item i+1 is produced BEFORE item i
    # finishes consuming (for at least one i) — impossible without a
    # background producer
    produced = {i: t for kind, i, t in timeline if kind == "produced"}
    consumed = {i: t for kind, i, t in timeline if kind == "consumed"}
    assert any(produced[i + 1] < consumed[i] for i in range(3)), timeline


def test_prefetch_cancellation_stops_producer():
    produced = []
    done = threading.Event()

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i
        done.set()

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # abandon the consumer
    time.sleep(0.3)
    n_after_close = len(produced)
    time.sleep(0.3)
    # producer observed the stop event: no further production
    assert len(produced) == n_after_close
    assert not done.is_set()
    assert n_after_close <= 8  # bounded by the buffer, not the source


def test_prefetch_pool_completes():
    out = sorted(prefetch(iter(range(50)), depth=4, num_threads=3))
    assert out == list(range(50))


def test_orbax_variables_roundtrip(tmp_path):
    import jax

    from debiasing_multi_modal_tpu.models import create_clip, init_clip
    from debiasing_multi_modal_tpu.models.config import CLIPConfig
    from debiasing_multi_modal_tpu.weights.convert import load_orbax, save_orbax

    cfg = CLIPConfig(
        name="t", embed_dim=32, image_resolution=32, vision_layers=1,
        vision_width=64, vision_patch_size=16, transformer_width=64,
        transformer_heads=1, transformer_layers=1,
    )
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_orbax(jax.device_get(variables), path)
    restored = load_orbax(path)
    assert jax.tree.structure(variables) == jax.tree.structure(restored)
    for a, b in zip(
        jax.tree.leaves(variables), jax.tree.leaves(restored), strict=True
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

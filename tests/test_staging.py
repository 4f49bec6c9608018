"""utils/staging.DeviceCache: stage-once semantics for recurring host arrays.

The training loops rely on the cache to eliminate per-epoch host->device
re-uploads (docs/DESIGN.md §4/§7); these tests pin its contract: identity
keyed, value-stable, pass-through for device arrays, and distinct entries
for distinct (even equal-valued) host arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.utils.staging import DeviceCache


def test_same_array_staged_once():
    cache = DeviceCache()
    host = np.arange(12, dtype=np.int32)
    a = cache(host)
    b = cache(host)
    assert a is b  # the SAME resident buffer, not a fresh transfer
    assert len(cache) == 1
    np.testing.assert_array_equal(np.asarray(a), host)


def test_distinct_arrays_get_distinct_entries():
    cache = DeviceCache()
    x = np.zeros(4, np.float32)
    y = np.zeros(4, np.float32)  # equal values, different identity
    assert cache(x) is not cache(y)
    assert len(cache) == 2


def test_device_arrays_pass_through():
    cache = DeviceCache()
    dev = jnp.ones(3)
    assert cache(dev) is dev
    assert len(cache) == 0


def test_id_reuse_detected_by_identity_check():
    cache = DeviceCache()
    host = np.arange(4, dtype=np.int32)
    staged = cache(host)
    # simulate CPython recycling the id: poison the entry with a dead pair
    other = np.arange(4, dtype=np.int32) * 10
    cache._cache[id(other)] = (host, staged)  # wrong host object under that id
    refreshed = cache(other)
    np.testing.assert_array_equal(np.asarray(refreshed), np.asarray(other))


def test_staged_values_usable_under_jit():
    cache = DeviceCache()
    host = np.arange(8, dtype=np.float32)
    out = jax.jit(lambda v: v * 2)(cache(host))
    np.testing.assert_array_equal(np.asarray(out), host * 2)


def test_enable_persistent_cache(tmp_path):
    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    prior_dir = jax.config.jax_compilation_cache_dir
    prior_min = jax.config.jax_persistent_cache_min_compile_time_secs
    target = str(tmp_path / "xla_cache")
    try:
        got = enable_persistent_cache(target, min_compile_secs=0.25)
        assert got == target
        assert jax.config.jax_compilation_cache_dir == target
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.25
        import os

        assert os.path.isdir(target)
        # idempotent
        assert enable_persistent_cache(target) == target
    finally:  # global jax config: restore so later tests are unaffected
        jax.config.update("jax_compilation_cache_dir", prior_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prior_min
        )


def test_chain_time_measures_positive_wall():
    from debiasing_multi_modal_tpu.utils.timing import chain_time

    dt = chain_time(lambda x: x * 2, jnp.ones((4, 4)), iters=2)
    assert dt > 0.0
    # tuple/tree outputs are accepted (first leaf folds into the chain)
    dt = chain_time(lambda x: (x + 1, x - 1), jnp.ones((4, 4)), iters=2)
    assert dt > 0.0

"""Augmentation op tests: shapes, randomness structure, determinism, and
degenerate-crop correctness."""

import numpy as np

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.augment import (
    random_horizontal_flip,
    random_resized_crop,
    train_augment,
    two_crop,
)


def test_random_resized_crop_shapes_and_range(rng):
    imgs = jnp.asarray(rng.random((4, 64, 80, 3)).astype(np.float32))
    out = random_resized_crop(jax.random.PRNGKey(0), imgs, out_res=32)
    assert out.shape == (4, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_full_crop_is_resize(rng):
    """scale=(1,1), ratio=(1,1) on square images == plain bilinear resize."""
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    out = random_resized_crop(
        jax.random.PRNGKey(0), imgs, out_res=32,
        scale_range=(1.0, 1.0), ratio_range=(1.0, 1.0),
    )
    # the augmenter point-samples (no antialias — standard for tensor-backed
    # augmentation pipelines); compare against non-antialiased bilinear
    ref = jax.image.resize(imgs, (2, 32, 32, 3), method="bilinear", antialias=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_flip_is_exact_reversal(rng):
    imgs = jnp.asarray(rng.random((8, 8, 8, 3)).astype(np.float32))
    out = np.asarray(random_horizontal_flip(jax.random.PRNGKey(1), imgs))
    src = np.asarray(imgs)
    flipped = 0
    for i in range(8):
        if np.allclose(out[i], src[i]):
            continue
        np.testing.assert_allclose(out[i], src[i][:, ::-1])
        flipped += 1
    assert 0 < flipped < 8  # some flipped, some not (p=0.5, n=8)


def test_determinism_and_key_splitting(rng):
    imgs = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    a = np.asarray(train_augment(jax.random.PRNGKey(7), imgs, out_res=32))
    b = np.asarray(train_augment(jax.random.PRNGKey(7), imgs, out_res=32))
    c = np.asarray(train_augment(jax.random.PRNGKey(8), imgs, out_res=32))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_two_crop_views_differ(rng):
    imgs = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    v1, v2 = two_crop(jax.random.PRNGKey(0), imgs, out_res=32)
    assert v1.shape == v2.shape == (4, 32, 32, 3)
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-3


def test_random_resized_crop_upsampling_stays_in_range():
    """Bilinear sampling must clamp SOURCE coordinates at the image edge:
    clamping only the floored gather index extrapolates (weights computed
    against the unclamped coordinate) and emitted values up to ~1.27 from a
    [0, 1] input on upsampling crops touching the top/left edge."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from debiasing_multi_modal_tpu.ops.augment import random_resized_crop

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 32, 32, 3)).astype(np.float32))
    out = random_resized_crop(
        jax.random.PRNGKey(0), imgs, out_res=32,
        scale_range=(0.7, 1.0),  # crop side < out_res: upsampling
    )
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0, (
        float(out.min()), float(out.max()))

"""Preprocessing parity vs. torchvision's Resize(BICUBIC)+CenterCrop+Normalize
chain (the reference transform, clip/clip.py:79-86) on synthetic images."""

import numpy as np
import pytest

import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    normalize_only,
    preprocess_uint8,
    resized_dims,
)


def test_resized_dims_matches_torchvision_rule():
    assert resized_dims(448, 448, 224) == (224, 224)
    # long side truncates: int(224 * 400 / 300) = 298, not round() = 299
    assert resized_dims(300, 400, 224) == (224, 298)
    assert resized_dims(400, 300, 224) == (298, 224)
    assert resized_dims(224, 224, 224) == (224, 224)
    assert resized_dims(100, 200, 224) == (224, 448)


def test_normalize_only():
    img = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = np.asarray(normalize_only(jnp.asarray(img)))
    expect = (0.5 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-6)


@pytest.mark.parametrize("hw", [(256, 256), (320, 256), (240, 300), (180, 260)])
def test_preprocess_matches_pil_reference(hw):
    """PIL's antialiased bicubic resample is the engine under torchvision's
    Resize; reproduce the reference chain with PIL + numpy directly."""
    Image = pytest.importorskip("PIL.Image")

    h, w = hw
    rng = np.random.default_rng(0)
    # smooth image (random low-freq field) — bicubic kernels agree best away
    # from aliasing-dominated content; PIL and jax.image use slightly
    # different antialias filter supports
    base = rng.standard_normal((h // 8 + 1, w // 8 + 1, 3))
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)

    rh, rw = resized_dims(h, w, 224)
    # the reference pipeline's effective kernel is BILINEAR (outer
    # torchvision Resize default; CLIP's bicubic resize no-ops after it)
    pil = Image.fromarray(img).resize((rw, rh), Image.BILINEAR)
    arr = np.asarray(pil, np.float32) / 255.0
    top = int(round((rh - 224) / 2.0))
    left = int(round((rw - 224) / 2.0))
    arr = arr[top : top + 224, left : left + 224]
    ref = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)

    out = np.asarray(preprocess_uint8(jnp.asarray(img[None])))[0]
    assert out.shape == (224, 224, 3)
    # mean abs deviation in normalized units; bicubic kernel differences keep
    # this small but not bit-exact
    mad = np.abs(out - ref).mean()
    assert mad < 0.03, mad
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.998, corr

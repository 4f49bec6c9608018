"""Adapter model family for embedding-space debiasing (Flax).

Parity surface: reference ``final_main.py`` —

- ``Adapter`` (:160-174): Linear(D -> hidden) -> BatchNorm1d -> ReLU ->
  Linear(hidden -> D), no residual.
- ``CustomCLIP`` (:53-92): adapter -> row-L2-normalize -> matmul against a
  column-normalized text matrix [D, C] / temperature (0.01 default).  The
  ``use_group`` flag only selects *which* text matrix is used — group prompts
  vs class prompts (the reference re-reads the JSON per forward,
  final_main.py:71-72; here text matrices are explicit function inputs).
- ``MultipleAdapter`` (:97-158): frozen old adapter (detached) and a new
  adapter (copy- or random-initialized), each row-normalized then blended
  0.5/0.5 *before* the text matmul.
- ``LinearClassifier`` (:43-49) for linear probing.

TPU-first details: BatchNorm follows torch ``BatchNorm1d`` semantics exactly
(biased variance for normalization, unbiased for the running update, momentum
0.1) and supports a batch-validity mask so padded fixed-shape batches leave
the statistics untouched (SURVEY.md §7 hard part 3: reg batch sizes go down
to 4 — BN noise is part of the method's behavior and must not be "fixed").
The normalize/matmul head runs in float32 at HIGHEST matmul precision.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MaskedBatchNorm(nn.Module):
    """torch-semantics BatchNorm1d with optional row-validity mask."""

    features: int
    momentum: float = 0.1  # torch convention: running += momentum * (batch - running)
    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        x32 = x.astype(jnp.float32)
        if train:
            if mask is None:
                n = jnp.float32(x.shape[0])
                mean = jnp.mean(x32, axis=0)
                var = jnp.mean((x32 - mean) ** 2, axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(m.sum(), 1.0)
                mean = (x32 * m).sum(axis=0) / n
                var = (((x32 - mean) ** 2) * m).sum(axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        out = (x32 - mean) * inv + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class AdapterMLP(nn.Module):
    """Linear -> BatchNorm1d -> ReLU -> Linear (no residual)."""

    hidden_dim: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        input_dim = x.shape[-1]
        h = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1"
        )(x)
        h = MaskedBatchNorm(
            self.hidden_dim, param_dtype=self.param_dtype, name="bn"
        )(h, mask=mask, train=train)
        h = nn.relu(h)
        return nn.Dense(
            input_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )(h)


class CAEncoder(nn.Module):
    """Adapter plus the notebook's optional contrastive projection head.

    Reference parity: the working contrastive-adapter flow builds
    ``CustomCLIP(..., head=opt.ca_head, ca_feat_dim=opt.ca_feat_dim)`` with
    ``opt.ca_head = 'linear'`` (SupCon.ipynb cell 3:13) and its
    ``forward_ca`` projects the adapter output through
    ``nn.Linear(input_dim, ca_feat_dim)`` before normalizing (cell 0:91-95).
    The head exists ONLY in the contrastive loss path — the CE/zero-shot
    forward uses the bare adapter — so the param tree nests the shared
    adapter under ``"adapter"`` (copied in/out of the main classifier state
    per CL epoch) and the head under ``"head"``."""

    hidden_dim: int = 128
    ca_head: Optional[str] = None  # None | "linear"
    ca_feat_dim: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        feat = AdapterMLP(
            hidden_dim=self.hidden_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="adapter",
        )(x, mask=mask, train=train)
        if self.ca_head is None:
            return feat
        if self.ca_head != "linear":
            raise ValueError(f"unknown ca_head {self.ca_head!r}")
        return nn.Dense(
            self.ca_feat_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="head",
        )(feat)


def _row_normalize(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    return x32 / jnp.linalg.norm(x32, axis=-1, keepdims=True)


def _col_normalize(text: jax.Array) -> jax.Array:
    t32 = text.astype(jnp.float32)
    return t32 / jnp.linalg.norm(t32, axis=0, keepdims=True)


def zero_shot_logits(
    features: jax.Array, text: jax.Array, temperature: float
) -> jax.Array:
    """Normalized cosine-similarity logits: the shared prediction head.

    features [B, D] (un-normalized), text [D, C] (un-normalized) -> [B, C].
    """
    img = _row_normalize(features)
    txt = _col_normalize(text)
    return (
        jnp.matmul(img, txt, precision=jax.lax.Precision.HIGHEST) / temperature
    )


class AdapterClassifier(nn.Module):
    """CustomCLIP equivalent: adapter + zero-shot head."""

    hidden_dim: int = 128
    temperature: float = 0.01
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        text: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        adapted = AdapterMLP(
            self.hidden_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="adapter",
        )(features, mask=mask, train=train)
        return zero_shot_logits(adapted, text, self.temperature)


class MultipleAdapterClassifier(nn.Module):
    """Frozen old adapter + trainable new adapter, 0.5/0.5 blended.

    The old branch is ``stop_gradient``-ed (the detach at final_main.py:127);
    its parameters are additionally excluded from the optimizer by the train
    loop (mirror of ``set_optimizer_reg``'s param filtering,
    demo/util.py:125-136).  Its BatchNorm follows the reference's torch mode
    system exactly: during phase-2 training the whole module is in train
    mode, so the old BN normalizes each reg batch with that batch's OWN
    statistics and keeps drifting its running averages (used at eval) —
    only the old branch's *parameters* are frozen.  The matched-batch-order
    oracle measured this to be the dominant stage-2 divergence when the old
    branch ran eval-frozen instead (round 4; it was PARITY deviation 4
    before that).
    """

    hidden_dim: int = 128
    temperature: float = 0.01
    ebd_weight: float = 0.5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        text: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        old = AdapterMLP(
            self.hidden_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="old",
        )(features, mask=mask, train=train)
        new = AdapterMLP(
            self.hidden_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="new",
        )(features, mask=mask, train=train)
        blended = self.ebd_weight * jax.lax.stop_gradient(
            _row_normalize(old)
        ) + (1.0 - self.ebd_weight) * _row_normalize(new)
        txt = _col_normalize(text)
        return (
            jnp.matmul(blended, txt, precision=jax.lax.Precision.HIGHEST)
            / self.temperature
        )


class LinearClassifier(nn.Module):
    """Linear probe (reference final_main.py:43-49)."""

    num_classes: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        text: jax.Array = None,  # unused; uniform signature with the adapters
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc",
        )(features).astype(jnp.float32)

"""debiasing_multi_modal_tpu — a TPU-native JAX/Flax/Pallas framework for CLIP
feature debiasing with regularized adapters.

A ground-up rebuild of the capabilities of the PyTorch reference
``Lainshower/debiasing-multi-modal`` (see SURVEY.md at the repo root), designed
TPU-first:

- CLIP encoders (ModifiedResNet / ViT / text transformer) as Flax modules with
  a bf16 compute policy, fp32 normalization statistics, and a Pallas fused
  attention kernel on TPU (``ops/attention.py``).
- Batched image/text embedding extraction with zero-shot prediction as a single
  ``jit``-compiled function, data-parallel over a ``jax.sharding.Mesh``
  (``extract/``).
- The two-phase sequential/alternating regularized-adapter trainer as pure,
  jitted step functions driven by pure schedule functions (``train/``), with
  group metrics as segment reductions instead of Python loops.
- Multi-seed sweeps as ``vmap`` over the adapter train state (``sweep/``).

Stage boundaries are file-mediated like the reference (embedding caches), with
both a fast native ``.npz`` store and the reference's ``clip.json`` schema for
cross-compatibility (``data/embeddings_store.py``).
"""

__version__ = "0.1.0"

from debiasing_multi_modal_tpu import templates  # noqa: F401

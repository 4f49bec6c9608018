"""Single-buffer parameter staging for slow host<->device links.

A converted CLIP tree has ~500 leaves; staging them individually over a
remote-TPU (axon) tunnel pays a per-buffer round trip (measured: ~225s for
RN50's 408MB vs ~115s as one buffer, and half that again in bf16).  The
packer flattens a pytree into ONE contiguous bf16 buffer on host; the
device-side unpacker (jittable) slices it back into the original tree and
casts to each leaf's dtype.

Lossless for bf16 params; fp32 leaves round through bf16 (fine for benchmark
weights and for checkpoints that shipped fp16 to begin with — pass
``exact=True`` to keep a f32 buffer instead)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(tree: Any, exact: bool = False) -> Tuple[np.ndarray, Any]:
    """Host-side: pytree -> (packed 1-D buffer, spec). Spec is (treedef,
    [(shape, dtype, offset, size), ...])."""
    leaves, treedef = jax.tree.flatten(tree)
    if exact:
        buf_dtype = np.float32
    else:
        import ml_dtypes

        buf_dtype = np.dtype(ml_dtypes.bfloat16)
    metas = []
    offset = 0
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind != "f":
            # int/bool leaves routed through float32 (or bf16) would be
            # silently quantized — int32 values above 2**24 round-trip
            # WRONG even under exact=True.  This packer is for float
            # parameter trees only.
            raise TypeError(
                f"pack_tree supports float leaves only; got {arr.dtype} "
                "(pack non-float leaves separately or device_put them raw)"
            )
        metas.append((arr.shape, arr.dtype, offset, arr.size))
        offset += arr.size
    buf = np.empty(offset, buf_dtype)
    for leaf, (shape, dtype, off, size) in zip(leaves, metas):
        buf[off : off + size] = np.asarray(leaf, np.float32).ravel().astype(buf_dtype)
    return buf, (treedef, metas)


def unpack_tree(buffer: jax.Array, spec) -> Any:
    """Device-side (jit-traceable): packed buffer -> pytree."""
    treedef, metas = spec
    leaves = []
    for shape, dtype, off, size in metas:
        chunk = jax.lax.dynamic_slice(buffer, (off,), (size,))
        leaves.append(chunk.reshape(shape).astype(dtype))
    return jax.tree.unflatten(treedef, leaves)


def packed_host_init(model, batch: int = 1, seed: int = 0):
    """Initialize CLIP variables on the host CPU and ship ONE packed buffer
    to the default device (per-leaf staging pays a per-buffer tunnel round
    trip — docs/DESIGN.md §7).  Shared by bench.py and the profiling
    scripts."""
    from debiasing_multi_modal_tpu.models.clip import init_clip

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # one recipe for dummy-input init (shapes/dtypes live in init_clip;
        # a second copy here silently diverged once already)
        host_vars = init_clip(model, jax.random.PRNGKey(seed), batch=batch)
    buf, spec = pack_tree(jax.device_get(host_vars))
    return jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

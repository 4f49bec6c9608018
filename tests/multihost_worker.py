"""Worker process for the real 2-process multihost test.

Launched twice by tests/test_multihost.py with distinct process ids.  Each
process gets ONE local CPU device; together they form a 2-device global mesh
over the jax.distributed runtime (localhost coordinator) — the same recipe a
TPU pod slice uses (one process per host, ICI-global mesh).

Usage: python multihost_worker.py <process_id> <num_processes> <port> [local_devices]
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    local = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local}"

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from debiasing_multi_modal_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * local  # global view
    assert len(jax.local_devices()) == local

    mesh = multihost.global_mesh()

    # ---- global_batch assembles per-process rows in process order
    base = np.arange(12, dtype=np.float32).reshape(4, 3)
    local = base + 100.0 * pid
    g = multihost.global_batch(local, mesh)
    assert g.shape == (4 * nproc, 3), g.shape

    # replicate to every process and check the concatenation order/content
    replicate = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    full = np.asarray(replicate(g))
    expected = np.concatenate([base + 100.0 * p for p in range(nproc)])
    np.testing.assert_allclose(full, expected)

    # ---- a psum across the data axis matches the host-side global sum
    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    got = float(global_sum(g))
    assert abs(got - float(expected.sum())) < 1e-3, (got, expected.sum())

    # ---- ring attention across the process boundary: the sequence axis
    # sharded over the global mesh, kv chunks ppermute'd between processes
    from debiasing_multi_modal_tpu.ops.ring_attention import (
        sequence_parallel_attention,
    )

    ndev = len(jax.devices())
    rng = np.random.default_rng(7)  # identical stream on every process
    qn, kn, vn = (rng.standard_normal((2, 16 * ndev, 2, 8)).astype(np.float32)
                  for _ in range(3))
    spec = P(None, "data", None, None)
    sh = NamedSharding(mesh, spec)
    qa, ka, va = (
        jax.make_array_from_callback(x.shape, sh, lambda idx, x=x: x[idx])
        for x in (qn, kn, vn)
    )
    out = sequence_parallel_attention(
        qa, ka, va, mesh=mesh, axis_name="data", causal=True
    )
    full_out = np.asarray(replicate(out))

    # numpy oracle (same math as ops/attention._xla_attention)
    scale = qn.shape[-1] ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", qn, kn) * scale
    s = qn.shape[1]
    tri = np.tril(np.ones((s, s), bool))
    logits = np.where(tri, logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", w, vn)
    np.testing.assert_allclose(full_out, ref, atol=2e-5)

    print(f"RING OK {pid}")

    # ---- pipeline parallelism across the process boundary: stages live on
    # different PROCESSES, activations ppermute between them each tick
    from debiasing_multi_modal_tpu.models.layers import Transformer
    from debiasing_multi_modal_tpu.parallel.pp import (
        pipeline_transformer,
        stack_block_params,
    )

    tr = Transformer(width=32, layers=4, heads=2)
    xp = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.float32)
    variables = tr.init(jax.random.PRNGKey(0), xp)  # same params every process
    seq_ref = np.asarray(tr.apply(variables, xp))
    stacked, _ = stack_block_params(variables["params"])
    # numpy leaves so jit commits them to the GLOBAL stage sharding itself
    stacked = jax.tree.map(np.asarray, stacked)
    piped = pipeline_transformer(
        stacked, np.asarray(xp), mesh=mesh, stage_axis="data",
        num_heads=2, microbatches=2,
    )
    np.testing.assert_allclose(
        np.asarray(replicate(piped)), seq_ref, atol=2e-5
    )
    print(f"PIPELINE OK {pid}")
    print(f"OK {pid} sum={got}")


if __name__ == "__main__":
    main()

"""Driver-contract tests: the multichip dry run executes on the 8-device CPU
mesh with real dp+tp shardings, and dp-sharded adapter training matches the
single-device result (sharding invariance)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from debiasing_multi_modal_tpu.models.adapter import AdapterClassifier
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
from debiasing_multi_modal_tpu.train.steps import (
    init_train_state,
    ones_mask,
    train_epoch,
)


def test_dryrun_multichip_executes():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_sharded_training_matches_single_device(rng):
    dim, hidden, bs, nb = 32, 16, 16, 3
    module = AdapterClassifier(hidden_dim=hidden, temperature=0.01)
    emb = rng.standard_normal((bs * nb, dim)).astype(np.float32)
    labels = rng.integers(0, 2, bs * nb).astype(np.int32)
    groups = rng.integers(0, 4, bs * nb).astype(np.int32)
    text = rng.standard_normal((dim, 2)).astype(np.float32)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.asarray(emb[:2]), jnp.asarray(text), train=True
    )
    idx = jnp.arange(bs * nb, dtype=jnp.int32).reshape(nb, bs)
    mask = jnp.ones((nb, bs), bool)
    lrs = jnp.full((nb,), 0.1, jnp.float32)

    def run(mesh=None):
        if mesh is None:
            put = lambda x: x  # noqa: E731
        else:
            data_sh = NamedSharding(mesh, P("data"))
            put = lambda x: jax.device_put(x, data_sh)  # noqa: E731
        state = init_train_state(variables["params"], variables["batch_stats"])
        new_state, stats = train_epoch(
            module,
            state,
            put(jnp.asarray(emb)),
            put(jnp.asarray(labels)),
            put(jnp.asarray(groups)),
            idx,
            mask,
            lrs,
            jnp.asarray(text),
            ones_mask(variables["params"]),
            n_groups=4,
            momentum=0.9,
            weight_decay=5e-5,
        )
        return jax.device_get(new_state.params), jax.device_get(stats)

    p_single, s_single = run(None)
    p_multi, s_multi = run(make_mesh((8,)))
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_multi)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_single.corrects), np.asarray(s_multi.corrects), atol=1e-5
    )


def test_pack_unpack_roundtrip(rng):
    from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree

    tree = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": {"c": rng.standard_normal(16).astype(np.float32)},
    }
    buf, spec = pack_tree(tree, exact=True)
    assert buf.ndim == 1 and buf.size == 4 * 8 + 16
    out = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-6)

    # bf16 staging loses only mantissa bits
    buf16, spec16 = pack_tree(tree)
    out16 = unpack_tree(jnp.asarray(buf16), spec16)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out16)):
        assert b.dtype == a.dtype  # cast back to the leaf dtype
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-2, atol=1e-2)

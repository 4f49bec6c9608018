"""Adapter family tests: torch-BatchNorm semantic parity, SGD-vs-torch
update parity, and a golden check against the reference's shipped trained
MultipleAdapter checkpoint (trained_model/*.pth)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models.adapter import (
    AdapterClassifier,
    AdapterMLP,
    MaskedBatchNorm,
    MultipleAdapterClassifier,
    zero_shot_logits,
)
from debiasing_multi_modal_tpu.weights.convert import adapter_variables_from_torch

TRAINED_PTH = (
    "/root/reference/trained_model/"
    "im_clip_t_clip_class_tl_adapter_reg_seq_alter_t_class_lr_1.0_bs_1024_lrr1.0_bsr_256_MA+rn.pth"
)


def test_masked_batchnorm_matches_torch(rng):
    torch = pytest.importorskip("torch")

    x = rng.standard_normal((16, 8)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(8)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))

    bn = MaskedBatchNorm(8)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {"mean": jnp.zeros(8), "var": jnp.ones(8)},
    }

    # two training steps (running stats accumulate), then one eval step
    tbn.train()
    for step in range(2):
        xt = torch.from_numpy(x + step)
        out_t = tbn(xt).detach().numpy()
        out_j, mutated = bn.apply(
            variables, jnp.asarray(x + step), train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)
        variables = {"params": variables["params"], **mutated}

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(),
        rtol=1e-5,
        atol=1e-6,
    )

    tbn.eval()
    out_t = tbn(torch.from_numpy(x)).detach().numpy()
    out_j = bn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)


def test_masked_batchnorm_ignores_padded_rows(rng):
    x = rng.standard_normal((8, 4)).astype(np.float32)
    bn = MaskedBatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    # stats from the first 5 rows only must equal stats of the unpadded batch
    mask = jnp.asarray([True] * 5 + [False] * 3)
    out_masked, mut_masked = bn.apply(
        variables, jnp.asarray(x), mask=mask, train=True, mutable=["batch_stats"]
    )
    out_plain, mut_plain = bn.apply(
        variables, jnp.asarray(x[:5]), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_masked)[:5], np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut_masked["batch_stats"]["mean"]),
        np.asarray(mut_plain["batch_stats"]["mean"]),
        rtol=1e-6, atol=1e-6,
    )


def test_sgd_matches_torch(rng):
    """One masked-CE SGD step on the adapter must reproduce torch's SGD
    (momentum 0.9, coupled weight decay 5e-5) to float tolerance."""
    torch = pytest.importorskip("torch")
    from debiasing_multi_modal_tpu.train.steps import (
        init_train_state,
        ones_mask,
        train_epoch,
    )

    dim, hid, bs = 16, 8, 12
    x = rng.standard_normal((bs, dim)).astype(np.float32)
    text = rng.standard_normal((dim, 2)).astype(np.float32)
    labels = rng.integers(0, 2, bs).astype(np.int64)

    # torch twin of AdapterClassifier
    tnet = torch.nn.Sequential(
        torch.nn.Linear(dim, hid), torch.nn.BatchNorm1d(hid),
        torch.nn.ReLU(), torch.nn.Linear(hid, dim),
    )
    module = AdapterClassifier(hidden_dim=hid, temperature=0.01)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(text), train=True
    )
    p = variables["params"]["adapter"]
    with torch.no_grad():
        tnet[0].weight.copy_(torch.from_numpy(np.asarray(p["fc1"]["kernel"]).T))
        tnet[0].bias.copy_(torch.from_numpy(np.asarray(p["fc1"]["bias"])))
        tnet[1].weight.copy_(torch.from_numpy(np.asarray(p["bn"]["scale"])))
        tnet[1].bias.copy_(torch.from_numpy(np.asarray(p["bn"]["bias"])))
        tnet[3].weight.copy_(torch.from_numpy(np.asarray(p["fc2"]["kernel"]).T))
        tnet[3].bias.copy_(torch.from_numpy(np.asarray(p["fc2"]["bias"])))

    opt = torch.optim.SGD(tnet.parameters(), lr=0.1, momentum=0.9, weight_decay=5e-5)
    tnet.train()
    for _ in range(3):
        feats = tnet(torch.from_numpy(x))
        feats = feats / feats.norm(dim=-1, keepdim=True)
        t = torch.from_numpy(text)
        t = t / t.norm(dim=0, keepdim=True)
        logits = feats @ t / 0.01
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(labels))
        opt.zero_grad()
        loss.backward()
        opt.step()

    state = init_train_state(variables["params"], variables["batch_stats"])
    nb = 3
    state, stats = train_epoch(
        module,
        state,
        jnp.asarray(x),
        jnp.asarray(labels.astype(np.int32)),
        jnp.zeros(bs, jnp.int32),
        jnp.tile(jnp.arange(bs, dtype=jnp.int32), (nb, 1)),
        jnp.ones((nb, bs), bool),
        jnp.full((nb,), 0.1, jnp.float32),
        jnp.asarray(text),
        ones_mask(variables["params"]),
        n_groups=4,
        momentum=0.9,
        weight_decay=5e-5,
    )
    new_p = state.params["adapter"]
    np.testing.assert_allclose(
        np.asarray(new_p["fc1"]["kernel"]),
        tnet[0].weight.detach().numpy().T,
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_p["fc2"]["bias"]),
        tnet[3].bias.detach().numpy(),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["adapter"]["bn"]["mean"]),
        tnet[1].running_mean.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.skipif(not os.path.isfile(TRAINED_PTH), reason="trained artifact absent")
def test_trained_multiple_adapter_golden(rng):
    """Load the reference's shipped trained MultipleAdapter .pth, convert it,
    and check our forward against explicit numpy math of the reference's
    blended-adapter head (final_main.py:121-140)."""
    torch = pytest.importorskip("torch")

    sd = {k: v.float().numpy() for k, v in torch.load(TRAINED_PTH, map_location="cpu").items()}
    variables = adapter_variables_from_torch(sd)
    assert set(variables["params"]) == {"old", "new"}

    x = rng.standard_normal((5, 1024)).astype(np.float32)
    text = rng.standard_normal((1024, 2)).astype(np.float32)

    def np_adapter(prefix):
        w1 = sd[f"{prefix}layers.0.weight"]
        b1 = sd[f"{prefix}layers.0.bias"]
        g = sd[f"{prefix}layers.1.weight"]
        b = sd[f"{prefix}layers.1.bias"]
        mu = sd[f"{prefix}layers.1.running_mean"]
        var = sd[f"{prefix}layers.1.running_var"]
        w2 = sd[f"{prefix}layers.3.weight"]
        b2 = sd[f"{prefix}layers.3.bias"]
        h = x @ w1.T + b1
        h = (h - mu) / np.sqrt(var + 1e-5) * g + b
        h = np.maximum(h, 0)
        return h @ w2.T + b2

    def norm_rows(m):
        return m / np.linalg.norm(m, axis=-1, keepdims=True)

    blended = 0.5 * norm_rows(np_adapter("old_cls.adapter.")) + 0.5 * norm_rows(
        np_adapter("new_adapter.")
    )
    expected = blended @ (text / np.linalg.norm(text, axis=0, keepdims=True)) / 0.01

    module = MultipleAdapterClassifier(hidden_dim=128, temperature=0.01)
    got = module.apply(variables, jnp.asarray(x), jnp.asarray(text), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-3)


def test_zero_shot_logits_normalization(rng):
    emb = rng.standard_normal((4, 8)).astype(np.float32) * 10
    text = rng.standard_normal((8, 2)).astype(np.float32) * 3
    logits = np.asarray(zero_shot_logits(jnp.asarray(emb), jnp.asarray(text), 0.02))
    expected = (
        (emb / np.linalg.norm(emb, axis=1, keepdims=True))
        @ (text / np.linalg.norm(text, axis=0, keepdims=True))
        / 0.02
    )
    np.testing.assert_allclose(logits, expected, rtol=1e-5, atol=1e-5)


def test_multiple_adapter_old_branch_gets_no_gradient(rng):
    module = MultipleAdapterClassifier(hidden_dim=4)
    x = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((8, 2)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x, text, train=True)

    def loss(params):
        logits = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, text, train=True, mutable=["batch_stats"],
        )[0]
        return logits.sum()

    grads = jax.grad(loss)(variables["params"])
    assert all(
        float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(grads["old"])
    )
    assert any(
        float(jnp.abs(g).max()) > 0.0 for g in jax.tree.leaves(grads["new"])
    )


def test_adapter_torch_export_roundtrip(rng):
    """adapter_variables_to_torch is the exact inverse of the importer: the
    shipped trained .pth round-trips key-for-key and value-for-value, so
    adapters trained here load straight into the reference's eval code."""
    import os

    import torch

    from debiasing_multi_modal_tpu.weights.convert import (
        adapter_variables_from_torch, adapter_variables_to_torch,
    )

    if not os.path.exists(TRAINED_PTH):
        import pytest

        pytest.skip("reference artifact unavailable")
    sd = {k: v.float().numpy() for k, v in torch.load(
        TRAINED_PTH, map_location="cpu").items()}
    variables = adapter_variables_from_torch(sd)
    back = adapter_variables_to_torch(variables)
    assert set(back) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue  # not represented in flax batch_stats; exported as 0
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, err_msg=k)

    # single-adapter (CustomCLIP) layout round-trips too
    single = {
        f"adapter.layers.{i}.{p}": rng.standard_normal(s).astype(np.float32)
        for i, p, s in (
            (0, "weight", (8, 16)), (0, "bias", (8,)),
            (1, "weight", (8,)), (1, "bias", (8,)),
            (1, "running_mean", (8,)), (1, "running_var", (8,)),
            (3, "weight", (16, 8)), (3, "bias", (16,)),
        )
    }
    single["adapter.layers.1.num_batches_tracked"] = np.asarray(7, np.int64)
    v = adapter_variables_from_torch(single)
    back = adapter_variables_to_torch(v)
    for k in single:
        if k.endswith("num_batches_tracked"):
            continue  # not represented in flax batch_stats; exported as 0
        np.testing.assert_allclose(back[k], single[k], rtol=1e-6, err_msg=k)

"""Run the REFERENCE torch trainer (final_main.py) on a synthetic embedding
cache, in a clean subprocess, and print its results as one JSON line.

    python tests/reference_oracle_runner.py '<json args>'

Used by tests/test_reference_oracle.py as the cross-implementation oracle:
the reference's own training code is the golden semantics, executed here
CPU-only via three shims (this environment has no CUDA, torchvision,
umap-learn, or easydict — none of which the trainer path actually needs):

- ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` become identity,
- stub modules for umap / easydict / torchvision satisfy the visualizer
  import chain (final_main.py:26 imports visualizer_supcon which pulls in
  demo/visualizer.py's full viz deps),
- DataLoader factories are rebound to num_workers=0 (the defaults fork 16
  workers per loader — final_main.py:187, waterbirds_embeddings.py:90 —
  which thrash the 1-core host).

NOTE: public untrusted reference code is executed as-is for behavior
comparison only; no code is copied from it.
"""

import json
import os
import sys
import types


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_shims():
    import numpy as np
    import torch

    class _UMAP:
        def __init__(self, **kw):
            pass

        def fit_transform(self, x):
            return np.zeros((len(x), 2))

    umap = _stub("umap")
    umap.umap_ = _stub("umap.umap_", UMAP=_UMAP)

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    _stub("easydict", EasyDict=EasyDict)

    tv = _stub("torchvision")
    tv.transforms = _stub(
        "torchvision.transforms",
        Compose=lambda *a, **k: None, ToTensor=object, Normalize=object,
        Resize=object, CenterCrop=object,
    )
    tv.utils = _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    tv.models = _stub("torchvision.models")

    # the reference's resampling machinery builds ragged arrays with bare
    # np.array(list_of_unequal_lists) (visualizer_supcon.py:1162), which
    # numpy >= 1.24 rejects; restore the implicit-object-array semantics it
    # was written against.  Subprocess-isolated.
    _orig_array = np.array

    def _compat_array(*a, **k):
        try:
            return _orig_array(*a, **k)
        except ValueError as e:
            # retry only when dtype wasn't given AT ALL — a positional
            # dtype (np.array(x, float)) would make the kwarg retry raise
            # an unrelated TypeError masking this informative error
            if "inhomogeneous" in str(e) and "dtype" not in k and len(a) == 1:
                return _orig_array(*a, dtype=object, **k)
            raise

    np.array = _compat_array

    # the reference's CelebA datasets mutate `metadata_df[col].values` in
    # place (celeba_embeddings*.py: the -1 -> 0 attribute remap), which is
    # read-only under modern pandas copy-on-write.  Returning a writable
    # COPY is enough for the reference's actual pattern (it binds .values
    # to a local and mutates that); it is NOT full pre-CoW semantics — an
    # unbound write like df[c].values[m] = v would mutate a throwaway copy.
    # Subprocess-isolated — never affects the host test process.
    import pandas as pd

    _orig_values = pd.Series.values
    pd.Series.values = property(
        lambda self: np.array(_orig_values.fget(self))
    )

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # the reference's set_model_multiple_adapter (final_main.py:338-343)
    # assigns `classifier` only inside `if torch.cuda.is_available():` and
    # crashes with UnboundLocalError on a CPU-only machine — a real
    # CUDA-only bug; with .cuda() identity-shimmed, reporting True is safe
    torch.cuda.is_available = lambda: True
    os.environ.setdefault("MPLBACKEND", "Agg")


def run_reference(reference_root: str, argv, matched=None):
    """``matched``: paths produced by ``train_all_epochs(capture=...)`` —
    ``{"weights_npz": ..., "orders_json": ...}``.  When given, the reference
    run is pinned to OUR realized run: identical initial weights
    (``load_state_dict`` after ``set_model`` / ``set_model_multiple_adapter``)
    and identical per-epoch sample orders (scripted Samplers + a scripted
    ``balance_val``).  Sample order and init are the reference trainer's only
    free variables (its order is fully determined by set_seed + DataLoader
    shuffle, demo/util.py:61-68 + final_main.py:883), so the remaining
    cross-implementation difference is float arithmetic — the matched-order
    oracle asserts numerical, not statistical, agreement."""
    install_shims()
    sys.path.insert(0, os.path.join(reference_root, "demo"))
    sys.path.insert(0, reference_root)
    import importlib

    import numpy as np

    fm = importlib.import_module("final_main")

    queues = None
    traj = []
    if matched is not None:
        import torch
        from torch.utils.data import DataLoader, Subset

        wz = np.load(matched["weights_npz"])
        with open(matched["orders_json"]) as f:
            cap = json.load(f)
        init_sd = {
            k[len("init/"):]: torch.tensor(np.asarray(wz[k]))
            for k in wz.files if k.startswith("init/")
        }
        manew_sd = {
            k[len("manew/"):]: torch.tensor(np.asarray(wz[k]))
            for k in wz.files if k.startswith("manew/")
        }
        queues = {
            "train": [np.asarray(o, np.int64) for o in cap["orders"]["train"]],
            "reg": [np.asarray(o, np.int64) for o in cap["orders"]["reg"]],
            "balval": [np.asarray(o, np.int64) for o in cap["balval"]],
        }

        class ScriptedSampler(torch.utils.data.Sampler):
            """Pops one full-epoch order per iterator creation; a DataLoader
            calls ``iter(sampler)`` exactly once per epoch iterated."""

            def __init__(self, queue, n):
                self.queue, self.n = queue, n

            def __iter__(self):
                assert self.queue, "sampler queue exhausted — epoch desync"
                order = self.queue.pop(0)
                assert len(order) == self.n, (len(order), self.n)
                return iter(order.tolist())

            def __len__(self):
                return self.n

        def _script_loaders(loaders):
            loaders = list(loaders)
            tl = loaders[0]
            loaders[0] = DataLoader(
                tl.dataset, batch_size=tl.batch_size,
                sampler=ScriptedSampler(queues["train"], len(tl.dataset)),
                num_workers=0,
            )
            if len(loaders) == 4 and not queues["balval"]:
                rl = loaders[1]
                loaders[1] = DataLoader(
                    rl.dataset, batch_size=rl.batch_size,
                    sampler=ScriptedSampler(queues["reg"], len(rl.dataset)),
                    num_workers=0,
                )
            return tuple(loaders)

        orig_set_model = fm.set_model
        def _set_model(opt):
            classifier, criterion = orig_set_model(opt)
            classifier.load_state_dict(init_sd, strict=True)
            return classifier, criterion
        fm.set_model = _set_model

        orig_smma = fm.set_model_multiple_adapter
        def _smma(opt, erm_classifier):
            clf, criterion = orig_smma(opt, erm_classifier)
            if manew_sd:
                res = clf.load_state_dict(manew_sd, strict=False)
                assert not res.unexpected_keys, res.unexpected_keys
                assert all(k.startswith("old_cls.") for k in res.missing_keys), (
                    res.missing_keys
                )
            return clf, criterion
        fm.set_model_multiple_adapter = _smma

        def _balance_val(val_loader, opt, print_procedure=False):
            # reference balance_val (final_main.py:346-379) with the
            # per-epoch order scripted instead of np.random-drawn; same
            # Subset-relative index space, same batch-size shrink rule
            order = queues["balval"].pop(0)
            bs = min(opt.batch_size_reg, len(order))
            return DataLoader(
                Subset(val_loader.dataset, order.tolist()),
                shuffle=False, batch_size=bs,
            )
        fm.balance_val = _balance_val

        orig_validate = fm.validate
        def _validate(*a, **kw):
            out = orig_validate(*a, **kw)
            traj.append({
                "label": kw.get("print_label", ""),
                "group_acc": {k: float(v) for k, v in out[2].items()},
            })
            return out
        fm.validate = _validate

    # single-core host: no DataLoader worker processes
    import data.celeba_embeddings as cemb
    import data.celeba_embeddings_reg as creg
    import data.waterbirds_embeddings as wemb
    import data.waterbirds_embeddings_reg as wreg

    def _rebind(orig):
        def wrapped(d, e, bt, bv, num_workers=0, transform=None):
            out = orig(d, e, bt, bv, num_workers=0)
            return _script_loaders(out) if matched is not None else out
        return wrapped

    for mod, attr in (
        (wemb, "load_waterbirds_embeddings"),
        (wreg, "load_waterbirds_embeddings"),
        (cemb, "load_celeba_embeddings"),
        (creg, "load_celeba_embeddings"),
    ):
        setattr(mod, attr, _rebind(getattr(mod, attr)))

    sys.argv = ["final_main.py"] + list(argv)
    opt = fm.parse_option()
    (tr, va, te), (zc, zs) = fm.train_all_epochs(opt)
    if queues is not None:
        leftover = {k: len(v) for k, v in queues.items()}
        assert not any(leftover.values()), f"unconsumed orders: {leftover}"
    result = {
        "train": {k: float(v) for k, v in tr.items()},
        "val": {k: float(v) for k, v in va.items()},
        "test": {k: float(v) for k, v in te.items()},
        "zs_class": {k: float(v) for k, v in zc.items()},
        "zs_spurious": {k: float(v) for k, v in zs.items()},
    }
    if matched is not None:
        result["validate_trajectory"] = traj
    return result


def eval_checkpoint(reference_root: str, argv, pth_path: str):
    """Load a .pth exported by ``weights/convert.adapter_variables_to_torch``
    into the REFERENCE's MultipleAdapter and run the reference's own
    ``validate`` on the test split — artifact interchange in the
    export direction (the import direction is pinned by
    test_adapter.py::test_trained_multiple_adapter_golden)."""
    from functools import partial

    install_shims()
    sys.path.insert(0, os.path.join(reference_root, "demo"))
    sys.path.insert(0, reference_root)
    import importlib

    import torch

    fm = importlib.import_module("final_main")

    import data.waterbirds_embeddings_reg as wreg

    sys.argv = ["final_main.py"] + list(argv)
    opt = fm.parse_option()
    trainset = wreg.WaterbirdsEmbeddings(opt.data_dir, "train", opt.image_embedding_dir, None)
    _, _, _, test_loader = wreg.load_waterbirds_embeddings(
        opt.data_dir, opt.image_embedding_dir, opt.batch_size,
        opt.batch_size_reg, num_workers=0,
    )
    get_yp = partial(fm.get_y_p, n_places=trainset.n_places)

    erm_classifier, criterion = fm.set_model(opt)
    ma = fm.MultipleAdapter(
        erm_classifier,
        fm.Adapter(input_dim=1024, hidden_dim=opt.adapter_feat_dim),
        init_near_identity=False,
    )
    sd = torch.load(pth_path, map_location="cpu")
    ma.load_state_dict(sd, strict=True)
    _, _, group_acc = fm.validate(
        opt, test_loader, ma, criterion, get_yp, trainset.group_ratio,
        target="class", print_label="Test",
    )
    return {k: float(v) for k, v in group_acc.items()}


def supcon_loss_oracle(reference_root: str, spec):
    """Evaluate the REFERENCE ``SupervisedContrastiveLoss``
    (demo/visualizer_supcon.py:1522-1587) on a given [anchor; positives;
    negatives] embedding batch and return the scalar loss.  The model shim's
    ``forward_ca`` is identity: the reference's normalization there is
    redundant under its ``nn.CosineSimilarity``, so identity isolates the
    loss formula itself (adapter-forward parity is pinned separately by
    test_adapter.py)."""
    install_shims()
    sys.path.insert(0, os.path.join(reference_root, "demo"))
    sys.path.insert(0, reference_root)
    import importlib

    import torch

    vs = importlib.import_module("visualizer_supcon")
    from easydict import EasyDict  # the shim stub

    args = EasyDict(
        cl_temperature=spec["temperature"],
        num_positive=spec["num_positive"],
        num_negative=spec["num_negative"],
        tl_method="contrastive_adapter",
    )
    crit = vs.SupervisedContrastiveLoss(args)

    class _IdentityModel:
        def forward_ca(self, x):
            return x

    batch = torch.tensor(spec["batch"], dtype=torch.float32)
    loss, _, _, _ = crit(_IdentityModel(), batch)
    return {"loss": float(loss)}


if __name__ == "__main__":
    spec = json.loads(sys.argv[1])
    root = spec.get("reference_root", "/root/reference")
    if spec.get("mode") == "eval_checkpoint":
        result = eval_checkpoint(root, spec["argv"], spec["pth"])
    elif spec.get("mode") == "supcon_loss":
        result = supcon_loss_oracle(root, spec)
    elif spec.get("mode") == "matched":
        result = run_reference(root, spec["argv"], matched=spec["matched"])
    else:
        result = run_reference(root, spec["argv"])
    print("ORACLE_RESULT " + json.dumps(result))

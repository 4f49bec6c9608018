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


def run_reference(reference_root: str, argv):
    install_shims()
    sys.path.insert(0, os.path.join(reference_root, "demo"))
    sys.path.insert(0, reference_root)
    import importlib

    fm = importlib.import_module("final_main")

    # single-core host: no DataLoader worker processes
    import data.celeba_embeddings as cemb
    import data.celeba_embeddings_reg as creg
    import data.waterbirds_embeddings as wemb
    import data.waterbirds_embeddings_reg as wreg

    for mod, attr in (
        (wemb, "load_waterbirds_embeddings"),
        (wreg, "load_waterbirds_embeddings"),
        (cemb, "load_celeba_embeddings"),
        (creg, "load_celeba_embeddings"),
    ):
        orig = getattr(mod, attr)
        setattr(
            mod,
            attr,
            lambda d, e, bt, bv, num_workers=0, transform=None, _o=orig: _o(
                d, e, bt, bv, num_workers=0
            ),
        )

    sys.argv = ["final_main.py"] + list(argv)
    opt = fm.parse_option()
    (tr, va, te), (zc, zs) = fm.train_all_epochs(opt)
    return {
        "train": {k: float(v) for k, v in tr.items()},
        "val": {k: float(v) for k, v in va.items()},
        "test": {k: float(v) for k, v in te.items()},
        "zs_class": {k: float(v) for k, v in zc.items()},
        "zs_spurious": {k: float(v) for k, v in zs.items()},
    }


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
    else:
        result = run_reference(root, spec["argv"])
    print("ORACLE_RESULT " + json.dumps(result))

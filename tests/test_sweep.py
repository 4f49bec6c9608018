"""Sweep tests: vmapped simultaneous-seed training equals the sequential
per-seed loop (SURVEY.md §7 distributed test), and the grid driver writes
the reference's CSV schema."""

import os

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
from debiasing_multi_modal_tpu.sweep.runner import aggregate_csv, cell_filename, run_seeds, run_sweep
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table

BASE = dict(
    dataset="waterbirds",
    input_dim=64,
    adapter_feat_dim=16,
    batch_size=128,
    batch_size_reg=32,
    learning_rate=0.5,
    learning_rate_reg=0.5,
    lr_decay_epochs=(100,),
)


def _assert_results_close(a_results, b_results, tol=2e-3):
    """Compare two run_seeds outputs: per-seed (train/val/test) dicts plus
    the two zero-shot probe dicts."""
    for (a_res, a_zs), (b_res, b_zs) in zip(a_results, b_results):
        for a_d, b_d in zip(tuple(a_res) + tuple(a_zs), tuple(b_res) + tuple(b_zs)):
            for k in a_d:
                assert abs(a_d[k] - b_d[k]) < tol, (k, a_d, b_d)


@pytest.fixture(scope="module")
def bundle():
    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=256, n_val=128, n_test=128)
    )
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    return bundle_from_embedding_table(table, mbs, tc, ts, tg)


@pytest.mark.parametrize(
    "method,extra",
    [
        ("adapter", {}),
        (
            "adapter_reg_seq_alter",
            dict(epochs_feature_learning=2, balance_val=True, add_adapter=True,
                 init_near_identity=True),
        ),
        # random MA init (the "_MA+rn" cells): exercises the MultipleAdapter
        # init's PRNG-key split order, which differs from phase 1's
        (
            "adapter_reg_seq_alter",
            dict(epochs_feature_learning=2, add_adapter=True,
                 init_near_identity=False),
        ),
        ("adapter_reg", {}),
        # CP-Alter: the class-prompt reg pass merges into the train meters
        # in BOTH loops (reference final_main.py:536,551)
        ("adapter_reg", dict(use_cls_prompt_in_reg=True)),
        ("adapter_reg_seq", dict(epochs_feature_learning=2)),
        ("adapter", dict(resample_ce=True)),
        ("linear_probing", {}),
        (
            "contrastive_adapter",
            dict(num_positive=8, num_negative=8, batch_factor=2),
        ),
        # capped interleaved-CE mode: exercises the per-seed ce_orders
        # construction (vmap_loop) against loop.py's capped permutation
        (
            "contrastive_adapter",
            dict(num_positive=8, num_negative=8, batch_factor=2,
                 ca_ce_update=1),
        ),
        # pure-SupCon mode: train metrics via the weighted ZS eval pass
        (
            "contrastive_adapter",
            dict(num_positive=8, num_negative=8, batch_factor=2,
                 ca_ce_update=0),
        ),
    ],
    ids=["adapter", "seq_alter_ma", "seq_alter_ma_randominit", "adapter_reg",
         "adapter_reg_cp", "seq", "resample_ce", "linear_probing",
         "contrastive", "contrastive_ce_capped", "contrastive_pure_supcon"],
)
def test_vmapped_seeds_match_sequential(bundle, method, extra):
    cfg = TrainConfig(tl_method=method, epochs=5, **extra, **BASE)
    seeds = [42, 32]
    seq = run_seeds(cfg, bundle, seeds, use_vmap=False)
    vm = run_seeds(cfg, bundle, seeds, use_vmap=True)
    _assert_results_close(seq, vm)


def test_sweep_csv_schema(tmp_path, bundle):
    cfg = TrainConfig(tl_method="adapter", epochs=2, **BASE)
    out = run_sweep(
        cfg,
        bundle,
        seeds=[42, 32],
        result_root=str(tmp_path),
        use_vmap=True,
    )
    (path,) = out.keys()
    assert os.path.basename(path) == cell_filename(cfg)
    lines = open(path).read().strip().split("\n")
    index = [ln.split(",")[0] for ln in lines[1:]]
    # per-seed rows + mean/std rows for each of the five blocks
    assert index.count("1") == 5 and index.count("2") == 5
    for label in ("test", "zs_spu", "tr", "val", "zs_tg"):
        assert f"{label}_mean" in index and f"{label}_std" in index
    assert "worst_acc" in lines[0]


def test_cell_filename_encodes_config():
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=4,
        epochs_feature_learning=2,
        balance_val=True,
        add_adapter=True,
        **BASE,
    )
    name = cell_filename(cfg)
    assert name.startswith("ds_waterbirds_tl_adapter_reg_seq_alter_bs_128_lr_0.5")
    assert "_balval" in name and name.endswith("_MA+rn.csv")
    assert "_GP" not in name  # alter method omits the prompt tag


def test_vmapped_tiny_reg_batch_matches_sequential(bundle):
    """SURVEY.md hard part 3: BatchNorm at reg batch size 4 (the reference's
    best CelebA config) is statistics-noise-dominated by design — the vmapped
    seed axis must reproduce the sequential loop's trajectories exactly even
    in this regime."""
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=6, epochs_feature_learning=2,
        balance_val=True, warm_reg=True,
        **{**BASE, "batch_size_reg": 4, "dataset": "celeba"},
    )
    seeds = [42, 32]
    seq = run_seeds(cfg, bundle, seeds, use_vmap=False)
    vm = run_seeds(cfg, bundle, seeds, use_vmap=True)
    for (s_res, _), (v_res, _) in zip(seq, vm):
        for s_d, v_d in zip(s_res, v_res):
            for k in s_d:
                assert abs(s_d[k] - v_d[k]) < 2e-3, (k, s_d, v_d)


def test_seed_sharded_mesh_matches_unsharded(bundle):
    """Seed-axis sharding over the 8-device CPU mesh: an N-seed sweep is
    embarrassingly parallel, so the sharded run must reproduce the plain
    vmapped results (per-seed computations have no cross-seed reduction)."""
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        balance_val=True, add_adapter=True, init_near_identity=True,
        continue_from_best=True, **BASE,
    )
    seeds = list(range(42, 50))  # 8 seeds over 8 devices
    plain = run_seeds(cfg, bundle, seeds, use_vmap=True)
    mesh = make_mesh(axis_names=("data",))
    sharded = run_seeds(cfg, bundle, seeds, use_vmap=True, mesh=mesh)
    _assert_results_close(plain, sharded, tol=1e-6)


def test_seed_sharded_mesh_rejects_uneven_split(bundle):
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(tl_method="adapter", epochs=1, **BASE)
    mesh = make_mesh(axis_names=("data",))
    with pytest.raises(ValueError, match="divisible"):
        run_seeds(cfg, bundle, [42, 43, 44], use_vmap=True, mesh=mesh)


def test_vmapped_accepts_out_of_uint32_seeds(bundle):
    """PRNGKey accepts any 64-bit int; the vectorized key build must not
    silently wrap seeds >= 2**32 onto small seeds' keys.  (Negative seeds
    are rejected by numpy's Generator in BOTH loops, so they are out of
    scope for parity.)"""
    cfg = TrainConfig(tl_method="adapter", epochs=1, **BASE)
    big = [2 ** 32 + 5, 2 ** 33 + 7]
    seq = run_seeds(cfg, bundle, big, use_vmap=False)
    vm = run_seeds(cfg, bundle, big, use_vmap=True)
    _assert_results_close(seq, vm)


def test_stacked_lr_axis_matches_per_cell_runs(bundle, tmp_path):
    """lr-axis grid stacking: cells differing only in learning rate trained
    as stacked rows of ONE vmapped program must reproduce the per-cell runs
    exactly (same seeds, same RNG streams, per-row lr schedules)."""
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        balance_val=True, add_adapter=True, warm_reg=True, **BASE,
    )
    seeds = [42, 32]
    lrs = [0.5, 2.0]
    plain = run_sweep(
        cfg, bundle, seeds, lr_list=lrs, lr_multiple=2.0,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, lr_list=lrs, lr_multiple=2.0,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_lr_axis=True,
    )
    assert {os.path.basename(p) for p in plain} == {
        os.path.basename(p) for p in stacked
    }
    for path, results in plain.items():
        other = stacked[str(tmp_path / "stacked" / os.path.basename(path))]
        _assert_results_close(results, other, tol=1e-6)
        # CSV artifacts byte-identical
        with open(path) as f, open(
            str(tmp_path / "stacked" / os.path.basename(path))
        ) as g:
            assert f.read() == g.read()


def test_stacked_lr_axis_contrastive(bundle, tmp_path):
    """The contrastive method's per-row lr schedules stack too."""
    cfg = TrainConfig(
        tl_method="contrastive_adapter", epochs=2, num_anchor=2,
        num_positive=4, num_negative=4, batch_factor=2, **BASE,
    )
    seeds = [42]
    lrs = [0.1, 1.0]
    plain = run_sweep(
        cfg, bundle, seeds, lr_list=lrs,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, lr_list=lrs,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_lr_axis=True,
    )
    for path, results in plain.items():
        other = stacked[str(tmp_path / "stacked" / os.path.basename(path))]
        _assert_results_close(results, other, tol=1e-6)


def test_stacked_bsr_axis_matches_per_cell_runs(bundle, tmp_path):
    """bsr-axis grid stacking: cells differing in reg batch size (and lr)
    trained as padded rows of ONE vmapped program must reproduce the
    per-cell runs exactly — shorter reg epochs no-op through their padded
    tail (train/steps.py ``active`` gating) with per-row warmup schedules
    indexed by each row's real batch count."""
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        balance_val=True, add_adapter=True, warm_reg=True, **BASE,
    )
    seeds = [42, 32]
    lrs = [0.5, 2.0]
    bsrs = [8, 32]
    plain = run_sweep(
        cfg, bundle, seeds, lr_list=lrs, bsr_list=bsrs, lr_multiple=2.0,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, lr_list=lrs, bsr_list=bsrs, lr_multiple=2.0,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_lr_axis=True, stack_bsr_axis=True,
    )
    assert len(plain) == 4
    assert {os.path.basename(p) for p in plain} == {
        os.path.basename(p) for p in stacked
    }
    for path, results in plain.items():
        other = stacked[str(tmp_path / "stacked" / os.path.basename(path))]
        _assert_results_close(results, other, tol=1e-6)
        with open(path) as f, open(
            str(tmp_path / "stacked" / os.path.basename(path))
        ) as g:
            assert f.read() == g.read()


def test_stacked_bsr_axis_interleaved_reg(bundle, tmp_path):
    """The adapter_reg interleave method (train + reg pass every epoch)
    stacks its bsr axis too, without lr stacking."""
    cfg = TrainConfig(tl_method="adapter_reg", epochs=3, **BASE)
    seeds = [42]
    bsrs = [8, 32]
    plain = run_sweep(
        cfg, bundle, seeds, bsr_list=bsrs,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, bsr_list=bsrs,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_bsr_axis=True,
    )
    for path, results in plain.items():
        other = stacked[str(tmp_path / "stacked" / os.path.basename(path))]
        _assert_results_close(results, other, tol=1e-6)


def test_stacked_full_grid_matches_per_cell_runs(bundle, tmp_path):
    """The ENTIRE lr x bsr x bs grid as ONE vmapped program: train epochs
    pad per row exactly like reg epochs, so all 8 cells x 2 seeds train as
    16 rows of one program — byte-identical CSVs vs the per-cell path."""
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        balance_val=True, add_adapter=True, warm_reg=True, **BASE,
    )
    seeds = [42, 32]
    grid = dict(lr_list=[0.5, 2.0], bs_list=[16, 48], bsr_list=[8, 32],
                lr_multiple=2.0)
    plain = run_sweep(
        cfg, bundle, seeds, **grid,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, **grid,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_lr_axis=True, stack_bsr_axis=True, stack_bs_axis=True,
    )
    assert len(plain) == 8
    for path, results in plain.items():
        name = os.path.basename(path)
        other = stacked[str(tmp_path / "stacked" / name)]
        _assert_results_close(results, other, tol=1e-6)
        with open(path) as f, open(str(tmp_path / "stacked" / name)) as g:
            assert f.read() == g.read()


def test_stacked_bs_axis_no_reg_method(bundle, tmp_path):
    """bs stacking alone on a method with no reg phase (plain adapter ERM):
    the bsr axis is inert, so (lr x bs) stacks directly."""
    cfg = TrainConfig(tl_method="adapter", epochs=3, **BASE)
    seeds = [42]
    grid = dict(lr_list=[0.5, 2.0], bs_list=[16, 48])
    plain = run_sweep(
        cfg, bundle, seeds, **grid,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    stacked = run_sweep(
        cfg, bundle, seeds, **grid,
        result_root=str(tmp_path / "stacked"), use_vmap=True,
        stack_lr_axis=True, stack_bs_axis=True,
    )
    assert len(plain) == 4
    for path, results in plain.items():
        other = stacked[str(tmp_path / "stacked" / os.path.basename(path))]
        _assert_results_close(results, other, tol=1e-6)


def test_stacked_grid_sharded_over_mesh(bundle, tmp_path):
    """Grid-stacked rows (cells x seeds) shard over the device mesh exactly
    like seed rows: the full 8-cell grid x 1 seed fills the 8-device CPU
    mesh, multiplying the shardable width the reference's per-GPU grid
    cells (run_multiple/run_final_main_iteration_wb.sh:22-24) cannot."""
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        balance_val=True, add_adapter=True, warm_reg=True, **BASE,
    )
    grid = dict(lr_list=[0.5, 2.0], bs_list=[16, 48], bsr_list=[8, 32],
                lr_multiple=2.0)
    stack = dict(stack_lr_axis=True, stack_bsr_axis=True, stack_bs_axis=True)
    plain = run_sweep(
        cfg, bundle, [42], **grid, **stack,
        result_root=str(tmp_path / "plain"), use_vmap=True,
    )
    mesh = make_mesh(axis_names=("data",))
    sharded = run_sweep(
        cfg, bundle, [42], **grid, **stack, mesh=mesh,
        result_root=str(tmp_path / "sharded"), use_vmap=True,
    )
    assert len(plain) == 8
    for path, results in plain.items():
        name = os.path.basename(path)
        _assert_results_close(results, sharded[str(tmp_path / "sharded" / name)],
                              tol=1e-6)


def test_sweep_resume_skips_completed_cells(bundle, tmp_path):
    """skip_existing: a re-run of an interrupted grid retrains only the
    missing cells (the reference loses the whole sweep to one crash)."""
    cfg = TrainConfig(tl_method="adapter", epochs=2, **BASE)
    root = str(tmp_path / "r")
    first = run_sweep(cfg, bundle, [42], lr_list=[0.5, 2.0], result_root=root)
    assert len(first) == 2
    victim = sorted(first)[0]
    os.remove(victim)
    rerun = run_sweep(
        cfg, bundle, [42], lr_list=[0.5, 2.0], result_root=root,
        skip_existing=True,
    )
    # only the deleted cell was retrained; the survivor was skipped
    assert set(rerun) == {victim}
    assert os.path.isfile(victim)


def test_sweep_resume_stacks_only_missing_lr_cells(bundle, tmp_path):
    """Stacked mode + skip_existing keeps per-cell resume semantics: only
    the missing lr cells are (re)stacked and trained."""
    cfg = TrainConfig(tl_method="adapter", epochs=2, **BASE)
    root = str(tmp_path / "r")
    first = run_sweep(
        cfg, bundle, [42], lr_list=[0.5, 2.0], result_root=root,
        stack_lr_axis=True,
    )
    assert len(first) == 2
    victim = sorted(first)[1]
    os.remove(victim)
    rerun = run_sweep(
        cfg, bundle, [42], lr_list=[0.5, 2.0], result_root=root,
        stack_lr_axis=True, skip_existing=True,
    )
    assert set(rerun) == {victim}
    # retrained cell equals the original full-stack run's cell
    _assert_results_close(first[victim], rerun[victim], tol=1e-6)


def test_stacked_mesh_resume_pads_to_divisible_rows(bundle, tmp_path):
    """skip_existing + mesh: a resume whose surviving cell count does not
    divide the mesh data axis pads the stack with duplicate trailing cells
    (discarded on slicing) instead of refusing to run — crash-safe resume
    stays available under --seed_mesh."""
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(tl_method="adapter", epochs=2, **BASE)
    grid = dict(lr_list=[0.5, 1.0, 2.0, 4.0], stack_lr_axis=True)
    root = str(tmp_path / "r")
    mesh = make_mesh(axis_names=("data",))  # 8 virtual devices
    first = run_sweep(
        cfg, bundle, [42, 43], **grid, result_root=root, use_vmap=True,
        mesh=mesh,
    )
    assert len(first) == 4
    # kill 3 of 4 cells: 3 cells x 2 seeds = 6 rows, 6 % 8 != 0
    victims = sorted(first)[:3]
    for v in victims:
        os.remove(v)
    rerun = run_sweep(
        cfg, bundle, [42, 43], **grid, result_root=root, use_vmap=True,
        mesh=mesh, skip_existing=True,
    )
    assert set(rerun) == set(victims)
    for v in victims:
        _assert_results_close(first[v], rerun[v], tol=1e-6)


def test_stacked_mesh_odd_grid_runs_first_time(bundle, tmp_path):
    """A fresh stacked grid whose rows don't divide the mesh (3 cells x 1
    seed over 8 devices) pads and runs rather than raising."""
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(tl_method="adapter", epochs=2, **BASE)
    grid = dict(lr_list=[0.5, 1.0, 2.0], stack_lr_axis=True)
    mesh = make_mesh(axis_names=("data",))
    plain = run_sweep(
        cfg, bundle, [42], **grid, result_root=str(tmp_path / "p"),
        use_vmap=True,
    )
    sharded = run_sweep(
        cfg, bundle, [42], **grid, result_root=str(tmp_path / "s"),
        use_vmap=True, mesh=mesh,
    )
    assert len(plain) == len(sharded) == 3
    for path, results in plain.items():
        name = os.path.basename(path)
        _assert_results_close(results, sharded[str(tmp_path / "s" / name)],
                              tol=1e-6)

#!/usr/bin/env python
"""Diff produced sweep CSVs against BASELINE.md's reference numbers.

    python scripts/check_vs_baseline.py results_iterative [--tol 0.005]

For every known cell found under the results dir, compares the aggregated
test worst-group accuracy (test_mean row) to the reference's logged value.
PASS threshold is |ours - reference| <= tol + 2 * reference_std (the runs use
different RNG streams, so single-cell agreement is statistical, not bitwise;
see scripts/reproduce_reference.md §5).  Exits non-zero if any found cell
fails; cells not yet produced are listed as SKIP.
"""

import argparse
import csv
import os
import sys

# cell csv -> (reference test-wga mean, reference std).  Names and numbers
# verified against demo/demo_final_performance_and_ablations.ipynb cell
# outputs + BASELINE.md; the headline WB cell against results_waterbirds.out.
EXPECTED = {
    # headline configurations
    "ds_waterbirds_tl_adapter_reg_seq_alter_bs_1024_lr_1.0_lrr1.0_bsr256_MA+rn.csv":
        (0.8625, 0.0160),
    "ds_celeba_tl_adapter_reg_seq_alter_bs_1024_lr_0.1_lrr1.0_bsr4_balval_MA+rn.csv":
        (0.8944, 0.0055),
    "ds_celeba_tl_adapter_reg_seq_alter_bs_512_lr_10.0_lrr10.0_bsr32_balval_MA+rn.csv":
        (0.8806, 0.0196),
    # ablation ladder (notebook cells 7-21)
    "ds_waterbirds_tl_linear_probing_bs_512_lr_1.0.csv": (0.5960, 0.0063),
    "ds_waterbirds_tl_adapter_bs_1024_lr_10.0.csv": (0.6770, 0.0258),
    "ds_waterbirds_tl_adapter_reg_bs_512_lr_10.0_lrr10.0_bsr256_GP.csv":
        (0.7721, 0.0276),
    "ds_waterbirds_tl_adapter_reg_bs_512_lr_10.0_lrr10.0_bsr64_CP.csv":
        (0.8507, 0.0107),
    "ds_waterbirds_tl_adapter_reg_seq_bs_1024_lr_1.0_lrr1.0_bsr64_GP_MA+rn.csv":
        (0.7327, 0.0159),
    "ds_waterbirds_tl_adapter_reg_seq_bs_512_lr_10.0_lrr10.0_bsr256_CP_MA+rn.csv":
        (0.8535, 0.0027),
    "ds_waterbirds_tl_adapter_reg_seq_alter_bs_512_lr_10.0_lrr10.0_bsr256.csv":
        (0.8515, 0.0175),
    "ds_waterbirds_tl_adapter_reg_seq_alter_bs_1024_lr_1.0_lrr1.0_bsr512_balval_MA+rn.csv":
        (0.8511, 0.0091),
}


def test_mean_worst_acc(path: str):
    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    col = header.index("worst_acc")
    for row in rows[1:]:
        if row[0] == "test_mean":
            return float(row[col])
    raise ValueError(f"no test_mean row in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--tol", type=float, default=0.005)  # 0.5 pt north star
    ap.add_argument(
        "--structural",
        action="store_true",
        help="dress-rehearsal mode (synthetic fixture, random weights): "
        "verify every found cell parses with a valid test_mean worst_acc in "
        "[0, 1], report the diff, but do not enforce the accuracy band",
    )
    args = ap.parse_args()

    failures = 0
    found = 0
    for name, (want, std) in EXPECTED.items():
        path = os.path.join(args.results_dir, name)
        if not os.path.isfile(path):
            print(f"SKIP  {name} (not produced)")
            continue
        found += 1
        got = test_mean_worst_acc(path)
        if args.structural:
            ok = 0.0 <= got <= 1.0
            print(
                f"{'OK' if ok else 'BAD'}    {name}: wga {got:.4f} "
                f"(structural check only; reference {want:.4f})"
            )
        else:
            bound = args.tol + 2 * std
            ok = abs(got - want) <= bound
            print(
                f"{'PASS' if ok else 'FAIL'}  {name}: wga {got:.4f} vs "
                f"reference {want:.4f} +- {std:.4f} (bound {bound:.4f})"
            )
        failures += 0 if ok else 1
    if not found:
        print("no known cells found — run the sweeps first")
        return 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

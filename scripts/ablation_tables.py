#!/usr/bin/env python
"""Aggregate sweep CSVs into the report tables (the reference's
demo/demo_final_performance_and_ablations.ipynb as an executable script):
for every ``results_iterative/*.csv`` cell, print test worst-group accuracy
and weighted-mean accuracy as mean ± std over seeds, sorted by worst-group.

    python scripts/ablation_tables.py [results_iterative]
"""

import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_cell(path):
    rows = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            rows[row[0]] = dict(zip(header[1:], row[1:]))
    return rows


def main(root="results_iterative"):
    cells = []
    for path in sorted(glob.glob(os.path.join(root, "*.csv"))):
        rows = read_cell(path)
        # a sweep killed mid-write leaves a partial CSV (test rows only);
        # skip-and-warn instead of KeyError-aborting the whole table
        required = ("test_mean", "test_std", "zs_spu_mean")
        missing = [r for r in required if r not in rows]
        if missing:
            if rows:
                print(f"WARNING: skipping truncated {path} (no {missing[0]} row)")
            continue

        def get(row, key):
            v = rows[row].get(key, "")
            return float(v) if v else float("nan")

        cells.append(
            {
                "name": os.path.basename(path)[:-4],
                "wga": get("test_mean", "worst_acc"),
                "wga_std": get("test_std", "worst_acc"),
                "wmean": get("test_mean", "weighted_mean_acc"),
                "wmean_std": get("test_std", "weighted_mean_acc"),
                "zs_spu_mean": get("zs_spu_mean", "mean_acc"),
            }
        )
    if not cells:
        print(f"no sweep CSVs under {root!r}")
        return 1
    cells.sort(key=lambda c: -c["wga"])
    namew = max(len(c["name"]) for c in cells)
    print(f"{'config':<{namew}}  {'test wga':>16}  {'test wmean':>16}  {'zs spurious':>11}")
    for c in cells:
        print(
            f"{c['name']:<{namew}}  "
            f"{c['wga']:.4f} ± {c['wga_std']:.4f}  "
            f"{c['wmean']:.4f} ± {c['wmean_std']:.4f}  "
            f"{c['zs_spu_mean']:>11.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

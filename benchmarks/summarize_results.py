#!/usr/bin/env python
"""Summarize quality_sweep JSONL results: per-family mean±std over seeds.

Usage: python benchmarks/summarize_results.py results_*.jsonl [--key miou]

Prints one line per (file, family): n seeds, mean±std of --key, mean tower
IoU, mean OA, and the per-seed values — the numbers BASELINE.md tables quote.
"""

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--key", default="miou")
    args = ap.parse_args()
    for path in args.files:
        rows = {}
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "summary" not in r:
                    print(f"{path}: {r.get('family')} s{r.get('seed')} "
                          f"ERROR {r.get('error')}", file=sys.stderr)
                    continue
                rows.setdefault(r["family"], []).append(r)
        for fam, rs in rows.items():
            rs = sorted(rs, key=lambda r: r["seed"])
            vals = np.array([r["summary"][args.key] for r in rs])
            tower = np.array([r["summary"].get("iou_tower", np.nan) for r in rs])
            oa = np.array([r["summary"].get("oa", np.nan) for r in rs])
            per_seed = " ".join(f"s{r['seed']}={v:.4f}" for r, v in zip(rs, vals))
            print(f"{path} {fam}: n={len(rs)} {args.key}="
                  f"{vals.mean():.4f}±{vals.std(ddof=1) if len(rs) > 1 else 0:.4f} "
                  f"tower={np.nanmean(tower):.3f} oa={np.nanmean(oa):.4f} | {per_seed}")


if __name__ == "__main__":
    main()

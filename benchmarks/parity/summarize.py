#!/usr/bin/env python
"""Summarize the head-to-head quality-parity runs into a markdown table.

Reads the ``ampnet test`` JSON outputs produced by the parity protocol (see
benchmarks/parity/ref_train.py and BASELINE.md) and prints per-class IoU / mIoU /
OA side by side. The reference checkpoint is evaluated through ampnet's own tiled
tester via the .pth importer (core/torch_import.py, forward parity 2e-4), so every
arm shares one evaluation protocol, dataset, and split.
"""

import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # ampnet test prints one JSON object (possibly after log lines)
    start = txt.find("{")
    obj = json.loads(txt[start:])
    return obj.get("summary", obj)


def main(argv):
    arms = []
    for spec in argv:
        name, path = spec.split("=", 1)
        arms.append((name, load(path)))
    keys = [k for k in arms[0][1] if k.startswith("iou_")] + ["miou", "oa"]
    print("| arm | " + " | ".join(k.replace("iou_", "") for k in keys) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for name, s in arms:
        cells = [f"{s.get(k, float('nan')):.3f}" for k in keys]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1:])

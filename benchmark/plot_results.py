#!/usr/bin/env python
"""Render column plots from benchmark/results/*.json
(≡ reference benchmark/scripts/plot_benchmark_results.py -> assets/*.png)."""

import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")
ASSETS = os.path.join(os.path.dirname(HERE), "assets")


def plot_file(path):
    with open(path) as f:
        data = json.load(f)
    rows = data["rows"]
    workload = data["workload"]
    if workload == "throughput":
        # grouped by mode, one bar per validation level
        modes = sorted({r["mode"] for r in rows})
        vals = ["none", "ascii", "ascii_quality"]
        fig, ax = plt.subplots(figsize=(8, 4.5))
        width = 0.25
        for vi, val in enumerate(vals):
            xs, ys = [], []
            for mi, mode in enumerate(modes):
                cell = [r for r in rows if r["mode"] == mode
                        and r.get("validation") == val]
                if cell:
                    xs.append(mi + (vi - 1) * width)
                    ys.append(cell[0]["gbps"])
            ax.bar(xs, ys, width=width, label=val)
        ax.set_xticks(range(len(modes)))
        ax.set_xticklabels(modes)
        ax.set_ylabel("GB/s")
        ax.set_title("FASTQ throughput by mode and validation level")
        ax.legend(title="validation")
    else:
        labels = [r["mode"] for r in rows]
        means = [r.get("mean_s", r.get("parse_seconds", 0)) for r in rows]
        errs = [max(r["times"]) - min(r["times"]) if "times" in r else 0
                for r in rows]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.bar(labels, means, yerr=errs, capsize=4)
        ax.set_ylabel("seconds (mean)")
        ax.set_title("%s workload (%.0f MB corpus)"
                     % (workload, data["corpus_bytes"] / 1e6))
    os.makedirs(ASSETS, exist_ok=True)
    out = os.path.join(ASSETS, "benchmark_%s.png" % workload)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def main():
    paths = sys.argv[1:] or glob.glob(os.path.join(RESULTS, "*.json"))
    if not paths:
        print("no results; run benchmark/bench_harness.py first")
        return 1
    for p in paths:
        plot_file(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Training-curve plots from tools/train.py JSON-lines logs.

Each --log is `label=path[,path...]` (several paths chain sequentially: a run
resumed across sessions; env_steps accumulate across the chain).  Plots
eval_mean_return vs cumulative env steps, one series per label, and writes a
PNG.

  python tools/plot_curves.py --out docs/kepler_curve.png \
      --log "SAC (target entropy -6)=/tmp/kepler_r2c.log,/tmp/kepler_r2d.log" \
      --hline 250 --hline-label "round-2 target"
"""
from __future__ import annotations

import argparse
import json
import os

# Fixed categorical hue order (dataviz palette, light mode); color follows
# the series label, never its rank in a filtered view.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]
TEXT, TEXT2, GRID = "#0b0b0b", "#52514e", "#e5e4e0"


def parse_chain(paths):
    """Chained logs -> (env_steps, eval_return) with cumulative steps."""
    xs, ys = [], []
    base = 0
    for path in paths:
        seen_steps = 0
        evals = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "env_steps" in d:
                    seen_steps = max(seen_steps, d["env_steps"])
                if "eval_mean_return" in d:
                    evals.append((d["iter"], d["eval_mean_return"]))
        # convert iters to steps with this log's steps-per-iter
        if evals and seen_steps:
            max_iter = max(i for i, _ in evals)
            spi = seen_steps / max(max_iter, 1)
            for i, r in evals:
                xs.append(base + i * spi)
                ys.append(r)
            base += seen_steps
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", action="append", required=True,
                    help="label=path[,path...] (chained resumed runs)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default="")
    ap.add_argument("--hline", type=float, action="append", default=None)
    ap.add_argument("--hline-label", action="append", default=None)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=140)
    fig.patch.set_facecolor("#fcfcfb")
    ax.set_facecolor("#fcfcfb")

    n_series = len(args.log)
    for i, spec in enumerate(args.log):
        label, paths = spec.split("=", 1)
        xs, ys = parse_chain(paths.split(","))
        ax.plot([x / 1e6 for x in xs], ys, color=SERIES[i % len(SERIES)],
                linewidth=2, label=label, solid_capstyle="round")

    for j, h in enumerate(args.hline or []):
        ax.axhline(h, color=TEXT2, linewidth=1, linestyle=(0, (4, 4)))
        labels = args.hline_label or []
        if j < len(labels) and labels[j]:
            ax.annotate(labels[j], xy=(0.99, h),
                        xycoords=("axes fraction", "data"),
                        xytext=(0, 4), textcoords="offset points",
                        ha="right", fontsize=8, color=TEXT2)

    ax.set_xlabel("env steps (millions)", color=TEXT2, fontsize=9)
    ax.set_ylabel("eval mean return", color=TEXT2, fontsize=9)
    if args.title:
        ax.set_title(args.title, color=TEXT, fontsize=11, loc="left")
    ax.grid(True, color=GRID, linewidth=0.7)
    ax.tick_params(colors=TEXT2, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    if n_series > 1:
        ax.legend(frameon=False, fontsize=8, labelcolor=TEXT)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

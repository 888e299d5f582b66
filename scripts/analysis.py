"""Trajectory/monitor analysis: plot etot/ekin/epot/T vs time from
monitor_{k}.csv files (equivalent of the reference's scripts/analysis.py).

Usage: python scripts/analysis.py <log_dir> [--out plot.png]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--out", default=None, help="Write a PNG instead of showing")
    args = ap.parse_args()

    import pandas as pd

    files = sorted(glob.glob(os.path.join(args.log_dir, "monitor_*.csv")))
    if not files:
        raise SystemExit(f"No monitor_*.csv files in {args.log_dir}")

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
    for f in files:
        df = pd.read_csv(f, comment="#")
        label = os.path.basename(f).replace("monitor_", "r").replace(".csv", "")
        axes[0].plot(df["ns"], df["epot"], label=f"{label} epot", alpha=0.8)
        axes[0].plot(df["ns"], df["ekin"], label=f"{label} ekin", alpha=0.8)
        axes[0].plot(df["ns"], df["etot"], label=f"{label} etot", alpha=0.8)
        axes[1].plot(df["ns"], df["T"], label=label, alpha=0.8)
    axes[0].set_ylabel("energy (kcal/mol)")
    axes[0].legend(fontsize=7)
    axes[1].set_ylabel("T (K)")
    axes[1].set_xlabel("time (ns)")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=120)
        print("wrote", args.out)
    else:
        plt.show()


if __name__ == "__main__":
    main()

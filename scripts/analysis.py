"""Trajectory/monitor analysis.

- monitor plots: etot/ekin/epot/T vs time from monitor_{k}.csv
  (equivalent of the reference's scripts/analysis.py pandas plot).
- structural analysis (self-contained, on-device; the reference needs
  moleculekit for this): --rmsd / --rdf / --msd run over the saved
  {output}_{k}.npy trajectories via torchmd_tpu.analysis.

Usage:
  python scripts/analysis.py <log_dir> [--out plot.png]
  python scripts/analysis.py <log_dir> --traj output_0.npy --rmsd rmsd.csv
  python scripts/analysis.py <log_dir> --traj output_0.npy --box 77.4 \
      --rdf rdf.csv [--rdf-bins 120]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--out", default=None, help="Write a PNG instead of showing")
    ap.add_argument("--traj", default=None,
                    help="Trajectory .npy inside log_dir for structural analysis")
    ap.add_argument("--rmsd", default=None, help="Write per-frame RMSD CSV")
    ap.add_argument("--rdf", default=None, help="Write g(r) CSV (needs --box)")
    ap.add_argument("--msd", default=None, help="Write MSD-vs-lag CSV")
    ap.add_argument("--box", type=float, nargs="+", default=None,
                    help="Box diagonal (1 or 3 values) for the RDF")
    ap.add_argument("--rdf-bins", type=int, default=100)
    args = ap.parse_args()

    if args.traj is not None:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import numpy as np
        from torchmd_tpu import analysis

        traj = np.load(os.path.join(args.log_dir, args.traj))
        if args.rmsd:
            vals = analysis.rmsd(traj)
            np.savetxt(args.rmsd, np.column_stack([np.arange(len(vals)), vals]),
                       delimiter=",", header="frame,rmsd", comments="")
            print("wrote", args.rmsd)
        if args.rdf:
            if args.box is None:
                raise SystemExit("--rdf needs --box")
            b = args.box * 3 if len(args.box) == 1 else args.box
            r, g = analysis.rdf(traj, b, nbins=args.rdf_bins)
            np.savetxt(args.rdf, np.column_stack([r, g]), delimiter=",",
                       header="r,g", comments="")
            print("wrote", args.rdf)
        if args.msd:
            vals = analysis.msd(traj)
            np.savetxt(args.msd, np.column_stack([np.arange(len(vals)), vals]),
                       delimiter=",", header="lag,msd", comments="")
            print("wrote", args.msd)
        if not (args.rmsd or args.rdf or args.msd):
            raise SystemExit("--traj given but no analysis selected")
        return

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

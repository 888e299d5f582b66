"""Trajectory/monitor analysis (thin wrapper).

The implementation lives in torchmd_tpu.analysis (also reachable as
`torchmd-tpu analyze <log_dir> ...`):

- monitor plots: etot/ekin/epot/T vs time from monitor_{k}.csv
  (equivalent of the reference's scripts/analysis.py pandas plot).
- structural analysis (self-contained, on-device; the reference needs
  moleculekit for this): --rmsd / --rdf / --msd over the saved
  {output}_{k}.npy trajectories.

Usage:
  python scripts/analysis.py <log_dir> [--out plot.png]
  python scripts/analysis.py <log_dir> --traj output_0.npy --rmsd rmsd.csv
  python scripts/analysis.py <log_dir> --traj output_0.npy --box 77.4 \
      --rdf rdf.csv [--rdf-bins 120]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torchmd_tpu.analysis import main

if __name__ == "__main__":
    main()

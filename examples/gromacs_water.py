"""GROMACS workflow example: TIP4P/2005 water from .top + .gro + .mdp.

Run:
    JAX_PLATFORMS=cpu python examples/gromacs_water.py

Builds the standard GROMACS input triple on the fly (a TIP4P/2005
topology with SETTLE + a virtual M site, a .gro box, an .mdp run config),
then drives the CLI machinery exactly as
    python -m torchmd_tpu.run --conf md.mdp --topology topol.top \
        --coordinates conf.gro --forcefield topol.top
would: .mdp keys translate onto the namespace, the topology assembles
through the GROMACS direct-assembly path, rigid waters ride SETTLE, and
the massless M site is reconstructed inside the compiled scan with its
forces spread onto the real atoms.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOP = """\
[ defaults ]
  1 2 yes 0.5 0.8333

[ atomtypes ]
  OW  8 15.99940  0.0     A  0.31589  0.7749
  HW  1  1.00800  0.5564  A  0.0      0.0
  MW  0  0.00000 -1.1128  D  0.0      0.0

[ moleculetype ]
  SOL 2

[ atoms ]
  1 OW 1 SOL OW  1  0.0000 15.9994
  2 HW 1 SOL HW1 1  0.5564  1.008
  3 HW 1 SOL HW2 1  0.5564  1.008
  4 MW 1 SOL MW  1 -1.1128  0.000

[ settles ]
  1 1 0.09572 0.15139

[ virtual_sites3 ]
  4 1 2 3 1 0.13193828 0.13193828

[ exclusions ]
1 2 3 4
2 1 3 4
3 1 2 4
4 1 2 3

[ system ]
tip4p/2005 box

[ molecules ]
SOL 27
"""

MDP = """\
integrator  = sd
dt          = 0.002
nsteps      = 200
nstenergy   = 50
nstxout-compressed = 100
rvdw        = 0.55
rcoulomb    = 0.55
coulombtype = Reaction-Field
epsilon-rf  = 78.5
ref_t       = 300
tau_t       = 1.0
gen-vel     = yes
gen-temp    = 300
constraints = h-bonds
"""


def water(origin):
    doh, theta = 0.9572, np.radians(104.52)
    o = np.asarray(origin, dtype=np.float64)
    h1 = o + doh * np.array([np.cos(theta / 2), np.sin(theta / 2), 0.0])
    h2 = o + doh * np.array([np.cos(theta / 2), -np.sin(theta / 2), 0.0])
    return np.stack([o, h1, h2, o])


def main():
    from torchmd_tpu import run as runmod
    from torchmd_tpu.io import Molecule

    work = tempfile.mkdtemp(prefix="tmd_gmx_")
    top = os.path.join(work, "topol.top")
    gro = os.path.join(work, "conf.gro")
    mdp = os.path.join(work, "md.mdp")
    with open(top, "w") as fh:
        fh.write(TOP)
    with open(mdp, "w") as fh:
        fh.write(MDP)

    # 3x3x3 lattice of waters, 13.5 A box
    mol = Molecule(top)
    pts = []
    for ix in range(3):
        for iy in range(3):
            for iz in range(3):
                pts.append(water(np.array([ix, iy, iz]) * 4.5 + 1.2))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 13.5)
    mol.write(gro)

    logdir = os.path.join(work, "out")
    args = runmod.get_args([
        "--conf", mdp,
        "--topology", top,
        "--coordinates", gro,
        "--forcefield", top,
        "--forceterms", "bonds", "lj", "electrostatics",
        "--precision", "double",
        "--device", "cpu",
        "--log-dir", logdir,
    ])
    print(f"translated from md.mdp: timestep={args.timestep} fs, "
          f"steps={args.steps}, cutoff={args.cutoff} A, "
          f"constraints={args.constraints}, "
          f"thermostat={args.thermostat} gamma={args.langevin_gamma}/ps")
    mol2, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol2, system, forces)

    rows = open(os.path.join(logdir, "monitor_0.csv")).read().splitlines()
    print("monitor tail:")
    for r in rows[:1] + rows[-3:]:
        print("  " + r)
    print(f"outputs in {logdir}")


if __name__ == "__main__":
    main()

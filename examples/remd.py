"""Temperature replica-exchange MD example: a 6-rung ladder on the
bundled waterbox, all replicas integrating inside one vmapped scan.

Run (CPU f64 works; TPU f32 is the production path):
    JAX_PLATFORMS=cpu python examples/remd.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

# the site hook may pre-import jax with the TPU plugin; force CPU
# explicitly when requested (see CLAUDE.md)
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torchmd_tpu.forces import Forces  # noqa: E402
from torchmd_tpu.forcefields import ForceField  # noqa: E402
from torchmd_tpu.integrator import maxwell_boltzmann  # noqa: E402
from torchmd_tpu.io import Molecule  # noqa: E402
from torchmd_tpu.parameters import Parameters  # noqa: E402
from torchmd_tpu.remd import ReplicaExchange  # noqa: E402
from torchmd_tpu.systems import System  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "tests", "data", "waterbox")
TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]

# geometric ladder, ~7% spacing: healthy acceptance on a 293-atom box
TEMPS = [300.0 * 1.07**k for k in range(6)]


def main():
    mol = Molecule(os.path.join(DATA, "structure.psf"))
    mol.read(os.path.join(DATA, "output.xtc"))
    mol.dropFrames(keep=0)
    ff = ForceField.create(
        mol, [os.path.join(DATA, p) for p in os.listdir(DATA)
              if p.endswith((".prm", ".rtf"))]
    )
    par = Parameters(ff, mol, TERMS, precision="double")
    cutoff = float(np.min(mol.box)) / 2 - 0.01
    forces = Forces(par, terms=TERMS, precision="double",
                    cutoff=cutoff, rfa=True, switch_dist=6.0)

    R = len(TEMPS)
    system = System(mol.numAtoms, R, "double")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(np.concatenate(
        [np.asarray(maxwell_boltzmann(par.masses, t, 1, seed=i))
         for i, t in enumerate(TEMPS)]
    ))

    rex = ReplicaExchange(system, forces, timestep=1.0, temperatures=TEMPS,
                          gamma=2.0, seed=7)
    print("ladder:", " ".join(f"{t:.0f}K" for t in TEMPS))
    for sweep in range(10):
        ekin, epot, T = rex.run(nsteps=100, exchange_period=25)
        print(
            f"sweep {sweep:2d}  T = "
            + " ".join(f"{t:6.1f}" for t in T)
            + f"   walkers {list(rex.walker_id)}"
        )
    rates = rex.acceptance_rates
    print("\npair acceptance:",
          " ".join(f"{r:.2f}" for r in np.nan_to_num(rates)))
    print("walker permutation after exchange:", list(rex.walker_id))


if __name__ == "__main__":
    main()

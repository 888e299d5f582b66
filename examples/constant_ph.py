"""Constant-pH lambda-dynamics example: a titration curve from MD.

Run:
    JAX_PLATFORMS=cpu python examples/constant_ph.py

One argon-gas "titratable site" (atom 0's nonbonded coupling) runs
lambda-dynamics at a ladder of pH values around the model pKa. The pH
bias tilts the coupling free energy by ln(10) kT (pH - pKa) per lambda;
sampling the fraction of frames spent coupled traces the
Henderson-Hasselbalch sigmoid, with the midpoint at the model pKa (this
toy site has no environment-induced pKa shift, so the curve centers on
pKa_model — in a protein the shift IS the observable).
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

from torchmd_tpu.forcefields import ForceField  # noqa: E402
from torchmd_tpu.forces import Forces  # noqa: E402
from torchmd_tpu.integrator import maxwell_boltzmann  # noqa: E402
from torchmd_tpu.io import Molecule  # noqa: E402
from torchmd_tpu.lambda_dynamics import (  # noqa: E402
    LambdaDynamics,
    make_lambda_sites,
    ph_bias,
    protonation_fraction,
)
from torchmd_tpu.parameters import Parameters  # noqa: E402
from torchmd_tpu.systems import System  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
ARGON = os.path.join(HERE, "..", "tests", "systems", "argon")
T = 120.0
PKA = 5.0
STEPS = 3000


def titrate(pH, seed=1):
    mol = Molecule(os.path.join(ARGON, "argon_start.pdb"))
    ff = ForceField.create(mol, os.path.join(ARGON, "argon_forcefield.yaml"))
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    couplings = make_lambda_sites(forces, [[0]])
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=seed))
    ld = LambdaDynamics(
        system, forces, couplings,
        biases=[ph_bias(pKa_model=PKA, pH=pH, T=T, barrier=0.5)],
        timestep=2.0, T=T, gamma=5.0, lam0=0.5, seed=seed,
    )
    ld.step(niter=STEPS // 3)  # equilibrate
    _, _, _, lams = ld.step(niter=STEPS)
    return protonation_fraction(lams, threshold=0.5)[0]


def main():
    print(f"model pKa = {PKA}; titrating (this runs {STEPS} MD steps/pH)")
    print(f"{'pH':>5} {'coupled fraction':>18} {'HH prediction':>15}")
    for pH in (3.0, 4.0, 5.0, 6.0, 7.0):
        frac = titrate(pH)
        hh = 1.0 / (1.0 + 10.0 ** (pH - PKA))
        print(f"{pH:5.1f} {frac:18.2f} {hh:15.2f}")
    print("\nThe sampled coupled fraction follows the Henderson-Hasselbalch")
    print("sigmoid; in a real protein the deviation from the model curve")
    print("is the pKa shift induced by the environment.")


if __name__ == "__main__":
    main()

"""Alchemical free-energy workflow example: decouple one LJ particle from
an argon fluid and integrate dF by TI, cross-checked with BAR.

Run (CPU f64 works; TPU f32 is the production path):
    JAX_PLATFORMS=cpu python examples/free_energy.py

Workflow:
  1. build an argon box, pick one atom as the alchemical solute
  2. for each lambda window: equilibrate + sample with Langevin MD,
     record <dU/dlambda> (TI) and the cross-window energy differences
     (forward/reverse work for BAR)
  3. dF_TI = trapezoid(<dU/dl>), dF_BAR from the work distributions
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

import jax.numpy as jnp  # noqa: E402

from torchmd_tpu.alchemy import bar, make_alchemical, ti_integrate  # noqa: E402
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield  # noqa: E402
from torchmd_tpu.forces import Forces  # noqa: E402
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann  # noqa: E402
from torchmd_tpu.io import Molecule  # noqa: E402
from torchmd_tpu.parameters import Parameters  # noqa: E402
from torchmd_tpu.systems import System  # noqa: E402
from torchmd_tpu.units import BOLTZMANN  # noqa: E402

T = 120.0
LAMBDAS = np.linspace(0.0, 1.0, 6)
N_EQUIL, N_SAMPLE, SAMPLE_EVERY = 200, 600, 20


def build(natoms=32, L=16.0, seed=0):
    rs = np.random.RandomState(seed)
    g = int(np.ceil(natoms ** (1 / 3)))
    pts = np.stack(np.meshgrid(*[np.arange(g)] * 3), -1).reshape(-1, 3)
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(["AR"] * natoms, dtype=object)
    mol.charge = np.zeros(natoms)
    mol.masses = np.full(natoms, 39.95)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    mol.coords = ((pts[:natoms] + 0.5) * (L / g)
                  + 0.2 * rs.randn(natoms, 3))[:, :, None]
    mol.box = np.full((3, 1), L)
    ff = YamlForcefield(mol, {
        "atomtypes": ["AR"],
        "lj": {"AR": {"sigma": 3.345, "epsilon": 0.238}},
        "electrostatics": {"AR": {"charge": 0.0}},
        "masses": {"AR": 39.95},
    })
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=7.0)
    return mol, par, forces


def sample_window(lam, seed):
    mol, par, forces = build(seed=1)
    coupling = make_alchemical(forces, alch_atoms=[0], lam=lam, alpha=0.5)
    system = System(mol.numAtoms, 1, "double")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=seed))
    integ = Integrator(system, forces, 2.0, gamma=2.0, T=T, seed=seed)
    integ.step(niter=N_EQUIL)

    dudls, frames = [], []
    for _ in range(N_SAMPLE // SAMPLE_EVERY):
        integ.step(niter=SAMPLE_EVERY)
        pos = jnp.asarray(system.pos[0])
        box = jnp.asarray(np.diag(system.box[0]))
        dudls.append(float(coupling.dudl(pos, box, lam)))
        frames.append((pos, box))
    return coupling, dudls, frames


def main():
    kT = BOLTZMANN * T
    means, couplings, all_frames = [], [], []
    for w, lam in enumerate(LAMBDAS):
        coupling, dudls, frames = sample_window(float(lam), seed=w + 1)
        means.append(np.mean(dudls))
        couplings.append(coupling)
        all_frames.append(frames)
        print(f"lambda={lam:.2f}  <dU/dl> = {means[-1]:+8.4f} "
              f"kcal/mol  ({len(dudls)} samples)")

    df_ti = ti_integrate(LAMBDAS, means)
    print(f"\nTI:  dF(decoupled -> coupled) = {df_ti:+.4f} kcal/mol")

    # BAR over each adjacent window pair, summed
    df_bar = 0.0
    for w in range(len(LAMBDAS) - 1):
        l0, l1 = float(LAMBDAS[w]), float(LAMBDAS[w + 1])
        c = couplings[w]
        w_f = [float(c.energy_lambda(p, b, l1) - c.energy_lambda(p, b, l0))
               for p, b in all_frames[w]]
        c1 = couplings[w + 1]
        w_r = [float(c1.energy_lambda(p, b, l0) - c1.energy_lambda(p, b, l1))
               for p, b in all_frames[w + 1]]
        df_bar += bar(np.array(w_f), np.array(w_r), kT)
    print(f"BAR: dF(decoupled -> coupled) = {df_bar:+.4f} kcal/mol")
    print(f"(estimator spread {abs(df_ti - df_bar):.4f} kcal/mol, "
          f"kT = {kT:.4f})")


if __name__ == "__main__":
    main()

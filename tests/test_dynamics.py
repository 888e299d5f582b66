"""Dynamics-level physics tests the reference lacks (SURVEY.md §4):
NVE energy conservation and minimizer behavior on real systems."""

from __future__ import annotations

import os

import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, kinetic_energy
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System


def _make(folder, terms=None, **nbover):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, folder))
    nbconf.update(nbover)
    terms = terms or ALL_TERMS
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", **nbconf)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    return mol, par, forces, system


def test_nve_energy_conservation_waterbox():
    """NVE (no thermostat) with 0.5 fs steps must conserve E to high
    accuracy in f64."""
    mol, par, forces, system = _make("waterbox")
    from torchmd_tpu.integrator import maxwell_boltzmann

    system.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=0))
    integ = Integrator(system, forces, timestep=0.5, device="cpu")

    def total_energy():
        epot = forces.compute(system.pos, system.box)[0]
        ekin = float(np.asarray(kinetic_energy(integ.masses, system.vel))[0, 0])
        return epot + ekin

    e0 = total_energy()
    for _ in range(5):
        integ.step(niter=20)
    e1 = total_energy()
    natoms = system.natoms
    drift_per_atom = abs(e1 - e0) / natoms
    # bound reflects velocity-Verlet discretization error for stiff O-H
    # bonds at 0.5 fs, not integrator bugs (halving dt quarters it)
    assert drift_per_atom < 2e-3, (e0, e1)


def test_minimize_bfgs_reduces_energy():
    mol, par, forces, system = _make("benzamidine")
    from torchmd_tpu.minimizers import minimize_bfgs

    e_before = forces.compute(system.pos, system.box)[0]
    minimize_bfgs(system, forces, steps=100, verbose=False)
    e_after = forces.compute(system.pos, system.box)[0]
    assert e_after < e_before - 1.0
    # forces should be small at the minimum
    fmax = np.abs(np.asarray(forces.last_forces)).max()
    assert fmax < 5.0


def test_minimize_lbfgs_on_device():
    mol, par, forces, system = _make("benzamidine")
    from torchmd_tpu.minimizers import minimize_lbfgs

    e_before = forces.compute(system.pos, system.box)[0]
    minimize_lbfgs(system, forces, steps=3, max_iter=10, verbose=False)
    e_after = forces.compute(system.pos, system.box)[0]
    assert e_after < e_before


def test_minimize_cg_reduces_energy():
    mol, par, forces, system = _make("benzamidine")
    from torchmd_tpu.minimizers import minimize_cg

    e_before = forces.compute(system.pos, system.box)[0]
    minimize_cg(system, forces, steps=15)
    e_after = forces.compute(system.pos, system.box)[0]
    assert e_after < e_before


def test_langevin_equilibrates_real_system():
    mol, par, forces, system = _make("waterbox")
    from torchmd_tpu.integrator import maxwell_boltzmann

    system.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=0))
    integ = Integrator(
        system, forces, timestep=1.0, device="cpu", gamma=1.0, T=300.0, seed=5
    )
    temps = []
    for _ in range(10):
        _, _, T = integ.step(niter=10)
        temps.append(T[0])
    assert 150 < np.mean(temps[3:]) < 450


def test_minimize_fire_on_device():
    mol, par, forces, system = _make("benzamidine")
    from torchmd_tpu.minimizers import minimize_fire

    e_before = forces.compute(system.pos, system.box)[0]
    hist = minimize_fire(system, forces, steps=400)
    e_after = forces.compute(system.pos, system.box)[0]
    assert e_after < e_before - 1.0
    assert hist[-1] < hist[0]
    fmax = np.abs(np.asarray(forces.last_forces)).max()
    assert fmax < 10.0

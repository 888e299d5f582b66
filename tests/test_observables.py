"""Virial / pressure observables."""

from __future__ import annotations

import os

import numpy as np

from conftest import SYSTEMS_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forcefields.forcefield import NullForcefield
from torchmd_tpu.integrator import maxwell_boltzmann
from torchmd_tpu.io import Molecule
from torchmd_tpu.observables import ideal_gas_pressure, pressure
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System


def test_ideal_gas_pressure():
    """With no interactions, P must equal the kinetic (ideal-gas) pressure
    for the instantaneous velocities exactly."""
    N, L, T = 200, 30.0, 250.0
    rs = np.random.RandomState(0)
    mol = Molecule()
    mol.numAtoms = N
    mol.atomtype = np.array(["X"] * N, dtype=object)
    mol.charge = np.zeros(N)
    mol.masses = np.full(N, 20.0)
    mol.coords = (rs.rand(N, 3) * L)[:, :, None]

    par = Parameters(NullForcefield(mol), mol, [], precision="double")
    forces = Forces(par, terms=[], precision="double")
    system = System(N, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.array([L, L, L]))
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=1))

    P = pressure(forces, system)[0]
    # exact: P = 2K/(3V) for the actual sampled velocities
    from torchmd_tpu.integrator import kinetic_energy
    from torchmd_tpu.observables import KCALMOL_A3_TO_BAR

    K = float(np.asarray(kinetic_energy(par.masses, system.vel))[0, 0])
    expected = 2 * K / (3 * L**3) * KCALMOL_A3_TO_BAR
    np.testing.assert_allclose(P, expected, rtol=1e-10)
    # and statistically close to NkT/V
    assert abs(P - ideal_gas_pressure(N, T, L**3)) / P < 0.2


def test_lj_virial_sign():
    """A compressed LJ gas must show strongly positive pressure; a dilute
    one near-kinetic pressure."""
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)

    def p_for_scale(scale):
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords[:, :, 0][:, :, None] * scale)
        system.set_box(np.array([77.395 * scale] * 3))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 120.0, 1, seed=2)
        )
        return pressure(forces, system)[0]

    p_dilute = p_for_scale(1.0)
    p_dense = p_for_scale(0.25)  # 64x density
    assert p_dense > p_dilute
    assert p_dense > 0

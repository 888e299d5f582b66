"""Monte Carlo barostat: exact ideal-gas NPT volume law + interacting run."""

from __future__ import annotations

import numpy as np
import pytest

from torchmd_tpu.barostat import BAR_A3_TO_KCALMOL, MonteCarloBarostat
from torchmd_tpu.forces import Forces
from torchmd_tpu.forcefields.forcefield import NullForcefield
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System
from torchmd_tpu.units import BOLTZMANN


def test_ideal_gas_volume_law():
    """Non-interacting particles under the MC barostat must sample
    P(V) ~ V^N exp(-PV/kT): <V> = (N+1) kT / P. Exact statistical check."""
    N = 64
    T = 300.0
    P_bar = 400.0
    P = P_bar * BAR_A3_TO_KCALMOL
    target_V = (N + 1) * BOLTZMANN * T / P

    rs = np.random.RandomState(0)
    mol = Molecule()
    mol.numAtoms = N
    mol.atomtype = np.array(["X"] * N, dtype=object)
    mol.charge = np.zeros(N)
    mol.masses = np.full(N, 40.0)
    L0 = target_V ** (1 / 3)
    mol.coords = (rs.rand(N, 3) * L0)[:, :, None]

    par = Parameters(NullForcefield(mol), mol, [], precision="double")
    forces = Forces(par, terms=[], precision="double")
    system = System(N, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.array([L0, L0, L0]))

    baro = MonteCarloBarostat(P_bar, T, seed=1)
    vols = []
    for i in range(3000):
        baro.attempt(system, forces)
        if i >= 500:
            vols.append(float(np.prod(np.diag(system.box[0]))))
    mean_v = np.mean(vols)
    # <V> = (N+1) kT / P within sampling error (~ V/sqrt(Neff))
    assert abs(mean_v - target_V) / target_V < 0.1, (mean_v, target_V)
    assert np.std(vols) > 0  # it actually fluctuates


def test_barostat_molecular_scaling_keeps_geometry():
    """COM scaling must not stretch molecules."""
    mol = Molecule()
    N = 6
    mol.numAtoms = N
    mol.atomtype = np.array(["X"] * N, dtype=object)
    mol.charge = np.zeros(N)
    mol.masses = np.full(N, 10.0)
    pos = np.array([
        [1.0, 1.0, 1.0], [2.0, 1.0, 1.0],   # molecule 0
        [5.0, 5.0, 5.0], [6.0, 5.0, 5.0],   # molecule 1
        [8.0, 2.0, 3.0], [8.0, 3.0, 3.0],   # molecule 2
    ])
    mol.coords = pos[:, :, None]
    group_id = np.array([0, 0, 1, 1, 2, 2])

    baro = MonteCarloBarostat(1.0, 300.0, group_id=group_id, seed=0)
    scaled = baro._scale_positions(pos[None], np.array([[[1.25]]]))[0]
    for g in range(3):
        members = np.where(group_id == g)[0]
        d_old = np.linalg.norm(pos[members[0]] - pos[members[1]])
        d_new = np.linalg.norm(scaled[members[0]] - scaled[members[1]])
        assert abs(d_new - d_old) < 1e-12
        com_old = pos[members].mean(axis=0)
        com_new = scaled[members].mean(axis=0)
        np.testing.assert_allclose(com_new, com_old * 1.25, atol=1e-12)


def test_npt_argon_reasonable_density():
    """Interacting argon at 120 K, 50 bar: volume moves and stays finite,
    acceptance adapts."""
    import os

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.array([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=1))

    integ = Integrator(system, forces, 5.0, gamma=2.0, T=120.0, seed=2)
    baro = MonteCarloBarostat(50.0, 120.0, seed=3)
    v0 = float(np.prod(np.diag(system.box[0])))
    vols = []
    for _ in range(30):
        integ.step(niter=10)
        baro.attempt(system, forces)
        vols.append(float(np.prod(np.diag(system.box[0]))))
    assert np.isfinite(vols).all()
    assert min(vols) > 0.05 * v0
    # 50 bar at 120 K compresses the dilute initial gas
    assert vols[-1] < v0

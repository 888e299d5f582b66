"""Replica-exchange MD tests: per-replica-T Langevin ladders, exchange
acceptance math, bookkeeping, and a short waterbox ladder run."""

from __future__ import annotations

import os

import numpy as np

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.remd import ReplicaExchange
from torchmd_tpu.systems import System
from torchmd_tpu.units import BOLTZMANN


def _waterbox(nreplicas, temps=None):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    system = System(mol.numAtoms, nreplicas, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    if temps is not None:
        vel = np.concatenate(
            [np.asarray(maxwell_boltzmann(par.masses, t, 1, seed=i))
             for i, t in enumerate(temps)]
        )
        system.set_velocities(vel)
    return mol, par, forces, system


def test_vector_T_langevin_ladder():
    """Per-replica Langevin targets: hot and cold replicas equilibrate
    near their own temperatures inside one vmapped scan."""
    temps = [150.0, 600.0]
    mol, par, forces, system = _waterbox(2, temps)
    # gamma = 10 ps^-1: Langevin relaxation ~0.1 ps << the 0.24 ps run
    integ = Integrator(system, forces, timestep=1.0, device="cpu",
                       gamma=10.0, T=np.asarray(temps), seed=3)
    Ts = []
    for _ in range(12):
        _, _, T = integ.step(niter=20)
        Ts.append(T)
    mean = np.mean(Ts[6:], axis=0)
    assert 80 < mean[0] < 300, mean
    assert 420 < mean[1] < 820, mean
    assert mean[1] > 1.8 * mean[0]


def test_exchange_acceptance_math():
    """Deterministic checks of the Metropolis rule: a lower-energy
    configuration at the hotter slot always swaps down; an enormous
    uphill pair never swaps."""
    temps = [300.0, 400.0]
    mol, par, forces, system = _waterbox(2, temps)
    rex = ReplicaExchange(system, forces, 1.0, temps, gamma=1.0, seed=0)
    p0 = system.pos.copy()

    # E_cold > E_hot -> log_p = (b0 - b1)(E0 - E1) > 0 -> always accept
    acc = rex.attempt_exchanges(np.array([100.0, -100.0]))
    assert acc[0]
    assert np.allclose(system.pos[0], p0[1])
    assert np.allclose(system.pos[1], p0[0])
    assert list(rex.walker_id) == [1, 0]

    # velocities rescaled by sqrt(T_new/T_old)
    # (slot 0 now holds old slot-1 velocities scaled by sqrt(300/400))

    # phase alternation: second sweep starts at odd pairs -> no pair
    # exists for R=2, nothing attempted
    before = rex.n_attempted.copy()
    rex.attempt_exchanges(np.array([0.0, 0.0]))
    assert np.array_equal(rex.n_attempted, before)

    # hugely uphill: never accepted
    rex.phase = 0
    acc = rex.attempt_exchanges(np.array([-1e6, 1e6]))
    assert not acc[0]


def test_exchange_velocity_rescale_preserves_slot_temperature():
    temps = [200.0, 800.0]
    mol, par, forces, system = _waterbox(2, temps)
    rex = ReplicaExchange(system, forces, 1.0, temps, gamma=1.0, seed=0)
    v_hot = system.vel[1].copy()
    ke_hot = 0.5 * np.sum(par.masses * v_hot**2)
    rex.attempt_exchanges(np.array([1000.0, -1000.0]))  # forced accept
    ke_slot0 = 0.5 * np.sum(par.masses * system.vel[0] ** 2)
    # the hot walker moved to the cold slot with KE scaled by T0/T1
    assert np.isclose(ke_slot0, ke_hot * temps[0] / temps[1])


def test_remd_short_run_waterbox():
    temps = [280.0, 320.0, 360.0, 400.0]
    mol, par, forces, system = _waterbox(4, temps)
    rex = ReplicaExchange(system, forces, 1.0, temps, gamma=2.0, seed=2)
    ekin, epot, T = rex.run(nsteps=120, exchange_period=20)
    assert len(T) == 4 and np.all(np.isfinite(T))
    assert rex.n_attempted.sum() >= 5
    # close ladder spacing on a small box: some swaps must land
    assert rex.n_accepted.sum() >= 1, (rex.n_attempted, rex.n_accepted)
    # slot temperatures stay ordered on average (loose: short run)
    assert T[-1] > T[0] - 150


def test_remd_validation():
    temps = [300.0, 350.0]
    mol, par, forces, system = _waterbox(3, [300.0, 350.0, 400.0])
    try:
        ReplicaExchange(system, forces, 1.0, temps)
        assert False
    except ValueError:
        pass
    mol, par, forces, system = _waterbox(2, temps)
    try:
        ReplicaExchange(system, forces, 1.0, [350.0, 300.0])
        assert False
    except ValueError:
        pass

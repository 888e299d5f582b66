"""Integrator unit tests: kinetic energy, Maxwell-Boltzmann, velocity-Verlet
against closed-form trajectories with constant mock forces, and Langevin
thermostat statistics. Mirrors the reference's mock-forces strategy
(tests/test_integrator.py)."""

from __future__ import annotations

import numpy as np
import pytest

from torchmd_tpu.integrator import (
    Integrator,
    kinetic_energy,
    kinetic_to_temp,
    maxwell_boltzmann,
)
from torchmd_tpu.systems import System
from torchmd_tpu.units import BOLTZMANN, TIMEFACTOR


class ConstantForces:
    """Duck-typed force provider writing a constant force field."""

    def __init__(self, value):
        self.value = np.asarray(value, dtype=np.float64)

    def compute(self, pos, box, forces, **kw):
        forces[:] = np.broadcast_to(self.value, forces.shape)
        return [0.0] * forces.shape[0]


def test_kinetic_energy_single_replica():
    masses = np.array([[1.0], [2.0], [3.0]])
    vel = np.array([[[1.0, 2, 3], [0.5, 1, 1.5], [2, 1, 0.5]]])
    expected = sum(
        0.5 * masses[i, 0] * np.sum(vel[0, i] ** 2) for i in range(3)
    )
    result = np.asarray(kinetic_energy(masses, vel))
    assert result.shape == (1, 1)
    np.testing.assert_allclose(result, [[expected]], rtol=1e-6)


def test_kinetic_energy_batched():
    masses = np.array([[1.0], [2.0], [1.5]])
    vel = np.random.RandomState(0).randn(2, 3, 3)
    batch = np.array([0, 0, 1])
    result = np.asarray(kinetic_energy(masses, vel, batch))
    assert result.shape == (2, 2)
    for r in range(2):
        for b in range(2):
            expected = sum(
                0.5 * masses[i, 0] * np.sum(vel[r, i] ** 2)
                for i in range(3)
                if batch[i] == b
            )
            np.testing.assert_allclose(result[r, b], expected, rtol=1e-6)


def test_kinetic_energy_empty_batch():
    masses = np.array([[1.0], [2.0]])
    vel = np.ones((1, 2, 3))
    batch = np.array([0, 2])
    result = np.asarray(kinetic_energy(masses, vel, batch))
    assert result.shape == (1, 3)
    assert result[0, 1] == 0.0


def test_maxwell_boltzmann_statistics():
    n = 20000
    masses = np.full((n, 1), 12.0)
    T = 300.0
    vel = np.asarray(maxwell_boltzmann(masses, T, replicas=1, seed=42))
    assert vel.shape == (1, n, 3)
    ekin = float(np.asarray(kinetic_energy(masses, vel))[0, 0])
    temp = kinetic_to_temp(ekin, n)
    assert abs(temp - T) / T < 0.02  # ~1/sqrt(3N) fluctuations
    # per-component variance kB*T/m
    np.testing.assert_allclose(
        vel.var(), BOLTZMANN * T / 12.0, rtol=0.05
    )


def _constant_force_system(nreplicas=1):
    natoms = 2
    system = System(natoms, nreplicas, "double", "cpu")
    system.set_positions(np.array([[0.0, 0, 0], [1.0, 0, 0]]))
    system.set_masses(np.array([2.0, 4.0]))
    return system


@pytest.mark.parametrize("nreplicas", [1, 2])
def test_velocity_verlet_constant_force(nreplicas):
    """With constant force F, VV reproduces exact uniform acceleration:
    x(t) = x0 + v0 t + a t^2 / 2, v(t) = v0 + a t."""
    system = _constant_force_system(nreplicas)
    F = np.array([1.0, -0.5, 0.25])
    forces = ConstantForces(F)
    system.set_forces(np.broadcast_to(F, system.forces.shape))

    timestep_fs = 2.0
    integrator = Integrator(system, forces, timestep_fs, "cpu")
    nsteps = 25
    integrator.step(niter=nsteps)

    dt = timestep_fs / TIMEFACTOR
    t = nsteps * dt
    masses = np.array([2.0, 4.0])
    for r in range(nreplicas):
        for i, x0 in enumerate([0.0, 1.0]):
            a = F / masses[i]
            np.testing.assert_allclose(
                system.pos[r, i],
                np.array([x0, 0, 0]) + 0.5 * a * t * t,
                rtol=1e-9, atol=1e-12,
            )
            np.testing.assert_allclose(
                system.vel[r, i], a * t, rtol=1e-9, atol=1e-12
            )


def test_step_returns_ekin_pot_T():
    system = _constant_force_system(2)
    forces = ConstantForces([0.0, 0.0, 0.0])
    integrator = Integrator(system, forces, 1.0, "cpu")
    system.vel[:] = 1.0
    Ekin, pot, T = integrator.step(niter=1)
    assert Ekin.shape == (2,)
    # E = 0.5*(2+4)*3 per replica
    np.testing.assert_allclose(Ekin, [9.0, 9.0], rtol=1e-6)
    np.testing.assert_allclose(
        T, kinetic_to_temp(np.array([9.0, 9.0]), 2), rtol=1e-6
    )


def test_langevin_thermostats_to_target_temperature():
    """A free particle gas under the Langevin thermostat must equilibrate to
    the target temperature."""
    natoms = 500
    system = System(natoms, 1, "double", "cpu")
    rs = np.random.RandomState(0)
    system.set_positions(rs.randn(natoms, 3) * 10)
    system.set_masses(np.full(natoms, 12.0))
    forces = ConstantForces([0.0, 0.0, 0.0])

    T_target = 350.0
    integrator = Integrator(
        system, forces, 2.0, "cpu", gamma=2.0, T=T_target, seed=3
    )
    temps = []
    for _ in range(60):
        Ekin, _, T = integrator.step(niter=20)
        temps.append(T[0])
    avg = np.mean(temps[20:])
    assert abs(avg - T_target) / T_target < 0.1, avg

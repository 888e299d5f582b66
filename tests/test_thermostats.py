"""NHC and CSVR thermostat tests (capabilities beyond the reference,
which is Langevin-only: torchmd/integrator.py:72-77):

- temperature control on a real system (waterbox),
- NHC conserved (extended) energy drift bound,
- CSVR -> NVE limit as tau -> inf,
- thermostat math units (chain masses, target kinetic energy).
"""

from __future__ import annotations

import os

import numpy as np

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, kinetic_energy, maxwell_boltzmann
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System


def _waterbox(nreplicas=1):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    system = System(mol.numAtoms, nreplicas, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(
        maxwell_boltzmann(par.masses, 300.0, nreplicas, seed=0)
    )
    return mol, par, forces, system


def test_nhc_controls_temperature():
    mol, par, forces, system = _waterbox()
    integ = Integrator(system, forces, timestep=1.0, device="cpu",
                       T=300.0, thermostat="nhc", tau=50.0, seed=3)
    temps = []
    for _ in range(12):
        _, _, T = integ.step(niter=10)
        temps.append(T[0])
    # deterministic thermostat: time-average near the 300 K target
    assert 240 < np.mean(temps[4:]) < 360, temps


def test_nhc_extended_energy_conserved():
    """Ekin + Epot + E_chain is the NHC conserved quantity; its drift must
    be far smaller than the energy the chain pumps in/out."""
    mol, par, forces, system = _waterbox()
    # start cold so the thermostat must do real work
    system.set_velocities(maxwell_boltzmann(par.masses, 150.0, 1, seed=1))
    integ = Integrator(system, forces, timestep=0.5, device="cpu",
                       T=300.0, thermostat="nhc", tau=25.0, seed=3)

    def extended():
        ekin, epot, _ = integ.step(niter=10)
        return float(ekin[0]) + float(epot[0]) + float(
            integ.thermostat_energy()[0]
        ), float(ekin[0])

    e0, k0 = extended()
    es, ks = [], []
    for _ in range(10):
        e, k = extended()
        es.append(e)
        ks.append(k)
    # the chain moved much more kinetic energy than the conserved drift
    pumped = abs(ks[-1] - k0)
    drift = abs(es[-1] - e0)
    assert pumped > 10.0, (pumped, "thermostat did no work?")
    assert drift < 0.1 * pumped, (drift, pumped)


def test_csvr_controls_temperature():
    mol, par, forces, system = _waterbox()
    integ = Integrator(system, forces, timestep=1.0, device="cpu",
                       T=300.0, thermostat="csvr", tau=20.0, seed=7)
    temps = []
    for _ in range(12):
        _, _, T = integ.step(niter=10)
        temps.append(T[0])
    assert 240 < np.mean(temps[4:]) < 360, temps


def test_csvr_heats_cold_start():
    """A 10 K start must relax toward 300 K (stochastic rescale pumps
    kinetic energy in at rate ~1/tau)."""
    mol, par, forces, system = _waterbox()
    system.set_velocities(maxwell_boltzmann(par.masses, 10.0, 1, seed=2))
    integ = Integrator(system, forces, timestep=1.0, device="cpu",
                       T=300.0, thermostat="csvr", tau=10.0, seed=11)
    _, _, t0 = integ.step(niter=2)
    for _ in range(8):
        _, _, T = integ.step(niter=10)
    assert T[0] > 3 * t0[0], (t0, T)


def test_csvr_nve_limit():
    """tau -> inf: CSVR rescale factor -> 1, dynamics -> NVE."""
    mol, par, forces, system = _waterbox()
    integ = Integrator(system, forces, timestep=0.5, device="cpu",
                       T=300.0, thermostat="csvr", tau=1e12, seed=4)
    ekin, epot, _ = integ.step(niter=5)
    e0 = float(ekin[0] + epot[0])
    for _ in range(4):
        ekin, epot, _ = integ.step(niter=20)
    e1 = float(ekin[0] + epot[0])
    assert abs(e1 - e0) / system.natoms < 2e-3, (e0, e1)


def test_nhc_replicas_vmap():
    """NHC aux state is carried per replica through the vmapped scan."""
    mol, par, forces, system = _waterbox(nreplicas=3)
    v0 = maxwell_boltzmann(par.masses, 300.0, 1, seed=9)
    system.set_velocities(np.tile(np.asarray(v0), (3, 1, 1)))
    integ = Integrator(system, forces, timestep=1.0, device="cpu",
                       T=300.0, thermostat="nhc", tau=50.0, seed=5)
    ekin, epot, T = integ.step(niter=20)
    assert len(T) == 3
    assert np.all(np.isfinite(T))
    assert integ.thermostat_energy().shape == (3,)
    # replicas started identical -> identical deterministic trajectories
    assert np.allclose(T[0], T[1])


def test_thermostat_factory_and_units():
    from torchmd_tpu.thermostats import NoseHooverChain, make_thermostat
    from torchmd_tpu.units import BOLTZMANN, TIMEFACTOR

    nhc = make_thermostat("nhc", 300.0, 100.0, ndof=300)
    assert isinstance(nhc, NoseHooverChain)
    tau = 100.0 / TIMEFACTOR
    assert np.isclose(nhc.Q[0], 300 * BOLTZMANN * 300.0 * tau**2)
    assert np.isclose(nhc.Q[1], BOLTZMANN * 300.0 * tau**2)
    assert make_thermostat("langevin", 300.0, 100.0, 300) is None
    try:
        make_thermostat("bogus", 300.0, 100.0, 300)
        assert False
    except ValueError:
        pass


def test_nhc_on_cell_list_path():
    """NHC aux state rides the cell-list scan carry: an argon box on
    kernel='cell' equilibrates to the target and matches the dense-path
    trajectory (the thermostat is deterministic)."""
    import os

    from conftest import SYSTEMS_DIR

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.io import Molecule

    def run(kernel):
        mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
        ff = ForceField.create(
            mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
        )
        par = Parameters(ff, mol, ["lj"], precision="double")
        forces = Forces(par, terms=["lj"], precision="double",
                        cutoff=9.0, kernel=kernel)
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 120.0, 1, seed=3)
        )
        integ = Integrator(system, forces, timestep=5.0, device="cpu",
                           T=120.0, thermostat="nhc", tau=100.0)
        temps = []
        for _ in range(6):
            _, _, T = integ.step(niter=20)
            temps.append(T[0])
        return np.asarray(temps), system.pos.copy()

    t_cell, pos_cell = run("cell")
    t_dense, pos_dense = run("dense")
    assert 60 < np.mean(t_cell[2:]) < 200, t_cell
    np.testing.assert_allclose(t_cell, t_dense, rtol=1e-6)
    # 120 chaotic steps amplify the cell/dense float-op-order difference;
    # ~1e-3 A agreement over 600 fs confirms identical physics
    np.testing.assert_allclose(pos_cell, pos_dense, atol=5e-3)

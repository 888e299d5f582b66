"""SHAKE/RATTLE constraint tests: constraint satisfaction, velocity
projection, and timestep stability gains."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.constraints import (
    build_constraints,
    max_constraint_error,
    rattle_velocities,
    shake_positions,
)
from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System


def _waterbox():
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    return mol, par, forces


def test_build_constraints_modes():
    mol, par, forces = _waterbox()
    cs_h = build_constraints(par, par.masses, mode="hbonds")
    cs_all = build_constraints(par, par.masses, mode="allbonds")
    # water: every bond involves H, and the model has an H-H spacer bond
    assert cs_h.pairs.shape[0] == cs_all.pairs.shape[0]
    assert cs_h.pairs.shape[0] == len(np.unique(
        np.sort(np.asarray(mol.bonds), axis=1), axis=0))


def test_shake_restores_bond_lengths():
    mol, par, forces = _waterbox()
    cs = build_constraints(par, par.masses, mode="allbonds", iterations=100)
    pos0 = jnp.asarray(mol.coords[:, :, 0])
    # start on the manifold: set distances to r0 via a pre-shake
    pos_ref = shake_positions(cs, pos0, pos0)
    rs = np.random.RandomState(0)
    pos_bad = pos_ref + 0.05 * rs.randn(*pos_ref.shape)
    pos_fixed = shake_positions(cs, jnp.asarray(pos_bad), pos_ref)
    err = float(max_constraint_error(cs, pos_fixed))
    assert err < 1e-4, err


def test_rattle_removes_relative_velocity():
    mol, par, forces = _waterbox()
    cs = build_constraints(par, par.masses, mode="allbonds", iterations=100)
    pos = shake_positions(cs, jnp.asarray(mol.coords[:, :, 0]),
                          jnp.asarray(mol.coords[:, :, 0]))
    rs = np.random.RandomState(1)
    vel = jnp.asarray(rs.randn(*pos.shape) * 0.05)
    vel2 = rattle_velocities(cs, pos, vel)
    i, j = np.asarray(cs.pairs[:, 0]), np.asarray(cs.pairs[:, 1])
    d = np.asarray(pos)[i] - np.asarray(pos)[j]
    rv = np.abs(np.sum((np.asarray(vel2)[i] - np.asarray(vel2)[j]) * d, axis=1))
    assert rv.max() < 1e-6


def test_constrained_water_stable_at_4fs():
    """Rigid water (allbonds incl. the H-H spacer) must integrate stably at
    4 fs, beyond the ~3 fs velocity-Verlet stability limit of the
    unconstrained O-H stretch (period ~9.8 fs)."""
    mol, par, forces = _waterbox()

    def run_nve(constraints):
        """NVE at 4 fs: total-energy drift separates stable from unstable."""
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_velocities(maxwell_boltzmann(par.masses, 300, 1, seed=2))
        integ = Integrator(system, forces, timestep=4.0, seed=3,
                           constraints=constraints)
        etots = []
        for _ in range(8):
            Ekin, Epot, T = integ.step(niter=50)
            etots.append(float(Epot[0] + Ekin[0]))
        drift = abs(etots[-1] - etots[0])
        return drift, etots[-1], system.pos.copy()

    drift_c, etot_c, pos_c = run_nve("allbonds")
    assert np.isfinite(etot_c) and drift_c < 5.0, (drift_c, etot_c)

    drift_u, etot_u, _ = run_nve(None)
    assert (not np.isfinite(etot_u)) or drift_u > 50.0, (drift_u, etot_u)

    # constraints hold along the trajectory
    cs = build_constraints(par, par.masses, mode="allbonds")
    err = float(max_constraint_error(cs, jnp.asarray(pos_c[0])))
    assert err < 1e-3, err

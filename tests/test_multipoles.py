"""Permanent point dipoles: analytic anchors + frame rotation + AD
torque transfer (forces vs finite differences)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.potentials import ELEC_FACTOR, FFParams
from torchmd_tpu.multipoles import lab_dipoles, make_multipoles


def _ffp(charges, mask=None):
    n = len(charges)
    if mask is None:
        mask = ~np.eye(n, dtype=bool)
    return FFParams(
        charges=jnp.asarray(np.asarray(charges, np.float64)),
        masses=jnp.full((n, 1), 10.0),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.asarray([[1.0, 0.0]]),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None, nb_mask=jnp.asarray(mask),
    )


def test_dipole_dipole_analytic():
    """Two lab-frame dipoles: head-to-tail -2 EF mu^2/r^3, side-by-side
    + EF mu^2/r^3."""
    m, r = 0.4, 6.0
    ffp = _ffp([0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, m], "frame": "none"},
        {"atom": 1, "mu": [0, 0, m], "frame": "none"},
    ])
    # separation along the dipole axis (z)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), -2.0 * ELEC_FACTOR * m * m / r**3,
        rtol=1e-12,
    )
    # separation perpendicular to the dipoles
    pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), ELEC_FACTOR * m * m / r**3, rtol=1e-12,
    )


def test_charge_dipole_analytic():
    """Dipole pointing at a positive charge: E = + q EF mu / r^2."""
    m, r, q = 0.3, 8.0, 1.0
    ffp = _ffp([0.0, q])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, m], "frame": "none"},
    ])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), q * ELEC_FACTOR * m / r**2, rtol=1e-12,
    )
    # flipped dipole: attractive
    mp2 = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, -m], "frame": "none"},
    ])
    np.testing.assert_allclose(
        float(mp2.energy_fn(pos)), -q * ELEC_FACTOR * m / r**2, rtol=1e-12,
    )


def test_z_then_x_frame_tracks_geometry():
    """mu_local = (0, 0, m) in a z-then-x frame points from the site
    toward its z neighbor, wherever that neighbor moves."""
    ffp = _ffp([0.0, 0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.5], "frame": "z-then-x", "z": 1,
         "x": 2},
    ])
    for direction in ([1.0, 0, 0], [0, 1.0, 0], [0.6, -0.64, 0.48]):
        d = np.asarray(direction) / np.linalg.norm(direction)
        pos = jnp.asarray([
            [0.0, 0.0, 0.0], (d * 1.4).tolist(), [0.0, -2.0, 1.0],
        ])
        mu = np.asarray(lab_dipoles(mp.spec, pos, None))[0]
        np.testing.assert_allclose(mu, 0.5 * d, atol=1e-12)


def test_bisector_frame():
    """Water-like site: the bisector dipole points between the two
    neighbors."""
    ffp = _ffp([0.0, 0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.7], "frame": "bisector", "z": 1,
         "x": 2},
    ])
    pos = jnp.asarray([
        [0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0],
    ])
    mu = np.asarray(lab_dipoles(mp.spec, pos, None))[0]
    np.testing.assert_allclose(mu, [0.0, 0.7, 0.0], atol=1e-12)


def test_forces_match_finite_difference_with_frames():
    """AD transfers dipole torques to the frame atoms exactly: gradient
    vs central differences, frames included."""
    rs = np.random.RandomState(2)
    ffp = _ffp(rs.randn(5) * 0.2)
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0.1, -0.05, 0.3], "frame": "z-then-x",
         "z": 1, "x": 2},
        {"atom": 3, "mu": [0.0, 0.0, 0.25], "frame": "bisector",
         "z": 2, "x": 4},
    ])
    pos = jnp.asarray(rs.rand(5, 3) * 4.0 + np.arange(5)[:, None] * 2.0)

    g = np.asarray(jax.grad(mp.energy_fn)(pos))
    h = 1e-6
    for _ in range(8):
        i, k = rs.randint(5), rs.randint(3)
        dp = np.zeros((5, 3))
        dp[i, k] = h
        fd = (
            float(mp.energy_fn(pos + dp)) - float(mp.energy_fn(pos - dp))
        ) / (2 * h)
        np.testing.assert_allclose(g[i, k], fd, rtol=5e-6, atol=1e-9)


def test_exclusions_and_cutoff_respected():
    mask = ~np.eye(3, dtype=bool)
    mask[0, 1] = mask[1, 0] = False  # excluded pair
    ffp = _ffp([0.0, 1.0, 1.0], mask=mask)
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.3], "frame": "none"},
    ], cutoff=5.0)
    pos = jnp.asarray([
        [0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 0.0, 20.0],
    ])
    # atom 1 excluded, atom 2 beyond cutoff -> zero energy
    np.testing.assert_allclose(float(mp.energy_fn(pos)), 0.0, atol=1e-14)


def test_rides_integrator_scan():
    """Multipoles as the external potential inside a compiled scan."""
    import os

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    mp = make_multipoles(forces.ffparams, [
        {"atom": 0, "mu": [0, 0, 0.4], "frame": "z-then-x", "z": 1},
        {"atom": 5, "mu": [0, 0, 0.4], "frame": "z-then-x", "z": 6},
    ], cutoff=9.0)
    forces.external = mp
    forces._build_evaluators()
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=1))
    integ = Integrator(system, forces, timestep=2.0, T=120.0, gamma=2.0)
    ek, ep, T = integ.step(niter=30)
    assert np.isfinite(ep[0]) and np.isfinite(T[0])

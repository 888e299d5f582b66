"""Lambda-dynamics / constant-pH: theta-space coupling dynamics.

Small LJ systems (f64/CPU); the physics checks are endpoint consistency
(masked base + coupling at lam=1 == the untouched force field), bias-
driven titration direction, and bounded extended-system energy.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from conftest import SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System
from torchmd_tpu.integrator import maxwell_boltzmann
from torchmd_tpu.lambda_dynamics import (
    LambdaDynamics,
    make_lambda_sites,
    ph_bias,
    protonation_fraction,
)


def _argon(terms=("lj",)):
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, list(terms), precision="double")
    forces = Forces(par, terms=list(terms), precision="double", cutoff=9.0)
    return mol, par, forces


def test_multisite_endpoint_consistency():
    """Base(masked) + sum of couplings at lam=1 must reproduce the
    original untouched force field exactly (no double counting, no lost
    pairs) for two disjoint sites."""
    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([77.395] * 3)
    pot0, f0 = forces.ef_one(pos, box)
    e0 = sum(float(v) for v in pot0.values())

    couplings = make_lambda_sites(forces, [[0, 1], [5]])
    pot1, f1 = forces.ef_one(pos, box)
    e_masked = sum(float(v) for v in pot1.values())
    e_coup = sum(
        float(c.energy_lambda(pos, box, 1.0)) for c in couplings
    )
    np.testing.assert_allclose(e_masked + e_coup, e0, rtol=1e-10)
    # forces too
    import jax

    g = sum(
        np.asarray(jax.grad(lambda p: c.energy_lambda(p, box, 1.0))(pos))
        for c in couplings
    )
    np.testing.assert_allclose(
        np.asarray(f1) - g, np.asarray(f0), atol=1e-10
    )


def test_bias_drives_titration():
    """A strongly favorable bias toward decoupling drags lambda to 0; a
    favorable coupling bias drags it to 1."""
    def run(slope):
        mol, par, forces = _argon()
        couplings = make_lambda_sites(forces, [[0]])
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 120.0, 1, seed=4)
        )
        ld = LambdaDynamics(
            system, forces, couplings,
            biases=[lambda lam: slope * lam],
            timestep=2.0, T=120.0, gamma=5.0, lam0=0.5, seed=4,
        )
        _, _, _, lams = ld.step(niter=400)
        return lams

    lam_up = run(-20.0)    # bias favors lam = 1
    lam_dn = run(+20.0)    # bias favors lam = 0
    assert lam_up[-50:].mean() > 0.8, lam_up[-5:]
    assert lam_dn[-50:].mean() < 0.2, lam_dn[-5:]
    assert protonation_fraction(lam_up[-50:])[0] > 0.6
    # lambdas always in [0, 1] by construction
    assert np.all(lam_up >= 0) and np.all(lam_up <= 1)


def test_ph_bias_sign():
    """pH above the model pKa favors the deprotonated (decoupled) state:
    the bias at lam=1 must be higher than at lam=0, and reversed below
    the pKa."""
    b_hi = ph_bias(pKa_model=4.8, pH=7.4, T=300.0)
    b_lo = ph_bias(pKa_model=4.8, pH=2.0, T=300.0)
    assert b_hi(1.0) > b_hi(0.0)
    assert b_lo(1.0) < b_lo(0.0)
    # barrier raises the midpoint only
    b_bar = ph_bias(pKa_model=4.8, pH=4.8, T=300.0, barrier=2.0)
    assert abs(b_bar(0.0)) < 1e-12 and abs(b_bar(1.0)) < 1e-12
    assert b_bar(0.5) > 1.9


def test_extended_energy_bounded_nve():
    """gamma=0 (no thermostat): the extended system (atoms + thetas)
    integrates a conservative Hamiltonian; energy drift over a short run
    stays small."""
    mol, par, forces = _argon()
    couplings = make_lambda_sites(forces, [[0]])
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 60.0, 1, seed=7))
    ld = LambdaDynamics(system, forces, couplings, biases=None,
                        timestep=2.0, T=0.0, gamma=0.0, lam0=0.3, seed=7)
    ek0, ep0, _, _ = ld.step(niter=1)
    h0 = ek0[0] + ep0[0] + ld.theta_kinetic_energy()
    ek, ep, _, _ = ld.step(niter=300)
    h1 = ek[0] + ep[0] + ld.theta_kinetic_energy()
    assert abs(h1 - h0) < 0.05, (h0, h1)


def test_site_validation():
    mol, par, forces = _argon()
    import pytest

    with pytest.raises(ValueError, match="disjoint"):
        make_lambda_sites(forces, [[0, 1], [1, 2]])


def test_external_potential_included():
    """A jittable external potential attached to Forces must act inside
    LambdaDynamics (regression: the scan used to silently drop it)."""
    import jax.numpy as jnp

    mol, par, forces = _argon()

    class Pull:
        def energy_fn(self, pos, box):
            return 10.0 * pos[0, 0]  # constant force -10 on atom 0 x

    forces.external = Pull()
    couplings = make_lambda_sites(forces, [[1]])
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(np.zeros((1, mol.numAtoms, 3)))
    ld = LambdaDynamics(system, forces, couplings, timestep=2.0,
                        T=0.0, gamma=0.0, lam0=1.0, seed=1)
    e, f, fth = ld._ef_fn(
        jnp.asarray(system.pos[0]), jnp.asarray([77.395] * 3), ld.theta
    )
    # the external gradient shows up in both energy and forces
    base_forces = Forces(par, terms=["lj", "electrostatics"],
                         precision="double", cutoff=9.0)
    np.testing.assert_allclose(float(f[0, 0]),
                               float(base_forces.ef_one(
                                   jnp.asarray(system.pos[0]),
                                   jnp.asarray([77.395] * 3))[1][0, 0])
                               - 10.0, atol=1e-9)


def test_theta_forces_match_finite_difference():
    """The theta force (-dE/dtheta through sin^2 and the soft-core
    coupling) against central finite differences."""
    import jax

    mol, par, forces = _argon()
    couplings = make_lambda_sites(forces, [[0], [3]])
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    ld = LambdaDynamics(system, forces, couplings,
                        biases=[lambda lam: 3.0 * lam, None],
                        timestep=2.0, T=120.0, gamma=1.0,
                        lam0=[0.3, 0.7], seed=1)
    pos = jnp.asarray(system.pos[0])
    box = jnp.asarray([77.395] * 3)

    def e(th):
        ee, _, _ = ld._ef_fn(pos, box, th)
        return ee

    _, _, fth = ld._ef_fn(pos, box, ld.theta)
    h = 1e-6
    for s in range(2):
        dt_ = jnp.zeros(2).at[s].set(h)
        fd = -(float(e(ld.theta + dt_)) - float(e(ld.theta - dt_))) / (2 * h)
        np.testing.assert_allclose(float(fth[s]), fd, rtol=1e-6, atol=1e-10)

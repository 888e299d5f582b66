"""Native NNP: train against an LJ ground truth, then drive MD with it."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.nnp import (
    NNPConfig,
    NNPExternal,
    init_params,
    nnp_energy,
    train_nnp,
)


def _lj(dist, sigma=3.4, eps=0.24):
    s6 = (sigma / dist) ** 6
    return 4 * eps * (s6 * s6 - s6)


@pytest.fixture(scope="module")
def trained_dimer():
    """Fit the NNP to the argon-dimer LJ curve (energies + forces)."""
    cfg = NNPConfig(n_species=1, cutoff=8.0, n_rbf=24, features=24, hidden=48)
    params = init_params(cfg, jax.random.PRNGKey(0))
    species = jnp.zeros(2, jnp.int32)

    dists = np.linspace(3.2, 7.5, 48)
    pos = np.zeros((len(dists), 2, 3))
    pos[:, 1, 0] = dists
    e_ref = _lj(dists)
    # force on atom 1 along +x = -dE/dr
    dEdr = jax.vmap(jax.grad(lambda r: _lj(r)))(jnp.asarray(dists))
    f_ref = np.zeros_like(pos)
    f_ref[:, 1, 0] = -np.asarray(dEdr)
    f_ref[:, 0, 0] = np.asarray(dEdr)

    params, hist = train_nnp(
        params, cfg, species, jnp.asarray(pos), jnp.asarray(e_ref),
        jnp.asarray(f_ref), steps=800, learning_rate=3e-3,
    )
    return cfg, params, species, hist


def test_nnp_training_converges(trained_dimer):
    cfg, params, species, hist = trained_dimer
    assert hist[-1] < hist[0] * 1e-2, (hist[0], hist[-1])

    # potential reproduces the LJ well region
    for r in (3.6, 3.8, 4.5, 6.0):
        pos = jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
        e = float(nnp_energy(params, cfg, species, pos))
        assert abs(e - float(_lj(r))) < 0.05, (r, e, float(_lj(r)))


def test_nnp_drives_md(trained_dimer):
    """Trained NNP as the sole potential: the dimer oscillates around the
    LJ minimum (~3.82 A) inside the jitted scan."""
    cfg, params, species, _ = trained_dimer

    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator
    from torchmd_tpu.systems import System
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forcefields.forcefield import NullForcefield
    from torchmd_tpu.io import Molecule

    mol = Molecule()
    mol.numAtoms = 2
    mol.atomtype = np.array(["Ar", "Ar"], dtype=object)
    mol.charge = np.zeros(2)
    mol.masses = np.array([39.95, 39.95])
    mol.coords = np.asarray([[0.0, 0, 0], [4.4, 0, 0]])[:, :, None]

    ext = NNPExternal(params, cfg, species)
    par = Parameters(NullForcefield(mol), mol, [], precision="double")
    forces = Forces(par, terms=[], external=ext, precision="double")

    system = System(2, 1, "double", "cpu")
    system.set_positions(mol.coords)
    integ = Integrator(system, forces, timestep=5.0, device="cpu")
    assert not integ._host_path  # NNP folds into the scan

    seps = []
    for _ in range(40):
        integ.step(niter=10)
        seps.append(float(np.linalg.norm(system.pos[0, 1] - system.pos[0, 0])))
    seps = np.asarray(seps)
    # bound oscillation around the minimum, no dissociation (cutoff 8 A)
    assert seps.min() > 3.0 and seps.max() < 6.5, (seps.min(), seps.max())
    assert seps.std() > 0.01  # it actually moves


def test_nnp_external_protocol(trained_dimer):
    cfg, params, species, _ = trained_dimer
    ext = NNPExternal(params, cfg, species)
    pos = np.asarray([[[0.0, 0, 0], [4.0, 0, 0]]])
    e, f = ext.calculate(pos, None)
    assert e.shape == (1,)
    assert f.shape == (1, 2, 3)
    # forces antisymmetric along the bond axis
    np.testing.assert_allclose(f[0, 0], -f[0, 1], atol=1e-6)

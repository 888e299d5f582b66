"""Multi-device tests on a virtual 8-device CPU mesh: spatially-sharded
energy equivalence, replica sharding, and sharded force-field training."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.parallel import make_mesh, sharded_energy_fn
from torchmd_tpu.potentials import total_energy


@pytest.fixture(scope="module")
def alanine():
    mol, ff, nbconf = load_system(
        os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")
    )
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    return mol, forces


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8


def test_sharded_energy_matches_dense(alanine):
    mol, forces = alanine
    mesh = make_mesh(8)  # dp x sp
    efn = sharded_energy_fn(forces.ffparams, forces.config, mesh)

    B = mesh.shape["dp"] * 2
    rs = np.random.RandomState(0)
    base = mol.coords[:, :, 0]
    pos = jnp.asarray(
        base[None] + 0.02 * rs.randn(B, *base.shape), dtype=jnp.float64
    )
    box = jnp.tile(jnp.asarray(mol.box[:, 0])[None], (B, 1))

    e_sharded = np.asarray(jax.jit(efn)(pos, box))
    e_dense = np.asarray(
        jax.vmap(lambda p, b: total_energy(forces.ffparams, p, b, forces.config))(
            pos, box
        )
    )
    np.testing.assert_allclose(e_sharded, e_dense, rtol=1e-12, atol=1e-9)


def test_sharded_forces_match_dense(alanine):
    mol, forces = alanine
    mesh = make_mesh(8)
    efn = sharded_energy_fn(forces.ffparams, forces.config, mesh)

    B = mesh.shape["dp"]
    base = mol.coords[:, :, 0]
    pos = jnp.tile(jnp.asarray(base)[None], (B, 1, 1))
    box = jnp.tile(jnp.asarray(mol.box[:, 0])[None], (B, 1))

    f_sharded = -jax.grad(lambda p: jnp.sum(efn(p, box)))(pos)
    f_dense = -jax.grad(
        lambda p: jnp.sum(
            jax.vmap(
                lambda pp, b: total_energy(forces.ffparams, pp, b, forces.config)
            )(p, box)
        )
    )(pos)
    np.testing.assert_allclose(
        np.asarray(f_sharded), np.asarray(f_dense), atol=1e-9
    )


def test_replica_sharded_integration(alanine):
    """An 8-replica Langevin run with the replica axis sharded over the mesh
    must produce the same trajectory as unsharded execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, forces = alanine
    mesh = make_mesh(8, axes=("dp",))

    def run(shard: bool):
        system = System(mol.numAtoms, 8, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(mol.box)
        system.set_velocities(
            maxwell_boltzmann(forces.par.masses, 300, 8, seed=11)
        )
        integ = Integrator(
            system, forces, 1.0, gamma=0.1, T=300, seed=4
        )
        if shard:
            sh = NamedSharding(mesh, P("dp"))
            state = integ._state_from_system()
            state = state._replace(
                pos=jax.device_put(state.pos, sh),
                vel=jax.device_put(state.vel, sh),
                forces=jax.device_put(state.forces, sh),
            )
            box = jax.device_put(
                jnp.asarray(system.box_diag, dtype=integ.dtype), sh
            )
            state, epot = integ._scan_fn(state, box, 5)
            return np.asarray(state.pos)
        integ.step(niter=5)
        return system.pos.copy()

    np.testing.assert_allclose(run(False), run(True), atol=1e-10)


def test_force_matching_training_recovers_lj():
    """Perturb LJ epsilon/sigma of an argon gas, train on forces from the
    true parameters, and verify the loss collapses and parameters move
    toward truth."""
    import optax
    import yaml

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.train import ForceMatchingTrainer

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    ffp_true = forces.ffparams

    # batch of perturbed configurations + reference forces from truth
    rs = np.random.RandomState(2)
    B = 8
    base = mol.coords[:, :, 0]
    pos = jnp.asarray(base[None] + 0.1 * rs.randn(B, *base.shape))
    box = jnp.tile(jnp.asarray([77.395, 77.395, 77.395])[None], (B, 1))
    f_ref = -jax.vmap(
        jax.grad(lambda p, b: total_energy(ffp_true, p, b, forces.config)),
        in_axes=(0, 0),
    )(pos, box)

    ffp_wrong = ffp_true._replace(
        lj_params=ffp_true.lj_params * jnp.asarray([[1.15, 1.5]])
    )
    trainer = ForceMatchingTrainer(
        ffp_wrong, forces.config, trainable=("lj",), optimizer=optax.adam(3e-2)
    )
    state = trainer.init()
    losses = []
    for i in range(200):
        state, loss = trainer.step(state, pos, box, f_ref)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 1e-3, (losses[0], losses[-1])
    # (sigma, epsilon) is nearly degenerate in the attractive tail sampled
    # here; the physically constrained combination B = 4*eps*sigma^6 must be
    # recovered even when the individual parameters drift along the valley.
    learned = np.asarray(state.params["lj"])[0]
    true = np.asarray(ffp_true.lj_params)[0]
    B_learned = 4 * learned[1] * learned[0] ** 6
    B_true = 4 * true[1] * true[0] ** 6
    np.testing.assert_allclose(B_learned, B_true, rtol=0.05)


def test_sharded_force_matching_step():
    """One sharded training step (dp x sp mesh) must match the unsharded
    loss/grads."""
    import optax

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.train import ForceMatchingTrainer

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    ffp = forces.ffparams._replace(
        lj_params=forces.ffparams.lj_params * jnp.asarray([[1.1, 1.3]])
    )

    rs = np.random.RandomState(3)
    B = 4
    base = mol.coords[:, :, 0]
    pos = jnp.asarray(base[None] + 0.05 * rs.randn(B, *base.shape))
    box = jnp.tile(jnp.asarray([77.395, 77.395, 77.395])[None], (B, 1))
    f_ref = jnp.zeros_like(pos)

    mesh = make_mesh(8, shape=(4, 2))
    t_sh = ForceMatchingTrainer(
        ffp, forces.config, trainable=("lj",),
        optimizer=optax.sgd(1e-3), mesh=mesh,
    )
    t_ns = ForceMatchingTrainer(
        ffp, forces.config, trainable=("lj",), optimizer=optax.sgd(1e-3)
    )
    s_sh, loss_sh = t_sh.step(t_sh.init(), pos, box, f_ref)
    s_ns, loss_ns = t_ns.step(t_ns.init(), pos, box, f_ref)
    np.testing.assert_allclose(float(loss_sh), float(loss_ns), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(s_sh.params["lj"]), np.asarray(s_ns.params["lj"]), rtol=1e-9
    )


def test_integrator_mesh_option(alanine):
    """Integrator(mesh=...) shards the replica axis without changing the
    trajectory."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, forces = alanine

    def run(mesh):
        system = System(mol.numAtoms, 8, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(mol.box)
        system.set_velocities(
            maxwell_boltzmann(forces.par.masses, 300, 8, seed=11)
        )
        integ = Integrator(system, forces, 1.0, gamma=0.1, T=300, seed=4,
                           mesh=mesh)
        integ.step(niter=5)
        return system.pos.copy()

    mesh = make_mesh(8, axes=("dp",))
    np.testing.assert_allclose(run(None), run(mesh), atol=1e-10)

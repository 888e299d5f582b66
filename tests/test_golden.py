"""Golden-scalar anchors from the upstream test suite.

These two values were produced by the original TorchMD + parmed +
moleculekit + OpenMM-validated chain (tests/test_torchmd.py:517,605), so
hitting them pins our independent reader/assembly/potential chain against
the original stack end to end:
  - alanine dipeptide, all terms, cutoff 9 A, switch 7.5 A, RFA:
      Epot = -1722.3569 kcal/mol per replica
  - alanine dipeptide, no cutoff, batch of 10 via vmap:
      Epot = -1768.8915 kcal/mol per batch element
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from common import ALL_TERMS
from conftest import DATA_DIR

TESTDIR = os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")


def _alanine():
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters

    mol = Molecule(os.path.join(TESTDIR, "structure.prmtop"))
    mol.read(os.path.join(TESTDIR, "input.coor"))
    ff = ForceField.create(mol, os.path.join(TESTDIR, "structure.prmtop"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    # The golden values were produced by the reference, whose parameter
    # tensors pass through torch's float32 default dtype before the cast
    # to double (torchmd/parameters.py:162-292). Replicate that
    # quantization; our own assembly is exact f64.
    for t in (
        par.bond_params, par.angle_params, par.dihedral_params,
        par.improper_params, par.nonbonded_14_params, par.nonbonded_params,
    ):
        if t is not None and len(t["params"]):
            t["params"] = np.asarray(t["params"], np.float32).astype(np.float64)
    return mol, par


def test_golden_alanine_replicas():
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System

    mol, par = _alanine()
    n_replicas = 2
    system = System(mol.numAtoms, n_replicas, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)

    forces = Forces(
        par, terms=ALL_TERMS, cutoff=9, switch_dist=7.5, rfa=True,
        precision="double",
    )
    Epot = forces.compute(system.pos, system.box, system.forces)
    assert len(Epot) == 2
    assert abs(Epot[0] + 1722.3569) < 1e-4
    assert abs(Epot[1] + 1722.3569) < 1e-4


def test_golden_alanine_vmap_batch():
    """Batched-conformation evaluation through jax.vmap (the reference needs
    a special energy-only path for torch.vmap and cannot use cutoffs there;
    static shapes make both work here)."""
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.potentials import total_energy

    mol, par = _alanine()
    forces = Forces(
        par, terms=ALL_TERMS, cutoff=None, switch_dist=7.5, rfa=False,
        precision="double",
    )
    batch_size = 10
    pos1 = jnp.asarray(mol.coords[:, :, 0], dtype=jnp.float64)
    positions = jnp.tile(pos1[None], (batch_size, 1, 1))
    box = jnp.zeros((batch_size, 3))

    efn = jax.jit(
        jax.vmap(
            lambda p, b: total_energy(forces.ffparams, p, b, forces.config),
            in_axes=(0, 0),
        )
    )
    Epot = efn(positions, box)
    grads = jax.vmap(
        jax.grad(lambda p, b: total_energy(forces.ffparams, p, b, forces.config)),
        in_axes=(0, 0),
    )(positions, box)

    assert Epot.shape == (batch_size,)
    assert grads.shape == positions.shape
    assert abs(float(Epot[0]) + 1768.8915) < 1e-4
    assert abs(float(Epot[1]) + 1768.8915) < 1e-4

    # cutoff under vmap (impossible in the reference: dynamic shapes)
    forces_cut = Forces(
        par, terms=ALL_TERMS, cutoff=9, switch_dist=7.5, rfa=True,
        precision="double",
    )
    E2 = jax.jit(
        jax.vmap(
            lambda p, b: total_energy(forces_cut.ffparams, p, b, forces_cut.config),
            in_axes=(0, 0),
        )
    )(positions, jnp.tile(jnp.asarray(mol.box[:, 0])[None], (batch_size, 1)))
    assert abs(float(E2[0]) + 1722.3569) < 1e-4

"""Equivalence of the fused analytic energy+force path with pure AD."""

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
from torchmd_tpu.potentials import (
    compute_potentials,
    energy_and_forces_fused,
    total_energy,
)


@pytest.mark.parametrize(
    "name", ["prod_alanine_dipeptide_amber", "waterbox", "2watersperiodic",
             "benzamidine"]
)
def test_fused_matches_ad(name):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, name))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    ffp, cfg = forces.ffparams, forces.config

    pos = jnp.asarray(mol.coords[:, :, 0], dtype=jnp.float64)
    box = jnp.asarray(mol.box[:, 0], dtype=jnp.float64)

    pot_ad = compute_potentials(ffp, pos, box, cfg)
    f_ad = -jax.grad(lambda p: total_energy(ffp, p, box, cfg))(pos)

    pot_fused, f_fused = jax.jit(
        lambda p, b: energy_and_forces_fused(ffp, p, b, cfg)
    )(pos, box)

    for k, v in pot_ad.items():
        np.testing.assert_allclose(
            float(pot_fused[k]), float(v), rtol=1e-10, atol=1e-9, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(f_fused), np.asarray(f_ad), rtol=1e-8, atol=1e-8
    )


@pytest.mark.parametrize(
    "name", ["prod_alanine_dipeptide_amber", "benzamidine", "2watersperiodic"]
)
def test_forces_ef_one_matches_ad(name):
    """The Forces hot path (analytic bonded + analytic nonbonded with the
    sorted-scatter plan) must equal pure AD."""
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, name))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    ffp, cfg = forces.ffparams, forces.config

    pos = jnp.asarray(mol.coords[:, :, 0], dtype=jnp.float64)
    box = jnp.asarray(mol.box[:, 0], dtype=jnp.float64)

    pot_ad = compute_potentials(ffp, pos, box, cfg)
    f_ad = -jax.grad(lambda p: total_energy(ffp, p, box, cfg))(pos)
    pot_f, f_f = jax.jit(forces.ef_one)(pos, box)

    for k, v in pot_ad.items():
        np.testing.assert_allclose(
            float(pot_f[k]), float(v), rtol=1e-10, atol=1e-9, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(f_f), np.asarray(f_ad), rtol=1e-7, atol=1e-8
    )

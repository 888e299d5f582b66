"""Pallas nonbonded kernel correctness (interpreter mode on CPU).

The same kernel runs compiled on TPU; interpreter mode checks the math
against the dense jnp path at f32 accuracy.
"""

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
from torchmd_tpu.potentials import nonbonded_energy_forces
from torchmd_tpu.ops import (
    pallas_nonbonded_energy_forces,
    pallas_supported_terms,
    prepare_nb_data,
)


@pytest.mark.parametrize("name,pbc", [
    ("prod_alanine_dipeptide_amber", True),
    ("waterbox", False),
])
def test_pallas_kernel_matches_dense(name, pbc):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, name))
    if name == "prod_alanine_dipeptide_amber":
        nbconf = dict(cutoff=9.0, switch_dist=7.5, rfa=True)
    par = Parameters(ff, mol, ALL_TERMS, precision="single")
    forces = Forces(par, terms=ALL_TERMS, precision="single", **nbconf)
    ffp, cfg = forces.ffparams, forces.config
    assert pallas_supported_terms(cfg)

    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray(mol.box[:, 0] if pbc else np.zeros(3), jnp.float32)

    pot_d, f_d = nonbonded_energy_forces(ffp, pos, box, cfg)
    data = prepare_nb_data(ffp)
    pot_p, f_p = pallas_nonbonded_energy_forces(
        data, cfg, pos, box, interpret=True
    )

    for k in pot_d:
        ref = float(pot_d[k])
        np.testing.assert_allclose(
            float(pot_p[k]), ref, rtol=2e-5, atol=2e-3, err_msg=k
        )
    scale = float(jnp.abs(f_d).max())
    assert float(jnp.abs(f_p - f_d).max()) < 5e-5 * max(scale, 1.0)


def test_pallas_kernel_ewald_real_space():
    """erfc approximation branch vs the exact dense Ewald real-space path."""
    mol, ff, _ = load_system(os.path.join(DATA_DIR, "2watersperiodic"))
    par = Parameters(ff, mol, ALL_TERMS, precision="single")
    forces = Forces(par, terms=ALL_TERMS, precision="single", cutoff=8.0)
    cfg = forces.config._replace(ewald_alpha=0.4112)
    ffp = forces.ffparams

    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray(mol.box[:, 0], jnp.float32)

    from torchmd_tpu.potentials import nonbonded_energy_forces

    pot_d, f_d = nonbonded_energy_forces(ffp, pos, box, cfg)
    data = prepare_nb_data(ffp)
    pot_p, f_p = pallas_nonbonded_energy_forces(
        data, cfg, pos, box, interpret=True
    )
    np.testing.assert_allclose(
        float(pot_p["electrostatics"]), float(pot_d["electrostatics"]),
        rtol=1e-4, atol=1e-3,
    )
    scale = float(jnp.abs(f_d).max())
    assert float(jnp.abs(f_p - f_d).max()) < 1e-4 * max(scale, 1.0)

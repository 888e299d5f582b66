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


def test_pallas_kernel_multi_tile_lane_partials():
    """>=3x3 tile grid: stresses the revisited (TILE_I, 128) row-partial
    blocks across the j sweep and several dynamic column slices of the
    Newton accumulator (tile geometry the 688-atom systems never reach)."""
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.ops.pallas_nonbonded import TILE_I

    n = 2 * TILE_I + TILE_I // 2  # 2.5 tiles -> ni = 3
    rs = np.random.RandomState(7)
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="single")
    forces = Forces(par, terms=ALL_TERMS, precision="single", **nbconf)
    ffp, cfg = forces.ffparams, forces.config

    # synthetic n-atom system reusing waterbox types cyclically
    nt = ffp.charges.shape[0]
    idx = jnp.asarray(rs.randint(0, nt, n))
    ffp_big = ffp._replace(
        charges=ffp.charges[idx],
        lj_params=ffp.lj_params,
        mapped_atom_types=ffp.mapped_atom_types[idx],
        nb_mask=jnp.ones((n, n)).at[jnp.arange(n), jnp.arange(n)].set(0.0),
    )
    pos = jnp.asarray(rs.rand(n, 3) * 40.0, jnp.float32)
    box = jnp.asarray([40.0, 40.0, 40.0], jnp.float32)

    pot_d, f_d = nonbonded_energy_forces(ffp_big, pos, box, cfg)
    data = prepare_nb_data(ffp_big)
    pot_p, f_p = pallas_nonbonded_energy_forces(
        data, cfg, pos, box, interpret=True
    )
    for k in pot_d:
        np.testing.assert_allclose(
            float(pot_p[k]), float(pot_d[k]), rtol=2e-5, atol=2e-2,
            err_msg=k,
        )
    scale = float(jnp.abs(f_d).max())
    assert float(jnp.abs(f_p - f_d).max()) < 5e-5 * max(scale, 1.0)


def test_pallas_kernel_nbfix_tables(monkeypatch):
    """NBFIX pair-specific A/B tables ride the Pallas kernel via the
    one-hot MXU gather (exact in f32): parity with the dense jnp path
    on tables that really differ from Lorentz-Berthelot."""
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="single")
    forces = Forces(par, terms=ALL_TERMS, precision="single", **nbconf)
    ffp, cfg = forces.ffparams, forces.config

    sig = np.asarray(ffp.lj_params[:, 0], np.float64)
    eps = np.abs(np.asarray(ffp.lj_params[:, 1], np.float64))
    sig_ij = 0.5 * (sig[:, None] + sig[None, :])
    eps_ij = np.sqrt(eps[:, None] * eps[None, :])
    s6 = sig_ij ** 6
    B = 4.0 * eps_ij * s6
    A = B * s6
    # perturb one off-diagonal pair so the tables really matter
    A[0, 1] = A[1, 0] = A[0, 1] * 1.35 + 10.0
    B[0, 1] = B[1, 0] = B[0, 1] * 0.8 + 1.0
    ffp2 = ffp._replace(
        lj_ab=(jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32))
    )

    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray(mol.box[:, 0], jnp.float32)
    pot_d, f_d = nonbonded_energy_forces(ffp2, pos, box, cfg)
    scale = float(jnp.abs(f_d).max())

    for tri in ("1", "0"):
        monkeypatch.setenv("TMD_PALLAS_TRI", tri)
        data = prepare_nb_data(ffp2)
        assert data.arow is not None and data.onehot is not None
        pot_p, f_p = pallas_nonbonded_energy_forces(
            data, cfg, pos, box, interpret=True
        )
        for k in pot_d:
            np.testing.assert_allclose(
                float(pot_p[k]), float(pot_d[k]), rtol=2e-5, atol=2e-3,
                err_msg=f"{k} tri={tri}",
            )
        assert float(jnp.abs(f_p - f_d).max()) < 5e-5 * max(scale, 1.0)

    # sanity: the perturbed tables changed the answer vs plain LB
    pot_lb, _ = nonbonded_energy_forces(ffp, pos, box, cfg)
    assert abs(float(pot_lb["lj"]) - float(pot_d["lj"])) > 1e-3

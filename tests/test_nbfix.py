"""NBFIX pair-specific LJ overrides (capability beyond the reference)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters


def test_nbfix_parsed_from_prm():
    mol, ff, _ = load_system(os.path.join(DATA_DIR, "2ions"))
    fixes = ff.get_nbfix()
    assert ("SOD", "CLA") in fixes
    eps, rmin = fixes[("SOD", "CLA")]
    assert eps == pytest.approx(0.083875)
    assert rmin == pytest.approx(3.731)


def test_nbfix_changes_sod_cla_energy():
    """2ions = one Na+ + one Cl-: with NBFIX on, the LJ energy equals the
    analytic NBFIX pair formula eps*((Rmin/r)^12 - 2 (Rmin/r)^6)."""
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "2ions"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")

    pos = mol.coords[:, :, 0][None]
    r = float(np.linalg.norm(pos[0, 0] - pos[0, 1]))

    f_plain = Forces(par, terms=["lj"], precision="double")
    e_plain = f_plain.compute(pos, None)[0]

    f_fix = Forces(par, terms=["lj"], precision="double", nbfix=True)
    e_fix = f_fix.compute(pos, None)[0]

    eps, rmin = 0.083875, 3.731
    expected = eps * ((rmin / r) ** 12 - 2 * (rmin / r) ** 6)
    assert e_fix == pytest.approx(expected, rel=1e-9)
    assert abs(e_fix - e_plain) > 1e-6  # the fix actually changes something


def test_nbfix_default_off_keeps_parity():
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "2ions"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    f1 = Forces(par, terms=["lj"], precision="double")
    f2 = Forces(par, terms=["lj"], precision="double", nbfix=False)
    pos = mol.coords[:, :, 0][None]
    assert f1.compute(pos, None)[0] == f2.compute(pos, None)[0]
    assert f1.ffparams.lj_ab is None


def test_nbfix_consistent_across_paths():
    """Dense AD vs fused-analytic forces with NBFIX tables agree."""
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.potentials import (
        energy_and_forces_fused,
        compute_potentials,
        total_energy,
    )

    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "3ions"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", nbfix=True,
                    **nbconf)
    ffp, cfg = forces.ffparams, forces.config
    assert ffp.lj_ab is not None

    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray(mol.box[:, 0])
    pot_ad = compute_potentials(ffp, pos, box, cfg)
    f_ad = -jax.grad(lambda p: total_energy(ffp, p, box, cfg))(pos)
    pot_f, f_f = energy_and_forces_fused(ffp, pos, box, cfg)
    for k in pot_ad:
        np.testing.assert_allclose(float(pot_f[k]), float(pot_ad[k]),
                                   rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_ad), atol=1e-9)

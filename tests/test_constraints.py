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


# ----------------------------------------------------------------------
# SETTLE + HMR
# ----------------------------------------------------------------------

def test_settle_detects_waters_and_geometry():
    from torchmd_tpu.constraints import build_settle, find_waters

    mol, par, forces = _waterbox()
    triplets, r_oh, r_hh = find_waters(par, par.masses)
    nwat = mol.numAtoms // 3
    assert triplets.shape == (nwat, 3)
    ss = build_settle(par, par.masses)
    assert int(ss.oidx.shape[0]) == nwat
    # canonical triangle consistency: ra + rb = height of the triangle
    h = np.sqrt(np.asarray(ss.r_oh) ** 2 - np.asarray(ss.rc) ** 2)
    np.testing.assert_allclose(np.asarray(ss.ra + ss.rb), h, rtol=1e-12)


def test_settle_positions_machine_precision():
    """One SETTLE application lands the waters exactly on the constraint
    manifold (unlike iterative SHAKE)."""
    from torchmd_tpu.constraints import build_settle, settle_positions

    mol, par, forces = _waterbox()
    ss = build_settle(par, par.masses)
    pos0 = jnp.asarray(mol.coords[:, :, 0])
    ref = settle_positions(ss, pos0, pos0)  # pre-project starting coords
    rs = np.random.RandomState(0)
    bad = ref + 0.08 * rs.randn(*ref.shape)
    fixed = settle_positions(ss, jnp.asarray(bad), ref)
    p = np.asarray(fixed)
    o, h1, h2 = (np.asarray(ss.oidx), np.asarray(ss.h1), np.asarray(ss.h2))
    d_oh1 = np.linalg.norm(p[o] - p[h1], axis=1)
    d_oh2 = np.linalg.norm(p[o] - p[h2], axis=1)
    d_hh = np.linalg.norm(p[h1] - p[h2], axis=1)
    np.testing.assert_allclose(d_oh1, np.asarray(ss.r_oh), atol=1e-9)
    np.testing.assert_allclose(d_oh2, np.asarray(ss.r_oh), atol=1e-9)
    np.testing.assert_allclose(d_hh, np.asarray(ss.r_hh), atol=1e-9)
    # COM of each water is preserved (the projection is momentum-neutral)
    mO = np.asarray(ss.m_o)[:, 0]; mH = np.asarray(ss.m_h)[:, 0]
    M = (mO + 2 * mH)[:, None]
    com_bad = (np.asarray(bad)[o] * mO[:, None]
               + (np.asarray(bad)[h1] + np.asarray(bad)[h2]) * mH[:, None]) / M
    com_fix = (p[o] * mO[:, None] + (p[h1] + p[h2]) * mH[:, None]) / M
    np.testing.assert_allclose(com_fix, com_bad, atol=1e-9)


def test_settle_strided_fast_path_matches_generic():
    """The strided-layout SETTLE fast path (static slices + reshapes for
    repeating [O,H,H,...] solvent blocks — the TPU row-gather
    workaround) is bit-equivalent to the generic gather/scatter path,
    for positions AND velocities; and a permuted (non-strided) water
    set correctly falls back to the generic path."""
    import jax

    from torchmd_tpu.constraints import (
        _settle_strided_layout, build_settle, settle_positions,
        settle_velocities)

    mol, par, forces = _waterbox()
    ss = build_settle(par, par.masses)
    n = mol.numAtoms
    assert _settle_strided_layout(ss, n) == (0, 3, n // 3)
    pos0 = jnp.asarray(mol.coords[:, :, 0])
    rs = np.random.RandomState(7)
    bad = pos0 + jnp.asarray(rs.randn(n, 3) * 0.05)
    vel = jnp.asarray(rs.randn(n, 3) * 0.1)

    p_fast = settle_positions(ss, bad, pos0)
    v_fast = settle_velocities(ss, p_fast, vel)
    os.environ["TMD_SETTLE_STRIDED"] = "0"
    try:
        p_gen = settle_positions(ss, bad, pos0)
        v_gen = settle_velocities(ss, p_gen, vel)
    finally:
        del os.environ["TMD_SETTLE_STRIDED"]
    np.testing.assert_array_equal(np.asarray(p_fast), np.asarray(p_gen))
    np.testing.assert_array_equal(np.asarray(v_fast), np.asarray(v_gen))

    # permuted water order (last water first) breaks the stride: the
    # layout probe must decline and results must be a row permutation
    # of the strided system's
    perm_w = np.r_[n // 3 - 1, np.arange(n // 3 - 1)]
    ss_p = jax.tree_util.tree_map(
        lambda a: a[jnp.asarray(perm_w)] if a.shape[:1] == ss.oidx.shape
        else a, ss)
    assert _settle_strided_layout(ss_p, n) is None
    p_perm = settle_positions(ss_p, bad, pos0)
    np.testing.assert_allclose(np.asarray(p_perm), np.asarray(p_fast),
                               rtol=0, atol=1e-12)


def test_settle_velocities_exact():
    from torchmd_tpu.constraints import (
        build_settle, settle_positions, settle_velocities,
    )

    mol, par, forces = _waterbox()
    ss = build_settle(par, par.masses)
    pos = settle_positions(ss, jnp.asarray(mol.coords[:, :, 0]),
                           jnp.asarray(mol.coords[:, :, 0]))
    rs = np.random.RandomState(1)
    vel = jnp.asarray(rs.randn(*pos.shape) * 0.05)
    vel2 = np.asarray(settle_velocities(ss, pos, vel))
    p = np.asarray(pos)
    for a, b in ((ss.oidx, ss.h1), (ss.oidx, ss.h2), (ss.h1, ss.h2)):
        a, b = np.asarray(a), np.asarray(b)
        d = p[a] - p[b]
        rv = np.abs(np.sum((vel2[a] - vel2[b]) * d, axis=1))
        assert rv.max() < 1e-10, rv.max()


def test_settle_nve_stable_at_4fs():
    """NVE waterbox with SETTLE at 4 fs: bounded energy drift and exact
    constraint satisfaction along the trajectory (the VERDICT round-2
    'done' criterion, mirroring the SHAKE test above)."""
    from torchmd_tpu.constraints import build_settle

    mol, par, forces = _waterbox()
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, 300, 1, seed=2))
    integ = Integrator(system, forces, timestep=4.0, seed=3,
                       constraints="settle")
    assert integ.constraints.settle is not None
    etots = []
    for _ in range(8):
        Ekin, Epot, T = integ.step(niter=50)
        etots.append(float(Epot[0] + Ekin[0]))
    drift = abs(etots[-1] - etots[0])
    assert np.isfinite(etots[-1]) and drift < 5.0, (drift, etots)

    ss = build_settle(par, par.masses)
    p = jnp.asarray(system.pos[0])
    o, h1 = ss.oidx, ss.h1
    d = jnp.linalg.norm(p[o] - p[h1], axis=1)
    assert float(jnp.max(jnp.abs(d - ss.r_oh))) < 1e-8


def test_hmr_repartitioning():
    from torchmd_tpu.constraints import repartition_hydrogen_masses

    mol, par, forces = _waterbox()
    m0 = np.asarray(par.masses).reshape(-1)
    m1 = repartition_hydrogen_masses(m0, mol.bonds, factor=4.0)
    # total mass conserved; hydrogens 4x heavier; oxygens donate
    np.testing.assert_allclose(m1.sum(), m0.sum(), rtol=1e-12)
    light = m0 <= 3.5
    np.testing.assert_allclose(m1[light], 4.0 * m0[light])
    # heavies bonded to H donate mass; lone ions (Na+/Cl-) are untouched
    assert np.all(m1[~light] <= m0[~light])
    assert (m1[~light] < m0[~light]).sum() > 0
    with pytest.raises(ValueError):
        repartition_hydrogen_masses(m0, mol.bonds, factor=20.0)


def test_hmr_settle_4fs_waterbox():
    """HMR(4x) + SETTLE at 4 fs: the 'honest 4 fs solvated production'
    configuration stays stable under a thermostat."""
    from torchmd_tpu.constraints import repartition_hydrogen_masses

    mol, par, forces = _waterbox()
    m = repartition_hydrogen_masses(
        np.asarray(par.masses).reshape(-1), mol.bonds, factor=3.0
    )
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_masses(m)
    system.set_velocities(maxwell_boltzmann(m.reshape(-1, 1), 300, 1, seed=4))
    integ = Integrator(system, forces, timestep=4.0, gamma=1.0, T=300,
                       seed=5, constraints="settle")
    for _ in range(4):
        Ekin, Epot, T = integ.step(niter=25)
    assert np.isfinite(float(Epot[0]))
    assert 100.0 < float(T[0]) < 600.0

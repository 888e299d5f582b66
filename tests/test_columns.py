"""z-sorted column kernel (large-N path): equivalence with the dense
all-pairs path, windows/ghosts/exclusions, drift validity and the
integrator's rebuild/overflow machinery. Pallas runs in interpreter mode
on CPU; the same kernel runs compiled on TPU."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.potentials import nonbonded_energy_forces
from torchmd_tpu.columns import (
    ColumnKernel,
    column_grid_feasible,
    column_supported,
    make_column_config,
)


def _argon(terms=("lj", "electrostatics"), bonds=None):
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    rs = np.random.RandomState(0)
    mol.charge = rs.randn(mol.numAtoms) * 0.05
    if bonds is not None:
        mol.bonds = np.asarray(bonds)
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    terms = list(terms)
    par = Parameters(ff, mol, terms, precision="single")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=terms, precision="single", cutoff=9.0,
                    rfa=True)
    return mol, par, forces


def _lj_gas(natoms=1500, L=60.0, seed=0, charges=False):
    """Synthetic LJ gas molecule + YAML FF (the 24k bench system, small)."""
    rs = np.random.RandomState(seed)
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(["AR"] * natoms, dtype=object)
    mol.charge = (rs.randn(natoms) * 0.05 if charges
                  else np.zeros(natoms))
    mol.masses = np.full(natoms, 39.948)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    m = int(np.ceil(natoms ** (1 / 3)))
    grid = np.stack(
        np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:natoms]
    coords = (grid + 0.5) * (L / m) + rs.randn(natoms, 3) * 0.3
    mol.coords = coords[:, :, None]
    mol.box = np.full((3, 1), L)
    ffd = {"atomtypes": ["AR"],
           "lj": {"AR": {"sigma": 3.405, "epsilon": 0.238}},
           "electrostatics": {"AR": {"charge": 0.0}},
           "masses": {"AR": 39.948}}
    ff = YamlForcefield(mol, ffd)
    terms = ["lj", "electrostatics"] if charges else ["lj"]
    par = Parameters(ff, mol, terms, precision="single")
    if charges:
        par.charges = mol.charge.copy()
    forces = Forces(par, terms=terms, precision="single", cutoff=9.0,
                    rfa=charges)
    return mol, par, forces, L


def test_column_config_and_feasibility():
    assert column_grid_feasible([77.0] * 3, 9.0, 2.0)
    assert not column_grid_feasible([20.0, 77.0, 77.0], 9.0, 2.0)
    assert not column_grid_feasible([77.0, 77.0, 15.0], 9.0, 2.0)
    cfg = make_column_config([77.0] * 3, 9.0, natoms=1000)
    assert cfg.ncols == (7, 7)
    assert cfg.C % cfg.IBLK == 0 and cfg.W % 128 == 0 and cfg.CE >= cfg.W


def test_column_matches_dense_argon_with_exclusions():
    mol, par, forces = _argon(terms=("lj", "electrostatics", "bonds"),
                              bonds=[[0, 1], [5, 9]])
    box = np.asarray([77.395] * 3)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par, box,
                        pos0=np.asarray(pos), interpret=True)
    st = kern.build(pos)
    assert not kern.check_overflow(st)
    pot_c, f_c = kern.energy_forces(pos, boxj, st)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, boxj,
                                         forces.config)
    for k in pot_d:
        assert abs(float(pot_c[k]) - float(pot_d[k])) < 1e-5, k
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=1e-5)


def test_column_matches_dense_gas():
    """Denser synthetic gas: many blocks per column, real window use."""
    mol, par, forces, L = _lj_gas(natoms=1500, L=60.0, charges=True)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray([L] * 3, jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=np.asarray(pos),
                        interpret=True)
    st = kern.build(pos)
    assert not kern.check_overflow(st)
    pot_c, f_c = kern.energy_forces(pos, boxj, st)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, boxj,
                                         forces.config)
    scale = float(jnp.max(jnp.abs(f_d)))
    for k in pot_d:
        assert abs(float(pot_c[k]) - float(pot_d[k])) < 2e-4 * max(
            1.0, abs(float(pot_d[k]))
        ), k
    assert float(jnp.max(jnp.abs(f_c - f_d))) < 1e-4 * max(1.0, scale)


def test_column_phase_replicas_match_dense(monkeypatch):
    """Forced multi-phase j layout (P=2: 64-slot-granular window starts)
    reproduces the dense path -- the mechanism is opt-in on v5e
    (TMD_COL_PHASES; measured slower than P=1, docs/PERF.md) but must
    stay correct for hardware where it wins."""
    monkeypatch.setenv("TMD_COL_PHASES", "2")
    monkeypatch.setenv("TMD_COL_IBLK", "16")
    mol, par, forces, L = _lj_gas(natoms=1500, L=60.0, charges=True)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray([L] * 3, jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=np.asarray(pos),
                        interpret=True)
    assert kern.ccfg.P == 2
    st = kern.build(pos)
    assert not kern.check_overflow(st)
    pot_c, f_c = kern.energy_forces(pos, boxj, st)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, boxj,
                                         forces.config)
    scale = float(jnp.max(jnp.abs(f_d)))
    for k in pot_d:
        assert abs(float(pot_c[k]) - float(pot_d[k])) < 2e-4 * max(
            1.0, abs(float(pot_d[k]))
        ), k
    assert float(jnp.max(jnp.abs(f_c - f_d))) < 1e-4 * max(1.0, scale)


def test_column_ewald_real_space_matches_dense():
    """Ewald erfc damping through the column kernel == dense path (the
    column kernel is the TPU default for large periodic systems, so the
    elec='ewald' real-space term must agree like the cell kernel does,
    tests/test_neighbors.py:161)."""
    mol, par, forces, L = _lj_gas(natoms=1500, L=60.0, charges=True)
    cfg = forces.config._replace(ewald_alpha=0.37, rfa=False)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray([L] * 3, jnp.float32)
    kern = ColumnKernel(forces.ffparams, cfg, par, np.asarray([L] * 3),
                        pos0=np.asarray(pos), interpret=True)
    st = kern.build(pos)
    assert not kern.check_overflow(st)
    pot_c, f_c = kern.energy_forces(pos, boxj, st)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, boxj, cfg)
    scale = float(jnp.max(jnp.abs(f_d)))
    for k in pot_d:
        assert abs(float(pot_c[k]) - float(pot_d[k])) < 2e-4 * max(
            1.0, abs(float(pot_d[k]))
        ), k
    assert float(jnp.max(jnp.abs(f_c - f_d))) < 1e-4 * max(1.0, scale)


def test_column_drift_and_boundary_crossing():
    """Validity between rebuilds: atoms drifting (incl. across periodic
    faces) under the skin/2 criterion keep dense parity without a
    rebuild -- windows were computed with the cutoff+skin margin."""
    mol, par, forces, L = _lj_gas(natoms=800, L=50.0)
    rs = np.random.RandomState(3)
    pos0 = np.asarray(mol.coords[:, :, 0], np.float32)
    # park atoms near faces so the drift crosses them
    pos0[0] = [25.0, 25.0, 0.2]
    pos0[1] = [0.2, 25.0, 25.0]
    pos0[2] = [25.0, L - 0.2, 25.0]
    pos0 = jnp.asarray(pos0)
    boxj = jnp.asarray([L] * 3, jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=np.asarray(pos0),
                        interpret=True)
    st = kern.build(pos0)
    drift = jnp.asarray(rs.randn(800, 3) * 0.25, jnp.float32)
    drift = drift.at[0].set(jnp.asarray([0.0, 0.0, -0.5], jnp.float32))
    drift = drift.at[1].set(jnp.asarray([-0.5, 0.0, 0.0], jnp.float32))
    drift = drift.at[2].set(jnp.asarray([0.0, 0.5, 0.0], jnp.float32))
    pos1 = pos0 + drift
    assert not bool(kern.needs_rebuild(st, pos1))
    pot_c, f_c = kern.energy_forces(pos1, boxj, st)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos1, boxj,
                                         forces.config)
    scale = float(jnp.max(jnp.abs(f_d)))
    assert abs(float(pot_c["lj"]) - float(pot_d["lj"])) < 1e-4 * max(
        1.0, abs(float(pot_d["lj"]))
    )
    assert float(jnp.max(jnp.abs(f_c - f_d))) < 1e-4 * max(1.0, scale)
    # after a large drift the rebuild criterion must trip
    assert bool(kern.needs_rebuild(st, pos0 + 2.0))


def test_column_update_and_overflow_grow():
    mol, par, forces, L = _lj_gas(natoms=600, L=50.0)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=np.asarray(pos),
                        interpret=True)
    st = kern.build(pos)
    st2 = kern.update(pos + 0.01, st)    # no rebuild: same ref
    assert np.array_equal(np.asarray(st2.ref_pos), np.asarray(st.ref_pos))
    st3 = kern.update(pos + 3.0, st)     # rebuild: new ref
    assert np.allclose(np.asarray(st3.ref_pos), np.asarray(pos) + 3.0)
    # shrink capacities to force overflow, then grow back over it
    small = kern.grow()                  # grow() API sanity
    assert small.ccfg.C >= kern.ccfg.C
    kern.ccfg = kern.ccfg._replace(C=kern.ccfg.IBLK)  # 1 block/column
    st_of = kern.build(pos)
    assert kern.check_overflow(st_of)


def test_column_supported_gates():
    mol, par, forces = _argon()
    ffp = forces.ffparams
    assert column_supported(forces.config, ffp, np.asarray([77.4] * 3))
    # no box / tiny box -> unsupported
    assert not column_supported(forces.config, ffp, None)
    assert not column_supported(forces.config, ffp, np.asarray([20.0] * 3))
    # NBFIX tables -> unsupported
    ffp_ab = ffp._replace(lj_ab=(jnp.ones((1, 1)), jnp.ones((1, 1))))
    assert not column_supported(forces.config, ffp_ab,
                                np.asarray([77.4] * 3))


def test_column_integration_matches_cell_scan():
    """Short Langevin trajectories through the integrator scan: the
    column kernel (kernel='cell' auto-resolved on TPU; forced here via
    a direct swap) must track the XLA cell path step for step."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, forces, L = _lj_gas(natoms=600, L=50.0)
    vel = maxwell_boltzmann(par.masses, 120.0, 1, seed=2)

    def run(make_forces_kernel):
        forces_l = Forces(par, terms=["lj"], precision="single",
                          cutoff=9.0, kernel="cell")
        system = System(mol.numAtoms, 1, "single")
        system.set_positions(mol.coords)
        system.set_box(np.full(3, L))
        system.set_velocities(vel)
        make_forces_kernel(forces_l, system)
        integ = Integrator(system, forces_l, 5.0, gamma=0.1, T=120.0,
                           seed=7)
        epots = [integ.step(niter=5)[1] for _ in range(4)]
        return np.asarray(system.pos), np.asarray(epots)

    def cell(forces_l, system):
        forces_l.ensure_cell_kernel(np.full(3, L),
                                    pos0=mol.coords[:, :, 0],
                                    allow_column=False)

    def column(forces_l, system):
        forces_l._cell_kernel = ColumnKernel(
            forces_l.ffparams, forces_l.config, par, np.full(3, L),
            pos0=mol.coords[:, :, 0], interpret=True,
        )
        forces_l.cell_requested = True

    pos_a, e_a = run(cell)
    pos_b, e_b = run(column)
    np.testing.assert_allclose(e_b, e_a, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(pos_b, pos_a, atol=2e-3)


def test_column_vmap_replicas():
    mol, par, forces, L = _lj_gas(natoms=400, L=50.0)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    pos2 = jnp.stack([pos, pos + 0.05])
    boxj = jnp.tile(jnp.asarray([L] * 3, jnp.float32)[None], (2, 1))
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=np.asarray(pos),
                        interpret=True)
    st = jax.vmap(kern.build)(pos2, boxj)
    pot, frc = jax.vmap(kern.energy_forces)(pos2, boxj, st)
    for r in range(2):
        pot_d, f_d = nonbonded_energy_forces(
            forces.ffparams, pos2[r], boxj[r], forces.config
        )
        assert abs(float(pot["lj"][r]) - float(pot_d["lj"])) < 1e-4 * max(
            1.0, abs(float(pot_d["lj"]))
        )
        scale = float(jnp.max(jnp.abs(f_d)))
        assert float(jnp.max(jnp.abs(frc[r] - f_d))) < 1e-4 * max(1.0,
                                                                  scale)


def test_column_virial_matches_dense_scaling_grad():
    """The column kernel's in-kernel per-axis virial accumulator equals
    -dE/ds_a of the dense nonbonded energy under joint scaling (the MTK
    barostat contract), and the box-traced ghost/wrap shifts evaluate a
    SCALED box exactly without a rebuild (in-scan NPT box changes)."""
    from torchmd_tpu.potentials import nonbonded_energies

    mol, par, forces = _argon()
    L = 77.395
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    kern = ColumnKernel(forces.ffparams, forces.config, par,
                        np.asarray([L] * 3), pos0=pos, interpret=True)
    st = kern.build(pos, box)
    pot, f, vir = kern.energy_forces_virial(pos, box, st)
    pot0, f0 = kern.energy_forces(pos, box, st)
    for k in pot0:  # with_virial must not perturb energies/forces
        np.testing.assert_allclose(float(pot[k]), float(pot0[k]),
                                   rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-5)

    def e_scaled(s):
        p = nonbonded_energies(
            forces.ffparams, jnp.asarray(pos, jnp.float64) * s,
            jnp.asarray(box, jnp.float64) * s, forces.config)
        return sum(jax.tree_util.tree_leaves(p))

    vir_ref = -jax.grad(e_scaled)(jnp.ones(3, jnp.float64))
    scale = max(1.0, float(jnp.max(jnp.abs(vir_ref))))
    np.testing.assert_allclose(np.asarray(vir) / scale,
                               np.asarray(vir_ref) / scale, atol=2e-4)

    # box-traced shifts: evaluate at a 1% scaled geometry WITHOUT
    # rebuilding the column structure; must match the dense energy there
    s = 1.01
    pot_s, _ = kern.energy_forces(pos * s, box * s, st)
    pd = nonbonded_energies(
        forces.ffparams, jnp.asarray(pos, jnp.float64) * s,
        jnp.asarray(box, jnp.float64) * s, forces.config)
    for k in pot_s:
        np.testing.assert_allclose(float(pot_s[k]), float(pd[k]),
                                   rtol=5e-4)

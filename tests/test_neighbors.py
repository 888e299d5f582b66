"""Cell-list / neighbor path: equivalence with the dense all-pairs path and
full integration through the scan (rebuilds, overflow growth)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.potentials import nonbonded_energy_forces
from torchmd_tpu.neighbors import (
    CellKernel,
    build_cell_list,
    discretize_box,
    make_cell_config,
    needs_rebuild,
)


def _argon(charges=True, terms=("lj", "electrostatics")):
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    if charges:
        rs = np.random.RandomState(0)
        mol.charge = rs.randn(mol.numAtoms) * 0.05
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, list(terms), precision="double")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=list(terms), precision="double",
                    cutoff=9.0, rfa=True)
    return mol, par, forces


def test_cell_list_structure():
    mol, par, forces = _argon()
    cfg = make_cell_config([77.395] * 3, 9.0, skin=2.0, natoms=mol.numAtoms)
    pos = jnp.asarray(mol.coords[:, :, 0])
    cl = build_cell_list(pos, cfg)
    assert not bool(cl.overflow)
    # every atom appears in exactly one slot
    slots = np.asarray(cl.slots).ravel()
    real = slots[slots < mol.numAtoms]
    assert sorted(real.tolist()) == list(range(mol.numAtoms))
    assert int(np.asarray(cl.counts).sum()) == mol.numAtoms
    # no rebuild needed right after building; needed after skin/2 motion
    assert not bool(needs_rebuild(cl, pos, cfg))
    assert bool(needs_rebuild(cl, pos + 1.5, cfg))


def test_cell_energy_forces_match_dense():
    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([77.395] * 3)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box, forces.config)

    kern = CellKernel(forces.ffparams, forces.config, par, np.asarray(box))
    cl = kern.build(pos)
    pot_c, f_c = jax.jit(kern.energy_forces)(pos, box, cl)
    for k in pot_d:
        np.testing.assert_allclose(float(pot_c[k]), float(pot_d[k]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=1e-14)


def test_cell_exclusions_respected():
    """Bonded exclusions must drop pairs from the cell path exactly as the
    dense mask does (use a fake bond between two nearby argon atoms)."""
    mol, par, forces = _argon(terms=("lj", "electrostatics", "bonds"))
    # fabricate a bond between atoms 0 and 1
    mol.bonds = np.array([[0, 1]])
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj", "electrostatics", "bonds"],
                     precision="double")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics", "bonds"],
                    precision="double", cutoff=9.0, rfa=True)

    pos = np.asarray(mol.coords[:, :, 0]).copy()
    pos[1] = pos[0] + [3.0, 0, 0]  # within cutoff: exclusion matters
    pos = jnp.asarray(pos)
    box = jnp.asarray([77.395] * 3)

    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box, forces.config)
    kern = CellKernel(forces.ffparams, forces.config, par, np.asarray(box))
    pot_c, f_c = kern.energy_forces(pos, box, kern.build(pos))
    for k in pot_d:
        np.testing.assert_allclose(float(pot_c[k]), float(pot_d[k]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=1e-13)


def test_cell_integration_matches_dense_path():
    """Short NVE trajectories via the cell-list scan and the dense scan must
    agree (rebuilds included)."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    def run(kernel):
        mol, par, _ = _argon()
        forces = Forces(par, terms=["lj", "electrostatics"],
                        precision="double", cutoff=9.0, rfa=True,
                        kernel=kernel)
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=3)
        )
        integ = Integrator(system, forces, timestep=5.0, device="cpu")
        for _ in range(2):
            integ.step(niter=15)
        return system.pos.copy()

    # The ghost-cell evaluation is numerically equivalent but not
    # bit-identical to the dense min-image math (different float op
    # order), so a short chaotic trajectory can only match to ~1e-7.
    np.testing.assert_allclose(run("dense"), run("cell"), atol=1e-6)


def test_cell_overflow_grows_capacity():
    mol, par, forces = _argon()
    # absurdly small capacity forces an overflow + growth cycle
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    forces = Forces(par, terms=["lj", "electrostatics"], precision="double",
                    cutoff=9.0, rfa=True, kernel="cell")
    # co-locate two atoms in one cell so capacity=1 must overflow
    coords = mol.coords.copy()
    coords[1, :, 0] = coords[0, :, 0] + 0.5
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=3))
    integ = Integrator(system, forces, timestep=2.0, device="cpu")
    # shrink capacity after construction to force the overflow path
    integ._cell_kernel.clcfg = integ._cell_kernel.clcfg.with_capacity(1)
    integ._scan_fn = integ._build_scan_cell()
    integ.step(niter=2)
    assert integ._cell_kernel.clcfg.capacity > 1


def test_discretize_box_stub_parity():
    nc, pairs = discretize_box([30.0, 30.0, 30.0], 10.0)
    assert nc == (3, 3, 3)
    assert pairs.shape[1] == 2
    # with 3 cells/axis and periodic wrap, every cell neighbors every other
    assert len(pairs) == 27 * 28 // 2


def test_cell_ewald_real_space_matches_dense():
    """Ewald erfc damping through the cell-pair path == dense path."""
    mol, par, forces = _argon()
    cfg = forces.config._replace(ewald_alpha=0.37)
    ffp = forces.ffparams
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([77.395] * 3)

    pot_d, f_d = nonbonded_energy_forces(ffp, pos, box, cfg)
    kern = CellKernel(ffp, cfg, par, np.asarray(box))
    pot_c, f_c = kern.energy_forces(pos, box, kern.build(pos))
    for k in pot_d:
        np.testing.assert_allclose(float(pot_c[k]), float(pot_d[k]),
                                   rtol=1e-11, err_msg=k)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=1e-13)


def test_cell_compute_api_matches_dense():
    """Forces.compute() honors kernel='cell' (fresh build per call)."""
    mol, par, _ = _argon()
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [77.395] * 3)
    pos = mol.coords[:, :, 0][None]

    fd = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True)
    fc = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True, kernel="cell")
    ed = fd.compute(pos, box, returnDetails=True)[0]
    ec = fc.compute(pos, box, returnDetails=True)[0]
    for k, v in ed.items():
        np.testing.assert_allclose(ec[k], v, rtol=1e-12, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(fc.last_forces), np.asarray(fd.last_forces), atol=1e-12
    )


def test_cell_multireplica_dynamics():
    """Cell-list scan with 2 replicas matches two independent 1-replica
    runs (per-replica cell lists through vmap)."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, _ = _argon()

    def run(nrep, seed_vel):
        forces = Forces(par, terms=["lj", "electrostatics"],
                        precision="double", cutoff=9.0, rfa=True,
                        kernel="cell")
        system = System(mol.numAtoms, nrep, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        vel1 = np.asarray(maxwell_boltzmann(par.masses, 150.0, 1,
                                            seed=seed_vel))
        system.set_velocities(np.repeat(vel1, nrep, axis=0))
        integ = Integrator(system, forces, timestep=5.0, device="cpu")
        integ.step(niter=30)
        return system.pos.copy()

    single = run(1, 7)
    double = run(2, 7)
    np.testing.assert_allclose(double[0], single[0], atol=1e-10)
    np.testing.assert_allclose(double[1], single[0], atol=1e-10)


def test_cell_ewald_integration_matches_dense():
    """elec='ewald' + kernel='cell': the integrator scan must include the
    Ewald reciprocal/self/exclusion terms (regression: it used to integrate
    erfc real-space only), and step() Epot must equal forces.compute()."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    def run(kernel):
        mol, par, _ = _argon()
        forces = Forces(par, terms=["lj", "electrostatics"],
                        precision="double", cutoff=9.0, elec="ewald",
                        kernel=kernel)
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=5))
        integ = Integrator(system, forces, timestep=5.0, device="cpu")
        _, epot, _ = integ.step(niter=10)
        return system.pos.copy(), float(np.asarray(epot).reshape(-1)[0]), \
            forces, system

    pos_d, e_d, _, _ = run("dense")
    pos_c, e_c, forces_c, system_c = run("cell")
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-8)
    np.testing.assert_allclose(e_c, e_d, rtol=1e-10)
    # scan-reported Epot agrees with an independent compute() at the same pos
    e_api = forces_c.compute(system_c.pos, system_c.box, returnDetails=False)
    np.testing.assert_allclose(e_api[0], e_c, rtol=1e-9)


def test_cell_compute_overflow_grows():
    """Forces.compute() on the cell path must detect capacity overflow and
    grow instead of returning corrupted energies."""
    mol, par, _ = _argon()
    forces = Forces(par, terms=["lj", "electrostatics"], precision="double",
                    cutoff=9.0, rfa=True, kernel="cell")
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [77.395] * 3)
    coords = mol.coords.copy()
    coords[1, :, 0] = coords[0, :, 0] + 0.5  # two atoms share one cell
    pos = coords[:, :, 0][None]

    ref = Forces(par, terms=["lj", "electrostatics"], precision="double",
                 cutoff=9.0, rfa=True)
    expected = ref.compute(pos, box)

    forces.ensure_cell_kernel(np.asarray([77.395] * 3))
    forces._cell_kernel.clcfg = forces._cell_kernel.clcfg.with_capacity(1)
    forces._build_evaluators()
    got = forces.compute(pos, box)
    assert forces._cell_kernel.clcfg.capacity > 1
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_kernel_auto_selects_cell_for_large_periodic(monkeypatch):
    """kernel='auto' must route a large periodic system onto the cell path
    (the round-1 behavior silently ran O(N^2) dense)."""
    monkeypatch.setenv("TMD_AUTO_CELL_N", "50")  # force 'large' for argon
    mol, par, _ = _argon()
    forces = Forces(par, terms=["lj", "electrostatics"], precision="double",
                    cutoff=9.0, rfa=True)  # kernel='auto' default
    assert forces.cell_auto
    assert forces.wants_cell(np.asarray([77.395] * 3))
    assert not forces.wants_cell(None)           # no box -> dense
    assert not forces.wants_cell(np.zeros(3))    # zero box -> dense
    assert not forces.wants_cell(np.asarray([20.0] * 3))  # too small

    # compute() on a periodic box engages the cell kernel and matches dense
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [77.395] * 3)
    pos = mol.coords[:, :, 0][None]
    ref = Forces(par, terms=["lj", "electrostatics"], precision="double",
                 cutoff=9.0, rfa=True, kernel="dense")
    got = forces.compute(pos, box)
    assert forces._cell_kernel is not None
    np.testing.assert_allclose(got, ref.compute(pos, box), rtol=1e-10)

    # integrator routes onto the cell scan as well
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    forces2 = Forces(par, terms=["lj", "electrostatics"], precision="double",
                     cutoff=9.0, rfa=True)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=3))
    integ = Integrator(system, forces2, timestep=5.0, device="cpu")
    assert integ._use_cell
    integ.step(niter=5)


def test_pallas_cell_kernel_matches_xla(monkeypatch):
    """The Pallas ghost-column cell kernel (interpret mode, f32) must match
    the XLA ghost-cell path, exclusions included."""
    from torchmd_tpu.neighbors import cell_nonbonded_energy_forces
    from torchmd_tpu.ops.pallas_cell import pallas_cell_energy_forces

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    rs = np.random.RandomState(0)
    mol.charge = rs.randn(mol.numAtoms) * 0.05
    mol.bonds = np.array([[0, 1], [5, 9]])
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj", "electrostatics", "bonds"],
                     precision="single")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics", "bonds"],
                    precision="single", cutoff=9.0, rfa=True)
    box = np.asarray([77.395] * 3)
    kern = CellKernel(forces.ffparams, forces.config, par, box)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)
    cl = kern.build(pos)
    pot_x, f_x = cell_nonbonded_energy_forces(
        forces.ffparams, forces.config, kern.clcfg, cl, kern.excl_table,
        pos, boxj,
    )
    pot_p, f_p = pallas_cell_energy_forces(
        forces.ffparams, forces.config, kern.clcfg, cl, kern.excl_table,
        pos, boxj, interpret=True,
    )
    for k in pot_x:
        assert abs(float(pot_x[k]) - float(pot_p[k])) < 1e-6, k
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), atol=1e-6)


def test_cell_boundary_crossing_between_rebuilds():
    """An atom drifting across a periodic face between rebuilds (less than
    skin/2, so no rebuild triggers) must keep exact dense-path parity.

    Regression: a plain per-eval wrap teleported such atoms to the far
    side of the box, breaking the pre-shifted ghost-cell distance math
    (missed pairs, ~box-magnitude displacement errors). Evaluation now
    anchors positions to the build frame (neighbors.anchored_positions)."""
    mol, par, forces = _argon()
    box = jnp.asarray([77.395] * 3)
    pos0 = np.asarray(mol.coords[:, :, 0]).copy()
    # park three atoms just inside three different faces, with partners
    # within cutoff on the wrapped side
    pos0[0] = [20.0, 20.0, 0.4]
    pos0[1] = [20.0, 20.0, 77.395 - 4.0]   # 4.4 A from atom 0 via the face
    pos0[2] = [0.3, 50.0, 40.0]
    pos0[3] = [77.395 - 5.0, 50.0, 40.0]
    pos0 = jnp.asarray(pos0)

    kern = CellKernel(forces.ffparams, forces.config, par, np.asarray(box))
    cl = kern.build(pos0)

    # drift atoms 0 and 2 across their faces by < skin/2
    pos1 = pos0.at[0, 2].add(-0.8).at[2, 0].add(-0.6)
    assert not bool(kern.needs_rebuild(cl, pos1))

    pot_c, f_c = jax.jit(kern.energy_forces)(pos1, box, cl)
    pot_d, f_d = nonbonded_energy_forces(
        forces.ffparams, pos1, box, forces.config
    )
    for k in pot_d:
        np.testing.assert_allclose(float(pot_c[k]), float(pot_d[k]),
                                   rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=1e-10)


def test_pallas_cell_boundary_crossing_between_rebuilds():
    """Same regression through the Pallas ghost-column kernel (interpret
    mode, f32): build-frame anchoring must match the dense path for
    boundary-crossing drift."""
    from torchmd_tpu.ops.pallas_cell import pallas_cell_energy_forces

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="single")
    forces = Forces(par, terms=["lj"], precision="single", cutoff=9.0)
    box = np.asarray([77.395] * 3)
    pos0 = np.asarray(mol.coords[:, :, 0], np.float32).copy()
    pos0[0] = [20.0, 20.0, 0.4]
    pos0[1] = [20.0, 20.0, 77.395 - 4.0]
    pos0 = jnp.asarray(pos0)
    kern = CellKernel(forces.ffparams, forces.config, par, box)
    cl = kern.build(pos0)
    pos1 = pos0.at[0, 2].add(-0.8)
    assert not bool(kern.needs_rebuild(cl, pos1))
    boxj = jnp.asarray(box, jnp.float32)
    pot_p, f_p = pallas_cell_energy_forces(
        forces.ffparams, forces.config, kern.clcfg, cl, kern.excl_table,
        pos1, boxj, interpret=True,
    )
    pot_d, f_d = nonbonded_energy_forces(
        forces.ffparams, pos1, boxj, forces.config
    )
    for k in pot_d:
        assert abs(float(pot_p[k]) - float(pot_d[k])) < 1e-4, k
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_d), atol=1e-4)


# ----------------------------------------------------------------------
# Verlet (padded neighbor-list) path
# ----------------------------------------------------------------------

def test_verlet_matches_dense_pbc():
    from torchmd_tpu.neighbors import VerletKernel

    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([77.395] * 3)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    kern = VerletKernel(forces.ffparams, forces.config, box=np.asarray(box),
                        pos0=np.asarray(pos))
    nl = kern.build(pos)
    assert not bool(nl.overflow)
    pot_v, f_v = jax.jit(kern.energy_forces)(pos, box, nl)
    for k in pot_d:
        np.testing.assert_allclose(float(pot_v[k]), float(pot_d[k]),
                                   rtol=1e-12, err_msg=k)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(f_d), atol=1e-14)


def test_verlet_matches_dense_open_boundary():
    """No box at all (the headline thrombin configuration is unboxed):
    the cell grid cannot run, the verlet list must."""
    from torchmd_tpu.neighbors import VerletKernel

    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0])
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, None,
                                         forces.config)
    kern = VerletKernel(forces.ffparams, forces.config, box=None,
                        pos0=np.asarray(pos))
    nl = kern.build(pos)
    pot_v, f_v = kern.energy_forces(pos, None, nl)
    for k in pot_d:
        np.testing.assert_allclose(float(pot_v[k]), float(pot_d[k]),
                                   rtol=1e-12, err_msg=k)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(f_d), atol=1e-14)


def test_verlet_rebuild_criterion_and_update():
    from torchmd_tpu.neighbors import VerletKernel

    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0])
    kern = VerletKernel(forces.ffparams, forces.config,
                        box=[77.395] * 3, skin=2.0, pos0=np.asarray(pos))
    nl = kern.build(pos)
    assert not bool(kern.needs_rebuild(nl, pos))
    assert bool(kern.needs_rebuild(nl, pos + 1.5))  # > skin/2 = 1.0
    # update() rebuilds under lax.cond when the criterion trips
    nl2 = kern.update(pos + 1.5, nl)
    assert bool(jnp.all(nl2.ref_pos == pos + 1.5))
    nl3 = kern.update(pos + 0.1, nl)
    assert bool(jnp.all(nl3.ref_pos == pos))


def test_verlet_exclusions_respected():
    from torchmd_tpu.neighbors import VerletKernel

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    rs = np.random.RandomState(0)
    mol.charge = rs.randn(mol.numAtoms) * 0.05
    mol.bonds = np.array([[0, 1]])
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj", "electrostatics", "bonds"],
                     precision="double")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics", "bonds"],
                    precision="double", cutoff=9.0, rfa=True)

    pos = np.asarray(mol.coords[:, :, 0]).copy()
    pos[1] = pos[0] + [3.0, 0, 0]  # within cutoff: exclusion matters
    pos = jnp.asarray(pos)
    box = jnp.asarray([77.395] * 3)

    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    kern = VerletKernel(forces.ffparams, forces.config, box=np.asarray(box),
                        pos0=np.asarray(pos))
    nl = kern.build(pos)
    # the excluded pair must not appear in either neighbor row
    assert 1 not in np.asarray(nl.nbr[0]).tolist()
    assert 0 not in np.asarray(nl.nbr[1]).tolist()
    pot_v, f_v = kern.energy_forces(pos, box, nl)
    for k in pot_d:
        np.testing.assert_allclose(float(pot_v[k]), float(pot_d[k]),
                                   rtol=1e-12, err_msg=k)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(f_d), atol=1e-13)


def test_verlet_integration_matches_dense_path():
    """Short trajectories via the verlet-list scan and the dense scan must
    agree (lax.cond rebuilds included)."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    def run(kernel):
        mol, par, _ = _argon()
        forces = Forces(par, terms=["lj", "electrostatics"],
                        precision="double", cutoff=9.0, rfa=True,
                        kernel=kernel)
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.asarray([77.395] * 3))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=3)
        )
        integ = Integrator(system, forces, timestep=5.0, device="cpu")
        for _ in range(2):
            integ.step(niter=15)
        return system.pos.copy()

    np.testing.assert_allclose(run("dense"), run("verlet"), atol=1e-6)


def test_verlet_overflow_grows_capacity():
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, _ = _argon()
    forces = Forces(par, terms=["lj", "electrostatics"], precision="double",
                    cutoff=9.0, rfa=True, kernel="verlet")
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=3))
    integ = Integrator(system, forces, timestep=2.0, device="cpu")
    # shrink capacity after construction to force the overflow path
    integ._cell_kernel.vcfg = integ._cell_kernel.vcfg.with_capacity(1)
    integ._scan_fn = integ._build_scan_cell()
    integ.step(niter=2)
    assert integ._cell_kernel.vcfg.capacity > 1


def test_verlet_compute_api_and_auto_selection(monkeypatch):
    """Forces.compute() honors kernel='verlet', and kernel='auto' selects
    the verlet path above TMD_AUTO_VERLET_N when no cell grid fits."""
    mol, par, _ = _argon()
    pos = mol.coords[:, :, 0][None]

    fd = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True)
    fv = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True, kernel="verlet")
    ed = fd.compute(pos, None, returnDetails=True)[0]
    ev = fv.compute(pos, None, returnDetails=True)[0]
    assert fv._verlet_kernel is not None
    for k, v in ed.items():
        np.testing.assert_allclose(ev[k], v, rtol=1e-12, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(fv.last_forces), np.asarray(fd.last_forces), atol=1e-12
    )

    monkeypatch.setenv("TMD_AUTO_VERLET_N", "100")
    fa = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True, kernel="auto")
    assert fa.verlet_auto and fa.wants_verlet(None)
    ea = fa.compute(pos, None, returnDetails=True)[0]
    assert fa._verlet_kernel is not None  # auto-selected + built lazily
    for k, v in ed.items():
        np.testing.assert_allclose(ea[k], v, rtol=1e-12, err_msg=k)


def test_verlet_ewald_real_space_matches_dense():
    from torchmd_tpu.neighbors import VerletKernel

    mol, par, forces = _argon()
    cfg = forces.config._replace(ewald_alpha=0.37)
    ffp = forces.ffparams
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([77.395] * 3)

    pot_d, f_d = nonbonded_energy_forces(ffp, pos, box, cfg)
    kern = VerletKernel(ffp, cfg, box=np.asarray(box), pos0=np.asarray(pos))
    pot_v, f_v = kern.energy_forces(pos, box, kern.build(pos))
    for k in pot_d:
        np.testing.assert_allclose(float(pot_v[k]), float(pot_d[k]),
                                   rtol=1e-11, err_msg=k)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(f_d), atol=1e-13)


def test_cell_energies_track_box_changes():
    """Barostat-style box changes: the cell path must track the runtime
    box (binning follows the traced box; the grid reboxes when coverage
    breaks). Regression: the grid used to bin by the construction box,
    silently dropping boundary pairs after volume moves."""
    mol, par, _ = _argon()

    fd = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True)
    fc = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True, kernel="cell")

    for scale in (1.0, 0.9, 1.15, 0.62):
        L = 77.395 * scale
        box = np.zeros((1, 3, 3))
        np.fill_diagonal(box[0], [L] * 3)
        pos = (mol.coords[:, :, 0] * scale)[None]
        ed = fd.compute(pos, box, returnDetails=True)[0]
        ec = fc.compute(pos, box, returnDetails=True)[0]
        for k, v in ed.items():
            np.testing.assert_allclose(ec[k], v, rtol=1e-10,
                                       err_msg=f"{k} at scale {scale}")
        np.testing.assert_allclose(
            np.asarray(fc.last_forces), np.asarray(fd.last_forces),
            atol=1e-11, err_msg=f"forces at scale {scale}",
        )


def test_cell_dynamics_with_mc_barostat():
    """MC barostat + cell path end-to-end: volume moves between chunks
    keep integrating correct (finite, dense-consistent) energies."""
    from torchmd_tpu.barostat import MonteCarloBarostat
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, _ = _argon()
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="double", cutoff=9.0, rfa=True,
                    kernel="cell")
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=2))
    integ = Integrator(system, forces, timestep=5.0, T=120.0, gamma=2.0,
                       device="cpu")
    baro = MonteCarloBarostat(500.0, 120.0, seed=1)
    v0 = float(np.prod(system.box_diag[0]))
    for _ in range(6):
        integ.step(niter=20)
        baro.attempt(system, forces)
    assert baro.n_accepted + baro.n_attempted > 0
    v1 = float(np.prod(system.box_diag[0]))
    assert v1 < v0  # 500 bar on a dilute gas: compression
    # post-move energies match the dense path exactly
    fd = Forces(par, terms=["lj", "electrostatics"], precision="double",
                cutoff=9.0, rfa=True)
    ed = fd.compute(system.pos, system.box)
    ec = forces.compute(system.pos, system.box)
    np.testing.assert_allclose(ec, ed, rtol=1e-9)


def test_cell_virial_matches_dense_scaling_grad():
    """CellKernel.energy_forces_virial: the per-axis pair virial must
    equal -dE/ds_a of the dense nonbonded energy under joint coordinate
    + box scaling E(s*pos, s*box) (the MTK barostat's exact virial)."""
    from torchmd_tpu.potentials import nonbonded_energies

    mol, par, forces = _argon()
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float64)
    box = jnp.asarray([77.395] * 3, jnp.float64)
    kern = CellKernel(forces.ffparams, forces.config, par, np.asarray(box))
    cl = kern.build(pos)
    pot, f, vir = jax.jit(kern.energy_forces_virial)(pos, box, cl)
    pot0, f0 = kern.energy_forces(pos, box, cl)
    for k in pot0:  # with_virial must not perturb energies/forces
        np.testing.assert_allclose(float(pot[k]), float(pot0[k]),
                                   rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-14)

    def e_scaled(s):
        p = nonbonded_energies(forces.ffparams, pos * s, box * s,
                               forces.config)
        return sum(jax.tree_util.tree_leaves(p))

    vir_ref = -jax.grad(e_scaled)(jnp.ones(3, jnp.float64))
    np.testing.assert_allclose(np.asarray(vir), np.asarray(vir_ref),
                               rtol=1e-9, atol=1e-10)


def test_pallas_cell_virial_matches_jnp(monkeypatch):
    """The ghost-cell Pallas kernel's in-kernel virial accumulator
    (interpret mode) agrees with the jnp tier."""
    from torchmd_tpu.neighbors import cell_nonbonded_energy_forces
    from torchmd_tpu.ops.pallas_cell import pallas_cell_energy_forces

    mol, par, forces = _argon()
    pos32 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box32 = jnp.asarray([77.395] * 3, jnp.float32)
    kern = CellKernel(forces.ffparams, forces.config, par,
                      np.asarray([77.395] * 3))
    cl = kern.build(pos32)
    _, _, vir_j = cell_nonbonded_energy_forces(
        kern.ffp, kern.cfg, kern.clcfg, cl, kern.excl_table,
        jnp.asarray(pos32, jnp.float64), jnp.asarray(box32, jnp.float64),
        with_virial=True,
    )
    _, f_p, vir_p = pallas_cell_energy_forces(
        kern.ffp, kern.cfg, kern.clcfg, cl, kern.excl_table, pos32,
        box32, interpret=True, with_virial=True,
    )
    np.testing.assert_allclose(np.asarray(vir_p), np.asarray(vir_j),
                               rtol=2e-4, atol=1e-4)

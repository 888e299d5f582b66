"""Alchemical coupling tests: lambda endpoint identities, soft-core
behavior, dU/dlambda correctness, MD composition, and the TI/FEP/BAR
estimators (capabilities beyond the reference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from torchmd_tpu.alchemy import (
    AlchemicalCoupling,
    bar,
    fep_exponential,
    make_alchemical,
    ti_integrate,
)
from torchmd_tpu.forces import Forces
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.units import BOLTZMANN


def _lj_gas(natoms=12, L=14.0, seed=0, charge=0.08):
    rs = np.random.RandomState(seed)
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(["AR"] * natoms, dtype=object)
    mol.charge = np.full(natoms, charge)
    mol.masses = np.full(natoms, 39.95)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    # jittered lattice: no overlaps
    g = int(np.ceil(natoms ** (1 / 3)))
    pts = np.stack(np.meshgrid(*[np.arange(g)] * 3), -1).reshape(-1, 3)
    mol.coords = (
        (pts[:natoms] + 0.5) * (L / g) + 0.3 * rs.randn(natoms, 3)
    )[:, :, None]
    mol.box = np.full((3, 1), L)
    ffdict = {
        "atomtypes": ["AR"],
        "lj": {"AR": {"sigma": 3.345, "epsilon": 0.238}},
        "electrostatics": {"AR": {"charge": charge}},
        "masses": {"AR": 39.95},
    }
    ff = YamlForcefield(mol, ffdict)
    par = Parameters(ff, mol, ["lj", "electrostatics"], precision="double")
    forces = Forces(par, terms=["lj", "electrostatics"], precision="double",
                    cutoff=6.0, rfa=True)
    return mol, par, forces


def test_lambda_one_alpha_zero_recovers_full_energy():
    """alpha=0, lam=1: soft-core reduces to plain LJ, elec fully on ->
    base(with crossing pairs masked) + coupling == original full energy."""
    mol, par, forces = _lj_gas()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray(mol.box[:, 0])
    e_full = forces.compute(pos[None], box[None])[0]

    coupling = make_alchemical(forces, alch_atoms=[0, 1, 2], lam=1.0,
                               alpha=0.0)
    e_base = forces.compute(pos[None], box[None])[0]
    # compute() already folds the external coupling in
    assert abs(e_base - e_full) < 1e-9, (e_base, e_full)
    # and the coupling alone is the crossing-pair energy (nonzero)
    e_c = float(coupling.energy_fn(pos, box))
    assert abs(e_c) > 1e-3


def test_lambda_zero_decouples():
    mol, par, forces = _lj_gas()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray(mol.box[:, 0])
    coupling = make_alchemical(forces, alch_atoms=[0, 1], lam=0.0)
    assert float(coupling.energy_fn(pos, box)) == 0.0


def test_softcore_bounded_at_overlap():
    """At lam<1 the soft core keeps the energy finite even at r=0 --
    the whole point vs plain LJ."""
    mol, par, forces = _lj_gas()
    coupling = AlchemicalCoupling(forces.ffparams, forces.config,
                                  alch_atoms=[0], lam=0.5, alpha=0.5)
    pos = np.asarray(mol.coords[:, :, 0]).copy()
    pos[0] = pos[1]  # perfect overlap with an environment atom
    e = float(coupling.energy_lambda(jnp.asarray(pos),
                                     jnp.asarray(mol.box[:, 0]), 0.5))
    assert np.isfinite(e)
    # plain LJ there would be astronomically large
    assert abs(e) < 1e4


def test_dudl_matches_finite_difference():
    mol, par, forces = _lj_gas()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray(mol.box[:, 0])
    coupling = AlchemicalCoupling(forces.ffparams, forces.config,
                                  alch_atoms=[0, 3], lam=0.7, alpha=0.5)
    g = float(coupling.dudl(pos, box, 0.7))
    eps = 1e-6
    ep = float(coupling.energy_lambda(pos, box, 0.7 + eps))
    em = float(coupling.energy_lambda(pos, box, 0.7 - eps))
    fd = (ep - em) / (2 * eps)
    assert abs(g - fd) < 1e-6 * max(1.0, abs(fd)), (g, fd)


def test_ti_recovers_endpoint_difference_static():
    """On a FIXED configuration, integral of dU/dlambda over [0,1] equals
    U(1) - U(0) exactly; a dense trapezoid grid must reproduce it."""
    mol, par, forces = _lj_gas()
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray(mol.box[:, 0])
    coupling = AlchemicalCoupling(forces.ffparams, forces.config,
                                  alch_atoms=[0, 1], lam=1.0, alpha=0.5)
    lambdas = np.linspace(0.0, 1.0, 101)
    dudls = [float(coupling.dudl(pos, box, l)) for l in lambdas]
    ti = ti_integrate(lambdas, dudls)
    du = float(coupling.energy_lambda(pos, box, 1.0)
               - coupling.energy_lambda(pos, box, 0.0))
    assert abs(ti - du) < 5e-3 * max(1.0, abs(du)), (ti, du)


def test_alchemical_md_runs():
    """The coupling folds into the jitted integrator scan through the
    energy_fn protocol; a short Langevin run stays finite and the base
    mask no longer double-counts."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, forces = _lj_gas()
    make_alchemical(forces, alch_atoms=[0, 1, 2], lam=0.5)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=0))
    integ = Integrator(system, forces, 2.0, gamma=1.0, T=120.0, seed=1)
    ekin, epot, T = integ.step(niter=50)
    assert np.isfinite(epot[0]) and np.isfinite(ekin[0])


def test_energies_over_frames_vmap():
    mol, par, forces = _lj_gas()
    rs = np.random.RandomState(2)
    frames = jnp.asarray(
        mol.coords[:, :, 0][None] + 0.05 * rs.randn(6, mol.numAtoms, 3)
    )
    boxes = jnp.tile(jnp.asarray(mol.box[:, 0])[None], (6, 1))
    coupling = AlchemicalCoupling(forces.ffparams, forces.config,
                                  alch_atoms=[0], lam=1.0)
    e5 = coupling.energies_over_frames(frames, boxes, 0.5)
    assert e5.shape == (6,)
    e_one = float(coupling.energy_lambda(frames[0], boxes[0], 0.5))
    assert abs(float(e5[0]) - e_one) < 1e-10


def test_fep_and_bar_estimators():
    """Gaussian work distributions with known free energy: forward work
    ~ N(dF + s^2/2, s^2), reverse ~ N(-dF + s^2/2, s^2) in kT units
    satisfies Crooks; both estimators must recover dF."""
    kT = BOLTZMANN * 300.0
    dF_true = 2.5 * kT
    s = 1.0  # kT units
    rs = np.random.RandomState(0)
    n = 200000
    w_f = dF_true + kT * (s * s / 2 + s * rs.randn(n))
    w_r = -dF_true + kT * (s * s / 2 + s * rs.randn(n))

    dF_fep = fep_exponential(w_f, kT)
    assert abs(dF_fep - dF_true) < 0.05 * kT, (dF_fep, dF_true)

    dF_bar = bar(w_f, w_r, kT)
    assert abs(dF_bar - dF_true) < 0.02 * kT, (dF_bar, dF_true)


def test_alchemy_nbfix_endpoint_consistency():
    """With NBFIX A/B override tables active, masked base + coupling at
    lam=1 must still reproduce the untouched force field (regression:
    the coupling used to re-derive LJ from Lorentz-Berthelot)."""
    import jax.numpy as jnp

    from torchmd_tpu.potentials import FFParams, ForceTermConfig
    from torchmd_tpu.alchemy import AlchemicalCoupling
    from torchmd_tpu.potentials import nonbonded_energy_forces

    rs = np.random.RandomState(1)
    n = 8
    pos = jnp.asarray(rs.rand(n, 3) * 6.0 + np.arange(n)[:, None] * 1.5)
    # two atom types with an NBFIX-like asymmetric A/B table
    types = jnp.asarray(rs.randint(0, 2, n), jnp.int32)
    A = jnp.asarray([[5e4, 2e4], [2e4, 9e4]])
    B = jnp.asarray([[60.0, 25.0], [25.0, 110.0]])
    ffp = FFParams(
        charges=jnp.asarray(rs.randn(n) * 0.1),
        masses=jnp.full((n, 1), 10.0),
        mapped_atom_types=types,
        lj_params=jnp.asarray([[3.0, 0.1], [3.5, 0.2]]),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None, nb_mask=jnp.asarray(~np.eye(n, dtype=bool)),
        lj_ab=(A, B),
    )
    cfg = ForceTermConfig(terms=("lj", "electrostatics"), cutoff=12.0)
    pot0, f0 = nonbonded_energy_forces(ffp, pos, None, cfg)
    e0 = sum(float(v) for v in pot0.values())

    alch = [0, 3]
    coupling = AlchemicalCoupling(ffp, cfg, alch)
    mask = np.asarray(ffp.nb_mask).copy()
    env = np.setdiff1d(np.arange(n), alch)
    mask[np.ix_(alch, env)] = False
    mask[np.ix_(env, alch)] = False
    ffp_m = ffp._replace(nb_mask=jnp.asarray(mask))
    pot1, f1 = nonbonded_energy_forces(ffp_m, pos, None, cfg)
    e1 = sum(float(v) for v in pot1.values())
    e_c = float(coupling.energy_lambda(pos, None, 1.0))
    np.testing.assert_allclose(e1 + e_c, e0, rtol=1e-10)


def test_make_alchemical_rejects_cell_path():
    """Cell kernels mask pairs via the exclusion table, not nb_mask --
    alchemical setups on that path must refuse instead of double-count."""
    import os

    import pytest

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.alchemy import make_alchemical

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0,
                    kernel="cell")
    with pytest.raises(NotImplementedError, match="cell"):
        make_alchemical(forces, [0, 1])


def test_alchemy_on_verlet_path_consistent():
    """kernel='verlet' + make_alchemical: the pre-edit neighbor kernel is
    dropped, the rebuilt list honors the masked crossing pairs, and the
    total (masked base + coupling at lam=1) matches the dense alchemical
    setup exactly."""
    import os

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.alchemy import make_alchemical

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")

    def build(kernel):
        forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0,
                        kernel=kernel)
        pos = mol.coords[:, :, 0][None]
        box = np.zeros((1, 3, 3))
        np.fill_diagonal(box[0], [77.395] * 3)
        forces.compute(pos, box)  # builds the kernel (if any)
        make_alchemical(forces, [0, 1], lam=1.0)
        return forces.compute(pos, box)[0]

    e_dense = build("dense")
    e_verlet = build("verlet")
    np.testing.assert_allclose(e_verlet, e_dense, rtol=1e-11)


def test_alchemical_guard_survives_box_resolution(monkeypatch):
    """Regression: with kernel='auto' above the cell size trigger, the
    guard must hold even if the first evaluation (no box) would have
    marked the cell grid infeasible -- a later periodic box must not
    re-enable the cell path over the edited mask."""
    import os

    import pytest

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.alchemy import make_alchemical

    monkeypatch.setenv("TMD_AUTO_CELL_N", "1")  # everything size-triggers
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0,
                    kernel="auto")
    pos = mol.coords[:, :, 0][None]
    forces.compute(pos, None)  # no box: cell marked infeasible
    with pytest.raises(NotImplementedError, match="cell"):
        make_alchemical(forces, [0, 1])

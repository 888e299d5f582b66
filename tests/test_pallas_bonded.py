"""Pallas fused bonded kernels: equivalence with the jnp bonded path
(torchmd_tpu.bonded) in interpret mode (f32), including the per-assignment
expansion of multi-term dihedrals and the branchless atan2."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import DATA_DIR, SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.bonded import bonded_energy_forces
from torchmd_tpu.ops.pallas_bonded import (
    _atan2,
    build_pallas_bonded_plan,
    pallas_bonded_energy_forces,
)

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]


def _system(folder, coords, extra=None):
    d = os.path.join(DATA_DIR, folder)
    mol = Molecule(os.path.join(d, "structure.prmtop"))
    mol.read(os.path.join(d, coords))
    if extra:
        mol.read(os.path.join(d, extra))
    ff = ForceField.create(mol, os.path.join(d, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    forces = Forces(par, terms=TERMS, precision="single", cutoff=9.0,
                    rfa=True, switch_dist=7.5)
    return mol, forces


def _compare(forces, pos, box):
    pos = jnp.asarray(pos, jnp.float32)
    b = None if box is None else jnp.asarray(box, jnp.float32)
    pot_ref, f_ref = bonded_energy_forces(
        forces.ffparams, forces._bonded_plan, pos, b, forces.config
    )
    plan = build_pallas_bonded_plan(forces.ffparams, forces.config)
    pot_p, f_p = pallas_bonded_energy_forces(plan, pos, b, interpret=True)
    assert set(pot_p) == set(pot_ref)
    for k in pot_ref:
        scale = max(1.0, abs(float(pot_ref[k])))
        assert abs(float(pot_ref[k]) - float(pot_p[k])) < 5e-6 * scale, k
    fscale = float(jnp.max(jnp.abs(f_ref))) or 1.0
    assert float(jnp.max(jnp.abs(f_ref - f_p))) < 5e-5 * fscale


def test_alanine_pbc_equivalence():
    mol, forces = _system("prod_alanine_dipeptide_amber", "input.coor",
                          "input.xsc")
    _compare(forces, mol.coords[:, :, 0], mol.box[:, 0])


def test_ligand_nobox_equivalence():
    mol, forces = _system("ligand-amber", "structure.pdb")
    _compare(forces, mol.coords[:, :, 0], None)


def test_multiterm_dihedral_expansion():
    """CHARMM-style multi-term dihedrals (non-identity map) are expanded
    per assignment; energies/forces must match the segment-sum path."""
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield

    ffdict = {
        "atomtypes": ["C1", "C2", "C3", "C4"],
        "masses": {t: 12.0 for t in ("C1", "C2", "C3", "C4")},
        "bonds": {"(X, X)": {"k0": 100.0, "req": 1.5}},
        "angles": {"(X, X, X)": {"k0": 30.0, "theta0": 110.0}},
        "dihedrals": {"(C1, C2, C3, C4)": {"terms": [
            {"phi_k": 1.0, "phase": 0.0, "per": 1},
            {"phi_k": 0.5, "phase": 180.0, "per": 2},
            {"phi_k": 0.2, "phase": 0.0, "per": 3},
        ]}},
        "lj": {t: {"sigma": 3.0, "epsilon": 0.1, "sigma14": 3.0,
                   "epsilon14": 0.1} for t in ("C1", "C2", "C3", "C4")},
        "electrostatics": {t: {"charge": 0.05} for t in
                           ("C1", "C2", "C3", "C4")},
    }
    mol = Molecule()
    mol.numAtoms = 4
    mol.atomtype = np.array(["C1", "C2", "C3", "C4"], dtype=object)
    mol.charge = np.full(4, 0.05)
    mol.masses = np.full(4, 12.0)
    mol.bonds = np.array([[0, 1], [1, 2], [2, 3]])
    mol.angles = np.array([[0, 1, 2], [1, 2, 3]])
    mol.dihedrals = np.array([[0, 1, 2, 3]])
    mol.impropers = np.zeros((0, 4), dtype=np.int64)
    mol.coords = np.array(
        [[0.0, 0, 0], [1.5, 0, 0], [2.1, 1.3, 0], [3.0, 1.5, 1.1]]
    ).reshape(4, 3, 1)
    ff = YamlForcefield(mol, ffdict)
    terms = ["bonds", "angles", "dihedrals"]
    par = Parameters(ff, mol, terms, precision="single")
    forces = Forces(par, terms=terms, precision="single")
    tbl = forces.ffparams.dihedrals
    assert len(np.asarray(tbl.map_term)) == 3  # multi-term indirection
    _compare(forces, mol.coords[:, :, 0], None)


def test_atan2_matches_numpy():
    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(5000).astype(np.float32) * 4)
    x = jnp.asarray(rs.randn(5000).astype(np.float32) * 4)
    got = np.asarray(_atan2(y, x))
    want = np.asarray(jnp.arctan2(y, x))
    np.testing.assert_allclose(got, want, atol=5e-7)
    specials = [(0.0, 0.0), (0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0)]
    for yy, xx in specials:
        assert abs(
            float(_atan2(jnp.float32(yy), jnp.float32(xx)))
            - float(np.arctan2(yy, xx))
        ) < 1e-6


def test_fuzz_random_topology():
    """Random small topology with PBC: pallas (interpret) == jnp path."""
    rs = np.random.RandomState(7)
    n = 40
    from torchmd_tpu.potentials import FFParams  # noqa: F401

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    mol.charge = rs.randn(mol.numAtoms) * 0.1
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    # fabricate bonds/angles between random nearby atoms
    mol.bonds = rs.randint(0, n, (30, 2))
    mol.bonds = mol.bonds[mol.bonds[:, 0] != mol.bonds[:, 1]]
    par = Parameters(ff, mol, ["lj", "electrostatics"], precision="single")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics"], precision="single",
                    cutoff=9.0, rfa=True)
    plan = build_pallas_bonded_plan(forces.ffparams, forces.config)
    assert plan is None  # no bonded terms -> no plan; nothing to compare

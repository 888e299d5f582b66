"""Urey-Bradley 1-3 springs (opt-in CHARMM term beyond the reference)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.forces import Forces

PRM_WITH_UB = """* test params
*

BONDS
CT   HT    300.0   1.10

ANGLES
HT   CT   HT    35.0   109.5   5.40   1.802

NONBONDED
CT    0.0   -0.07    1.99
HT    0.0   -0.03    1.34
END
"""


@pytest.fixture
def methane_like(tmp_path):
    prm = tmp_path / "ub.prm"
    prm.write_text(PRM_WITH_UB)
    mol = Molecule()
    mol.numAtoms = 3
    mol.atomtype = np.array(["HT", "CT", "HT"], dtype=object)
    mol.charge = np.zeros(3)
    mol.masses = np.array([1.008, 12.011, 1.008])
    mol.bonds = np.array([[0, 1], [1, 2]])
    mol.angles = np.array([[0, 1, 2]])
    mol.coords = np.array(
        [[1.1, 0.0, 0.0], [0.0, 0.0, 0.0], [-0.4, 1.05, 0.0]]
    )[:, :, None]
    ff = ForceField.create(mol, str(prm))
    return mol, ff


def test_urey_bradley_energy(methane_like):
    mol, ff = methane_like
    terms = ["bonds", "angles", "urey-bradley"]
    par = Parameters(ff, mol, terms, precision="double")
    assert par.urey_bradley_params is not None
    np.testing.assert_array_equal(par.urey_bradley_params["idx"], [[0, 2]])

    forces = Forces(par, terms=terms, precision="double")
    det = forces.compute(mol.coords[:, :, 0][None], None, returnDetails=True)[0]

    s = np.linalg.norm(mol.coords[0, :, 0] - mol.coords[2, :, 0])
    expected = 5.40 * (s - 1.802) ** 2
    assert det["urey-bradley"] == pytest.approx(expected, rel=1e-9)
    # forces exist and are finite
    assert np.isfinite(np.asarray(forces.last_forces)).all()


def test_urey_bradley_off_by_default(methane_like):
    mol, ff = methane_like
    par = Parameters(ff, mol, ["bonds", "angles"], precision="double")
    forces = Forces(par, terms=["bonds", "angles"], precision="double")
    det = forces.compute(mol.coords[:, :, 0][None], None, returnDetails=True)[0]
    assert "urey-bradley" not in det

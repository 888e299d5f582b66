"""CHARMM wildcard dihedrals and YAML X-variant ordering."""

import numpy as np
import pytest

from torchmd_tpu.forcefields.ff_charmm import CharmmParameterSet, CharmmForcefield
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield


PRM = """* params
*

BONDS
CA   CB    300.0   1.50

ANGLES
CA   CB   CA    40.0   110.0

DIHEDRALS
X    CB   CA   X      0.90   3     0.00
CA   CB   CA   CB     1.50   2   180.00

NONBONDED
CA    0.0   -0.07    1.99
CB    0.0   -0.11    2.00
END
"""


def test_charmm_wildcard_dihedral(tmp_path):
    p = tmp_path / "wc.prm"
    p.write_text(PRM)

    class M:
        atomtype = np.array(["CA", "CB"], dtype=object)
        charge = np.zeros(2)
        masses = np.array([12.0, 12.0])

    ff = CharmmForcefield(M(), [str(p)])
    # exact match wins
    terms = ff.get_dihedral("CA", "CB", "CA", "CB")
    assert terms[0][0] == 1.5 and terms[0][2] == 2
    # wildcard fallback for an unlisted quad
    terms = ff.get_dihedral("CB", "CB", "CA", "CA")
    assert terms[0][0] == 0.9 and terms[0][2] == 3
    with pytest.raises(RuntimeError):
        ff.get_dihedral("CA", "CA", "CA", "CA")


def test_yaml_wildcard_prefers_fewest_x():
    ffdict = {
        "atomtypes": ["A", "B"],
        "bonds": {
            "(X, X)": {"k0": 1.0, "req": 1.0},
            "(A, B)": {"k0": 2.0, "req": 2.0},
            "(A, X)": {"k0": 3.0, "req": 3.0},
        },
        "masses": {"A": 1.0, "B": 2.0},
    }

    class M:
        atomtype = np.array(["A", "B"], dtype=object)

    ff = YamlForcefield(M(), ffdict)
    assert ff.get_bond("A", "B") == (2.0, 2.0)   # exact beats wildcards
    assert ff.get_bond("A", "A") == (3.0, 3.0)   # one X beats two
    assert ff.get_bond("B", "B") == (1.0, 1.0)   # falls to (X, X)
    # reversed lookup also resolves through (A, X)
    assert ff.get_bond("B", "A") == (2.0, 2.0)


def test_charmm_argon_par_psf_pipeline():
    """The reference's tests/reference CHARMM argon set (par with
    continuation lines + rtf MASS + psf) computes the textbook LJ dimer
    energy."""
    import os

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces

    d = os.path.join(SYSTEMS_DIR, "reference")
    mol = Molecule(os.path.join(d, "structure.psf"))
    mol.read(os.path.join(d, "argon2.pdb"))
    ff = ForceField.create(
        mol, [os.path.join(d, "argon.par"), os.path.join(d, "argon.rtf")]
    )
    sigma, eps = ff.get_LJ("AR")
    assert sigma == pytest.approx(2 * 1.9081 * 2 ** (-1 / 6), rel=1e-9)
    assert eps == pytest.approx(0.238, rel=1e-9)

    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double")
    pos = mol.coords[:, :, 0][None]
    r = float(np.linalg.norm(pos[0, 1] - pos[0, 0]))
    e = forces.compute(pos, None)[0]
    expected = 4 * eps * ((sigma / r) ** 12 - (sigma / r) ** 6)
    assert e == pytest.approx(expected, rel=1e-10)

"""AMBER parm.dat base-set loading: sequential-format parsing, X-wildcard
dihedral/improper lookup, vdW equivalences, frcmod override layering, and
end-to-end assembly (capability the reference reaches only through parmed
prmtop tables + frcmod, ff_parmed.py:33-42)."""

from __future__ import annotations

import textwrap

import numpy as np

from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forcefields.ff_amber import (
    AmberForcefield,
    AmberParmDatParameterSet,
)
from torchmd_tpu.forces import Forces
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters

PARM_DAT = textwrap.dedent("""\
    synthetic parm.dat (parm99 layout) for tests
    CT 12.010         0.878
    HC 1.008          0.135
    N  14.010         0.530
    NB 14.010         0.530

    C   H   HO  N   NA
    CT-CT  310.0    1.526
    CT-HC  340.0    1.090
    CT-N   337.0    1.449

    CT-CT-CT   40.0      109.50
    HC-CT-HC   35.0      109.50
    CT-CT-HC   50.0      109.50
    CT-CT-N    80.0      111.20

    X -CT-CT-X    9    1.40          0.0             3.
    CT-CT-CT-CT   1    0.18          0.0            -3.
    CT-CT-CT-CT   1    0.25        180.0             2.

    X -X -CT-HC          1.1          180.          2.
    CT-CT-CT-HC          1.3          180.          2.

      HW  OW  0000.     0000.     4.  flag for fast water

    N   NB
    CT

    MOD4      RE
      CT          1.9080  0.1094
      HC          1.4870  0.0157
      N           1.8240  0.1700
    END
""")

FRCMOD = textwrap.dedent("""\
    override frcmod
    MASS
    CT 12.500

    BOND
    CT-CT  400.0    1.500

    NONBON
      CT          2.0000  0.2000

""")


def test_parmdat_parsing(tmp_path):
    p = tmp_path / "parm.dat"
    p.write_text(PARM_DAT)
    s = AmberParmDatParameterSet(str(p))

    assert s.masses["CT"] == 12.010
    assert s.bond_types[("CT", "CT")] == (310.0, 1.526)
    assert s.bond_types[("HC", "CT")] == (340.0, 1.090)  # reversed stored
    k, th = s.angle_types[("CT", "CT", "N")]
    assert k == 80.0 and np.isclose(th, np.radians(111.20))

    # wildcard dihedral: IDIVF division (1.40/9)
    terms = s.lookup_dihedral(("HC", "CT", "CT", "N"))
    assert terms is not None and len(terms) == 1
    pk, per, phase, scee, scnb = terms[0]
    assert np.isclose(pk, 1.40 / 9) and per == 3.0
    assert (scee, scnb) == (1.2, 2.0)

    # exact beats wildcard; negative-PN continuation -> 2 terms
    terms = s.lookup_dihedral(("CT", "CT", "CT", "CT"))
    assert len(terms) == 2
    assert terms[0][0] == 0.18 and terms[1][0] == 0.25

    # improper wildcards (center third): exact first, then X fallbacks
    v = s.lookup_improper(("CT", "CT", "CT", "HC"))
    assert v is not None and v[0] == 1.3
    v = s.lookup_improper(("N", "CT", "CT", "HC"))  # only X -X match
    assert v is not None and v[0] == 1.1

    # vdW: direct + equivalence alias (NB -> N)
    assert s.atom_types["CT"][1] == 0.1094
    assert s.atom_types["NB"] == s.atom_types["N"]


def _butane():
    mol = Molecule()
    mol.numAtoms = 4
    mol.atomtype = np.array(["CT", "CT", "CT", "CT"], dtype=object)
    mol.charge = np.full(4, -0.05)
    mol.masses = np.zeros(4)  # force masses from the parameter set
    mol.bonds = np.array([[0, 1], [1, 2], [2, 3]])
    mol.angles = np.array([[0, 1, 2], [1, 2, 3]])
    mol.dihedrals = np.array([[0, 1, 2, 3]])
    mol.coords = np.array(
        [[0.0, 0.0, 0.0], [1.5, 0.1, 0.0], [2.1, 1.5, 0.2], [3.6, 1.6, 0.4]]
    )[:, :, None]
    return mol


def test_parmdat_end_to_end(tmp_path):
    p = tmp_path / "parm.dat"
    p.write_text(PARM_DAT)
    mol = _butane()
    ff = ForceField.create(mol, str(p))
    assert isinstance(ff, AmberForcefield)
    terms = ["bonds", "angles", "dihedrals", "1-4", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    assert np.allclose(par.masses[:, 0], 12.010)  # from the .dat MASS rows
    forces = Forces(par, terms=terms, precision="double")
    e = forces.compute(mol.coords[:, :, 0][None], None, returnDetails=True)[0]
    assert np.isfinite(e["bonds"]) and np.isfinite(e["dihedrals"])
    # multi-term CT-CT-CT-CT: 2 parameter rows behind 1 dihedral
    assert len(par.dihedral_params["params"]) == 2


def test_frcmod_overrides_parmdat(tmp_path):
    (tmp_path / "parm.dat").write_text(PARM_DAT)
    (tmp_path / "mod.frcmod").write_text(FRCMOD)
    mol = _butane()
    ff = ForceField.create(
        mol, [str(tmp_path / "parm.dat"), str(tmp_path / "mod.frcmod")]
    )
    # later file wins (tleap loadAmberParams convention)
    assert ff.get_bond("CT", "CT") == (400.0, 1.500)
    assert ff.get_LJ("CT")[1] == 0.2000
    assert ff.get_mass("CT") == 12.500
    # entries only in the base set still resolve
    assert ff.get_bond("CT", "HC") == (340.0, 1.090)
    assert ff.get_LJ("HC")[1] == 0.0157
    # wildcard dihedral from the base set still resolves through the stack
    assert len(ff.get_dihedral("HC", "CT", "CT", "N")) == 1


def test_prmtop_path_still_works():
    """Regression: the single-prmtop route is unchanged (thrombin system
    loads and the reader picks the parsed prmtop off the Molecule)."""
    import os

    from conftest import DATA_DIR

    d = os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")
    mol = Molecule(os.path.join(d, "structure.prmtop"))
    mol.read(os.path.join(d, "input.coor"))
    ff = ForceField.create(mol, os.path.join(d, "structure.prmtop"))
    assert isinstance(ff, AmberForcefield)
    assert len(ff.sets) == 1
    sig, eps = ff.get_LJ(mol.atomtype[0])
    assert sig > 0

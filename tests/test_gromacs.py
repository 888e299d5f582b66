"""GROMACS .top/.itp/.gro ingestion tests.

Validation strategy (no GROMACS binary in this container): every energy
assertion is against an independent numpy re-implementation of the GROMACS
functional forms written directly in this file (units converted
independently), plus structural checks of the preprocessor, molecule
replication, exclusion generation, wildcard type matching and the
Ryckaert-Bellemans expansion identity.
"""

import os

import numpy as np
import pytest

from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forcefields.ff_gromacs import (
    GromacsForcefield,
    rb_to_periodic_rows,
)
from torchmd_tpu.forces import Forces
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.units import ELEC_FACTOR

KJ2KCAL = 1.0 / 4.184


def write(path, text):
    with open(path, "w") as fh:
        fh.write(text)
    return str(path)


# ----------------------------------------------------------------------
# fixtures
# ----------------------------------------------------------------------

SPC_TOP = """
[ defaults ]
; nbfunc comb-rule gen-pairs fudgeLJ fudgeQQ
  1      2         yes       0.5     0.8333

[ atomtypes ]
; name atnum mass     charge  ptype sigma(nm)    eps(kJ)
  OW   8     15.99940 -0.82   A     3.16557e-01  6.50629e-01
  HW   1     1.00800   0.41   A     0.0          0.0

[ moleculetype ]
; name nrexcl
  SOL  2

[ atoms ]
; nr type resnr residue atom cgnr charge mass
  1  OW   1     SOL     OW   1    -0.82  15.9994
  2  HW   1     SOL     HW1  1     0.41   1.008
  3  HW   1     SOL     HW2  1     0.41   1.008

[ settles ]
; OW funct doh dhh
  1  1     0.1 0.16330

[ exclusions ]
1 2 3
2 1 3
3 1 2

[ system ]
SPC water

[ molecules ]
SOL 2
"""


def spc_coords():
    """Two SPC geometries (Angstrom), 3.1 A apart in x."""
    w = np.array([
        [0.000, 0.000, 0.000],
        [1.000, 0.000, 0.000],
        [-0.333, 0.943, 0.000],
    ])
    return np.concatenate([w, w + np.array([3.1, 0.4, 0.2])])


def test_spc_water_energy_vs_numpy(tmp_path):
    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    assert mol.numAtoms == 6
    coords = spc_coords()
    mol.coords = coords[:, :, None]

    ff = ForceField.create(mol, top)
    assert isinstance(ff, GromacsForcefield)
    par = Parameters(ff, mol, ["bonds", "lj", "electrostatics"],
                     precision="double")
    forces = Forces(par, terms=["bonds", "lj", "electrostatics"],
                    precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    # independent numpy: only intermolecular pairs interact
    sig = 3.16557e-01 * 10.0
    eps = 6.50629e-01 * KJ2KCAL
    q = np.array([-0.82, 0.41, 0.41] * 2)
    e_lj = 0.0
    e_el = 0.0
    for i in range(3):
        for j in range(3, 6):
            r = np.linalg.norm(coords[i] - coords[j])
            if i == 0 and j == 3:
                e_lj += 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
            e_el += ELEC_FACTOR * q[i] * q[j] / r
    assert pots["lj"] == pytest.approx(e_lj, rel=1e-9)
    assert pots["electrostatics"] == pytest.approx(e_el, rel=1e-9)
    # settle distances became zero-k bonds: no bonded energy
    assert pots["bonds"] == pytest.approx(0.0, abs=1e-12)


def test_spc_settle_detection(tmp_path):
    from torchmd_tpu.constraints import build_settle

    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "lj", "electrostatics"],
                     precision="double")
    ss = build_settle(par, par.masses)
    assert ss is not None and int(ss.oidx.shape[0]) == 2
    assert np.allclose(np.asarray(ss.r_oh), 1.0)
    assert np.allclose(np.asarray(ss.r_hh), 1.6330)


BUTANE_TOP = """
#define RB_BUTANE 9.2789 12.156 -13.12 -3.0597 26.24 -31.495

[ defaults ]
  1 3 yes 0.5 0.8333

[ atomtypes ]
  CH3  6  15.035  0.0  A  3.905e-01  7.3216e-01
  CH2  6  14.027  0.0  A  3.905e-01  4.9371e-01

[ moleculetype ]
  BUT  3

[ atoms ]
  1 CH3 1 BUT C1 1  0.12 15.035
  2 CH2 1 BUT C2 1 -0.12 14.027
  3 CH2 1 BUT C3 1 -0.12 14.027
  4 CH3 1 BUT C4 1  0.12 15.035

[ bonds ]
  1 2 1 0.1530 224262.4
  2 3 1 0.1530 224262.4
  3 4 1 0.1530 224262.4

[ angles ]
  1 2 3 1 111.0 519.6545
  2 3 4 1 111.0 519.6545

[ pairs ]
  1 4 1

[ dihedrals ]
  1 2 3 4 3 RB_BUTANE

[ system ]
butane

[ molecules ]
BUT 1
"""


def butane_coords(phi_deg):
    """4-atom chain with bond length 1.53, angles 111 deg, dihedral phi."""
    b, th = 1.53, np.radians(111.0)
    p0 = np.array([0.0, 0.0, 0.0])
    p1 = np.array([b, 0.0, 0.0])
    p2 = p1 + b * np.array([-np.cos(th), np.sin(th), 0.0])
    # place p3 by rotating around the p1->p2 axis by phi
    phi = np.radians(phi_deg)
    e23 = (p2 - p1) / np.linalg.norm(p2 - p1)
    # reference direction perpendicular to e23 in the 0-1-2 plane
    u = p0 - p1
    u = u - np.dot(u, e23) * e23
    u /= np.linalg.norm(u)
    v = np.cross(e23, u)
    d = np.cos(phi) * u + np.sin(phi) * v
    dirn = d * np.sin(th) - e23 * np.cos(th)
    p3 = p2 + b * dirn
    return np.stack([p0, p1, p2, p3])


def rb_energy_kcal(phi, c_kj):
    psi = phi - np.pi
    return KJ2KCAL * sum(
        c * np.cos(psi) ** n for n, c in enumerate(c_kj)
    )


def measured_phi(pos):
    r12 = pos[0] - pos[1]
    r23 = pos[1] - pos[2]
    r34 = pos[2] - pos[3]
    ca = np.cross(r12, r23)
    cb = np.cross(r23, r34)
    cc = np.cross(r23, ca)
    cosp = np.dot(ca, cb) / (np.linalg.norm(ca) * np.linalg.norm(cb))
    sinp = np.dot(cc, cb) / (np.linalg.norm(cc) * np.linalg.norm(cb))
    return -np.arctan2(sinp, cosp)


RB_C = [9.2789, 12.156, -13.12, -3.0597, 26.24, -31.495]


def test_rb_expansion_identity():
    rows = rb_to_periodic_rows(RB_C)
    phis = np.linspace(-np.pi, np.pi, 97)
    direct = np.array([rb_energy_kcal(p, RB_C) for p in phis])
    expanded = sum(
        k * (1.0 + np.cos(n * phis - ph)) for k, ph, n in rows
    )
    assert np.allclose(expanded, direct, atol=1e-10)


@pytest.mark.parametrize("phi_deg", [0.0, 60.0, 120.0, 180.0, -73.0])
def test_butane_rb_dihedral(tmp_path, phi_deg):
    top = write(tmp_path / "butane.top", BUTANE_TOP)
    mol = Molecule(top)
    coords = butane_coords(phi_deg)
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "angles", "dihedrals"],
                     precision="double")
    forces = Forces(par, terms=["bonds", "angles", "dihedrals"],
                    precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]
    phi = measured_phi(coords)
    assert np.degrees(phi) == pytest.approx(phi_deg, abs=1e-6)
    assert pots["dihedrals"] == pytest.approx(
        rb_energy_kcal(phi, RB_C), rel=1e-9, abs=1e-10
    )
    # bonds/angles at equilibrium geometry: ~0 (within float placement)
    assert abs(pots["bonds"]) < 1e-6
    assert abs(pots["angles"]) < 1e-6


def test_butane_gen_pairs_14(tmp_path):
    """[pairs] with gen-pairs: geometric comb rule x fudgeLJ, Coulomb x
    fudgeQQ -- checked against numpy."""
    top = write(tmp_path / "butane.top", BUTANE_TOP)
    mol = Molecule(top)
    coords = butane_coords(97.0)
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "angles", "dihedrals", "1-4", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    r14 = np.linalg.norm(coords[0] - coords[3])
    sig = np.sqrt(3.905e-01 * 3.905e-01) * 10.0  # geometric (comb rule 3)
    eps = np.sqrt(7.3216e-01 * 7.3216e-01) * KJ2KCAL * 0.5  # x fudgeLJ
    e_lj14 = 4 * eps * ((sig / r14) ** 12 - (sig / r14) ** 6)
    e_el14 = 0.8333 * ELEC_FACTOR * 0.12 * 0.12 / r14
    # all non-pair nonbonded pairs are excluded by nrexcl=3
    assert pots["lj"] == pytest.approx(e_lj14, rel=1e-9)
    assert pots["electrostatics"] == pytest.approx(e_el14, rel=1e-6)


GROMOS_TOP = """
[ defaults ]
  1 1 no 1.0 1.0

[ atomtypes ]
;  name  mass  charge ptype  C6(kJ nm6)  C12(kJ nm12)
   AR    39.95 0.0    A      6.2647e-03  9.8470e-06
   KR    83.80 0.0    A      9.4000e-03  2.7000e-05

[ nonbond_params ]
   AR KR 1 8.0e-03 1.8e-05

[ moleculetype ]
  ARG 1

[ atoms ]
  1 AR 1 ARG AR 1 0.0 39.95

[ moleculetype ]
  KRG 1

[ atoms ]
  1 KR 1 KRG KR 1 0.0 83.80

[ system ]
noble gases

[ molecules ]
ARG 2
KRG 1
"""


def test_comb_rule1_c6c12_and_override(tmp_path):
    top = write(tmp_path / "gases.top", GROMOS_TOP)
    mol = Molecule(top)
    assert mol.numAtoms == 3
    coords = np.array([
        [0.0, 0.0, 0.0], [3.9, 0.0, 0.0], [1.9, 3.3, 0.0],
    ])
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["lj"], precision="double")
    assert getattr(par, "lj_ab_tables", None) is not None
    forces = Forces(par, terms=["lj"], precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    c6conv = KJ2KCAL * 10.0**6
    c12conv = KJ2KCAL * 10.0**12

    def lj(c6, c12, r):
        return c12 * c12conv / r**12 - c6 * c6conv / r**6

    r01 = np.linalg.norm(coords[0] - coords[1])
    r02 = np.linalg.norm(coords[0] - coords[2])
    r12 = np.linalg.norm(coords[1] - coords[2])
    e = lj(6.2647e-03, 9.8470e-06, r01)       # AR-AR geometric = same type
    e += lj(8.0e-03, 1.8e-05, r02)            # AR-KR override
    e += lj(8.0e-03, 1.8e-05, r12)
    assert pots["lj"] == pytest.approx(e, rel=1e-9)


UB_TOP = """
[ defaults ]
  1 2 no 1.0 1.0

[ atomtypes ]
  CA 12.011 0.0 A 0.35 0.3
  HA 1.008  0.0 A 0.25 0.1

[ moleculetype ]
  TRI 3

[ atoms ]
  1 HA 1 TRI H1 1 0.0 1.008
  2 CA 1 TRI C  1 0.0 12.011
  3 HA 1 TRI H2 1 0.0 1.008

[ bonds ]
  1 2 1 0.110 280000.0
  2 3 1 0.110 280000.0

[ angles ]
; i j k funct theta0 k(kJ/rad2) r13(nm) kub(kJ/nm2)
  1 2 3 5 109.0 300.0 0.180 25000.0

[ system ]
ub test

[ molecules ]
TRI 1
"""


def test_urey_bradley_funct5(tmp_path):
    top = write(tmp_path / "ub.top", UB_TOP)
    mol = Molecule(top)
    th = np.radians(104.0)
    b = 1.12
    coords = np.array([
        [b, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [b * np.cos(th), b * np.sin(th), 0.0],
    ])
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "angles", "urey-bradley"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    e_bond = 2 * (280000.0 * KJ2KCAL / 100.0 / 2.0) * (b - 1.10) ** 2
    e_ang = (300.0 * KJ2KCAL / 2.0) * (th - np.radians(109.0)) ** 2
    r13 = np.linalg.norm(coords[0] - coords[2])
    e_ub = (25000.0 * KJ2KCAL / 100.0 / 2.0) * (r13 - 1.80) ** 2
    assert pots["bonds"] == pytest.approx(e_bond, rel=1e-9)
    assert pots["angles"] == pytest.approx(e_ang, rel=1e-9)
    assert pots["urey-bradley"] == pytest.approx(e_ub, rel=1e-9)


WILDCARD_TOP = """
[ defaults ]
  1 2 yes 0.5 0.8333

[ atomtypes ]
  CT  12.011 0.0 A 0.35 0.3
  CM  12.011 0.0 A 0.35 0.3

[ bondtypes ]
  CT CM 1 0.1510 265265.6
  CT CT 1 0.1529 224262.4

[ angletypes ]
  CT CM CT 1 120.0 400.0
  CM CT CM 1 120.0 400.0

[ dihedraltypes ]
  X CT CM X 9 180.0 10.0 2
  X CT CM X 9 0.0 2.0 3

[ moleculetype ]
  WLD 3

[ atoms ]
  1 CM 1 WLD C1 1 0.0 12.011
  2 CT 1 WLD C2 1 0.0 12.011
  3 CM 1 WLD C3 1 0.0 12.011
  4 CT 1 WLD C4 1 0.0 12.011

[ bonds ]
  1 2 1
  2 3 1
  3 4 1

[ angles ]
  1 2 3 1
  2 3 4 1

[ dihedrals ]
  1 2 3 4 9

[ system ]
wildcards

[ molecules ]
WLD 1
"""


def test_wildcard_dihedraltypes_and_bondtype_lookup(tmp_path):
    top = write(tmp_path / "wild.top", WILDCARD_TOP)
    mol = Molecule(top)
    coords = butane_coords(35.0)
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "angles", "dihedrals"],
                     precision="double")
    # two periodic rows from the wildcard multi-term funct 9 entry
    assert par.dihedral_params["params"].shape == (2, 3)
    assert sorted(par.dihedral_params["params"][:, 2]) == [2.0, 3.0]
    # bondtype lookup (no inline params): CT-CM r0 = 1.51 A
    r0 = par.bond_params["params"][
        par.bond_params["map"][:, 1], 1
    ]
    assert set(np.round(r0, 4)) == {1.51}
    forces = Forces(par, terms=["bonds", "angles", "dihedrals"],
                    precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]
    phi = measured_phi(coords)
    e_expected = (
        10.0 * KJ2KCAL * (1 + np.cos(2 * phi - np.pi))
        + 2.0 * KJ2KCAL * (1 + np.cos(3 * phi))
    )
    assert pots["dihedrals"] == pytest.approx(e_expected, rel=1e-9)


def test_preprocessor_include_ifdef(tmp_path):
    inc = write(tmp_path / "types.itp", """
[ atomtypes ]
  AR 39.95 0.0 A 0.34 1.0
""")
    top = write(tmp_path / "sys.top", """
#include "types.itp"
#define MYFLAG

[ defaults ]
  1 2 no 1.0 1.0

[ moleculetype ]
  M 1

[ atoms ]
#ifdef MYFLAG
  1 AR 1 M AR 1 0.5 39.95
#else
  1 AR 1 M AR 1 -0.5 39.95
#endif
#ifndef OTHERFLAG
  2 AR 1 M AR2 1 0.25 39.95
#endif

[ system ]
x

[ molecules ]
M 1
""")
    assert os.path.exists(inc)
    mol = Molecule(top)
    assert mol.numAtoms == 2
    assert mol.charge[0] == pytest.approx(0.5)
    assert mol.charge[1] == pytest.approx(0.25)


def test_molecule_replication_and_exclusions(tmp_path):
    top = write(tmp_path / "mix.top", SPC_TOP)
    mol = Molecule(top)
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "lj", "electrostatics"],
                     precision="double")
    excl = par.get_exclusions()
    # each water: 3 intramolecular pairs; two waters
    assert sorted(map(tuple, excl)) == [
        (0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5),
    ]
    assert list(mol.resid) == [1, 1, 1, 2, 2, 2]
    assert mol.bonds.shape == (6, 2)  # settle triangles as connectivity


def test_gro_read_write_roundtrip(tmp_path):
    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    coords = spc_coords()
    mol.coords = coords[:, :, None]
    mol.box = np.array([[20.0], [20.0], [20.0]])
    gro = str(tmp_path / "out.gro")
    mol.write(gro)

    mol2 = Molecule(top)
    mol2.read(gro)
    assert np.allclose(mol2.coords[:, :, 0], coords, atol=1e-2)
    assert np.allclose(mol2.box[:, 0], [20.0, 20.0, 20.0])
    assert list(mol2.resname[:3]) == ["SOL", "SOL", "SOL"]


def test_gro_velocities_and_triclinic_reject(tmp_path):
    gro = write(tmp_path / "v.gro", """title t= 0.0
    2
    1SOL     OW    1   0.000   0.000   0.000  0.1000  0.2000 -0.3000
    1SOL    HW1    2   0.100   0.000   0.000  0.0000  0.0000  0.0000
   2.00000   2.00000   2.00000
""")
    mol = Molecule()
    mol.read(gro)
    assert mol.velocities is not None
    assert np.allclose(mol.velocities[0], [1.0, 2.0, -3.0])

    bad = write(tmp_path / "tri.gro", """t
    1
    1SOL     OW    1   0.000   0.000   0.000
   2.0 2.0 2.0 0.0 0.0 0.5 0.0 0.0 0.0
""")
    with pytest.raises(ValueError, match="triclinic"):
        Molecule().read(bad)


def test_spc_md_smoke(tmp_path):
    """8 SPC waters in a periodic box: a few Langevin steps run and stay
    finite with the GROMACS-assembled parameters."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    top_text = SPC_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "spc8.top", top_text)
    mol = Molecule(top)
    w = spc_coords()[:3]
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(w + np.array([ix, iy, iz]) * 6.0 + 1.0)
    coords = np.concatenate(pts)
    mol.coords = coords[:, :, None]
    mol.box = np.full((3, 1), 12.0)

    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=5.0,
                    rfa=True)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=7))
    integ = Integrator(syst, forces, timestep=1.0, gamma=0.5, T=300.0,
                       seed=7, constraints="settle")
    ekin, epot, temp = integ.step(niter=5)
    assert np.all(np.isfinite(np.asarray(epot)))
    assert np.all(np.isfinite(np.asarray(syst.pos)))


TIP4P2005_TOP = """
[ defaults ]
  1 2 yes 0.5 0.8333

[ atomtypes ]
  OW  8 15.99940  0.0     A  0.31589  0.7749
  HW  1  1.00800  0.5564  A  0.0      0.0
  MW  0  0.00000 -1.1128  D  0.0      0.0

[ moleculetype ]
  SOL 2

[ atoms ]
  1 OW 1 SOL OW  1  0.0000 15.9994
  2 HW 1 SOL HW1 1  0.5564  1.008
  3 HW 1 SOL HW2 1  0.5564  1.008
  4 MW 1 SOL MW  1 -1.1128  0.000

[ settles ]
  1 1 0.09572 0.15139

[ virtual_sites3 ]
; site i j k funct a b
  4 1 2 3 1 0.13193828 0.13193828

[ exclusions ]
1 2 3 4
2 1 3 4
3 1 2 4
4 1 2 3

[ system ]
tip4p/2005

[ molecules ]
SOL 2
"""


def tip4p_water(origin=(0.0, 0.0, 0.0)):
    """One TIP4P geometry: O, H1, H2 (M row left at zero -- reconstructed)."""
    doh, theta = 0.9572, np.radians(104.52)
    o = np.asarray(origin, dtype=np.float64)
    h1 = o + doh * np.array([np.cos(theta / 2), np.sin(theta / 2), 0.0])
    h2 = o + doh * np.array([np.cos(theta / 2), -np.sin(theta / 2), 0.0])
    return np.stack([o, h1, h2, o])  # M placeholder at O


def tip4p_msite(w):
    a = 0.13193828
    return w[0] + a * (w[1] - w[0]) + a * (w[2] - w[0])


def test_tip4p_vsite_construction(tmp_path):
    from torchmd_tpu.vsites import apply_vsites

    top = write(tmp_path / "tip4p.top", TIP4P2005_TOP)
    mol = Molecule(top)
    assert mol.numAtoms == 8
    assert mol.masses[3] == 0.0 and mol.masses[7] == 0.0
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "lj", "electrostatics"],
                     precision="double")
    assert len(par.vsites) == 1

    w1 = tip4p_water()
    w2 = tip4p_water((3.1, 0.3, 0.1))
    pos = np.concatenate([w1, w2])
    import jax.numpy as jnp

    snapped = np.asarray(apply_vsites(par.vsites, jnp.asarray(pos), None))
    m1 = tip4p_msite(w1)
    assert np.allclose(snapped[3], m1, atol=1e-12)
    # M on the HOH bisector at dOM = 0.1546 A from O
    assert np.linalg.norm(m1 - w1[0]) == pytest.approx(0.1546, abs=2e-4)


def test_tip4p_dimer_energy_and_forces(tmp_path):
    top = write(tmp_path / "tip4p.top", TIP4P2005_TOP)
    mol = Molecule(top)
    w1 = tip4p_water()
    w2 = tip4p_water((3.0, 0.4, 0.2))
    pos = np.concatenate([w1, w2])
    mol.coords = pos[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    frc = np.zeros((1, 8, 3))
    pots = forces.compute(pos[None], None, frc, returnDetails=True)[0]

    # numpy reference with constructed M sites
    full = pos.copy()
    full[3] = tip4p_msite(w1)
    full[7] = tip4p_msite(w2)
    q = np.array([0.0, 0.5564, 0.5564, -1.1128] * 2)
    sig, eps = 3.1589, 0.7749 * KJ2KCAL
    e_lj = 0.0
    e_el = 0.0
    for i in range(4):
        for j in range(4, 8):
            r = np.linalg.norm(full[i] - full[j])
            if i == 0 and j == 4:
                e_lj += 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
            e_el += ELEC_FACTOR * q[i] * q[j] / r
    assert pots["lj"] == pytest.approx(e_lj, rel=1e-9)
    assert pots["electrostatics"] == pytest.approx(e_el, rel=1e-9)

    # site rows carry no force after spreading
    assert np.allclose(frc[0, 3], 0.0, atol=1e-10)
    assert np.allclose(frc[0, 7], 0.0, atol=1e-10)

    # finite-difference force check on a host atom (H1 of water 1) and
    # the O atoms (which receive the spread M-site force)
    def etot(p):
        return sum(
            forces.compute(p[None], None, returnDetails=True)[0].values()
        )

    h = 1e-5
    for atom in (0, 1, 4):
        for k in range(3):
            pp = pos.copy()
            pp[atom, k] += h
            pm = pos.copy()
            pm[atom, k] -= h
            fd = -(etot(pp) - etot(pm)) / (2 * h)
            assert frc[0, atom, k] == pytest.approx(fd, rel=2e-5, abs=1e-7)


def test_tip4p_md_smoke(tmp_path):
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System
    from torchmd_tpu.vsites import apply_vsites

    top = write(tmp_path / "tip4p.top", TIP4P2005_TOP)
    mol = Molecule(top)
    pos = np.concatenate([tip4p_water((1.0, 1.0, 1.0)),
                          tip4p_water((4.0, 1.3, 1.1))])
    mol.coords = pos[:, :, None]
    mol.box = np.full((3, 1), 9.0)
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.0,
                    rfa=True)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    vel = maxwell_boltzmann(par.masses, 300.0, 1, seed=3)
    assert np.allclose(np.asarray(vel)[0, [3, 7]], 0.0)  # massless rows
    syst.set_velocities(vel)
    integ = Integrator(syst, forces, timestep=2.0, gamma=0.5, T=300.0,
                       seed=3, constraints="settle")
    ekin, epot, temp = integ.step(niter=10)
    assert np.all(np.isfinite(np.asarray(epot)))
    assert 0.0 < float(np.asarray(temp).reshape(-1)[0]) < 2000.0
    out = np.asarray(syst.pos)[0]
    # M rows track their construction exactly after the scan
    import jax.numpy as jnp

    snapped = np.asarray(
        apply_vsites(par.vsites, jnp.asarray(out), jnp.asarray([9.0] * 3))
    )
    assert np.allclose(out[3], snapped[3], atol=1e-9)
    assert np.allclose(out[7], snapped[7], atol=1e-9)
    # settle kept the real geometry rigid
    assert np.linalg.norm(out[0] - out[1]) == pytest.approx(0.9572, abs=1e-6)
    assert np.linalg.norm(out[1] - out[2]) == pytest.approx(0.15139 * 10,
                                                            abs=1e-5)


def test_tip4p_nve_energy_conservation(tmp_path):
    """NVE with SETTLE + virtual sites: bounded total-energy drift is the
    sharp end-to-end check of the vjp force spreading (a wrong host
    force heats or cools the system systematically)."""
    from torchmd_tpu.integrator import (
        Integrator,
        kinetic_energy,
        maxwell_boltzmann,
    )
    from torchmd_tpu.systems import System

    top_text = TIP4P2005_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "tip4p8.top", top_text)
    mol = Molecule(top)
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 5.2 + 1.2))
    pos = np.concatenate(pts)
    mol.coords = pos[:, :, None]
    mol.box = np.full((3, 1), 10.4)

    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    switch_dist=3.5, rfa=True)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 150.0, 1, seed=11))
    integ = Integrator(syst, forces, timestep=1.0, gamma=None, T=None,
                       seed=11, constraints="settle")
    etots = []
    for _ in range(10):
        ekin, epot, _ = integ.step(niter=30)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    drift = abs(etots[-1] - etots[0])
    assert np.isfinite(etots[-1]) and drift < 0.5, (drift, etots)
    # KE never counts the massless rows
    ek = kinetic_energy(par.masses, np.asarray(syst.vel))
    assert np.isfinite(float(np.asarray(ek).reshape(-1)[0]))


G96_TOP = """
[ defaults ]
  1 1 no 1.0 1.0

[ atomtypes ]
  CG  6 12.011 0.0 A 0.0 0.0

[ moleculetype ]
  TRI 3

[ atoms ]
  1 CG 1 TRI C1 1 0.0 12.011
  2 CG 1 TRI C2 1 0.0 12.011
  3 CG 1 TRI C3 1 0.0 12.011

[ bonds ]
; i j funct b0(nm) kb(kJ/mol/nm^4)
  1 2 2 0.153 7.15e6
  2 3 2 0.153 7.15e6

[ angles ]
; i j k funct th0(deg) k(kJ/mol)
  1 2 3 2 111.0 530.0

[ system ]
g96 triatomic

[ molecules ]
TRI 1
"""


def test_g96_quartic_bond_cosine_angle(tmp_path):
    """GROMOS-96 bonded forms (bond/angle funct 2): energies match the
    hand-evaluated GROMACS formulas in both the hot path
    (Forces.compute) and the pure-AD path, and forces agree between
    them (the hot path folds g96 terms in via a CMAP-style AD rider)."""
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.potentials import compute_potentials

    top = write(tmp_path / "g96.top", G96_TOP)
    mol = Molecule(top)
    pos = np.array([[0.0, 0.0, 0.0],
                    [1.57, 0.0, 0.0],
                    [2.2, 1.4, 0.1]])
    mol.coords = pos[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "angles"]
    par = Parameters(ff, mol, terms, precision="double")
    assert par.bond_g96_params is not None
    assert par.angle_g96_params is not None
    assert par.bond_params is None

    forces = Forces(par, terms=terms, precision="double")
    frc = np.zeros((1, 3, 3))
    pots = forces.compute(pos[None], None, frc, returnDetails=True)[0]

    # GROMACS formulas, hand-evaluated in kJ/nm then converted
    kb, b0, ka, th0 = 7.15e6, 0.153, 530.0, np.radians(111.0)
    e_bond = 0.0
    for i, j in ((0, 1), (1, 2)):
        r = np.linalg.norm(pos[i] - pos[j]) / 10.0  # nm
        e_bond += 0.25 * kb * (r * r - b0 * b0) ** 2
    v1 = pos[0] - pos[1]
    v2 = pos[2] - pos[1]
    cth = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    e_ang = 0.5 * ka * (cth - np.cos(th0)) ** 2
    assert pots["bonds"] == pytest.approx(e_bond * KJ2KCAL, rel=1e-9)
    assert pots["angles"] == pytest.approx(e_ang * KJ2KCAL, rel=1e-9)

    # pure-AD path agrees with the hot path (energy and forces)
    ffp, cfg = forces.ffparams, forces.config
    pot_ad = compute_potentials(ffp, jnp.asarray(pos), None, cfg)
    assert float(pot_ad["bonds"]) == pytest.approx(pots["bonds"], rel=1e-12)
    assert float(pot_ad["angles"]) == pytest.approx(pots["angles"],
                                                    rel=1e-12)
    g = jax.grad(
        lambda p: sum(
            jax.tree_util.tree_leaves(compute_potentials(ffp, p, None, cfg))
        )
    )(jnp.asarray(pos))
    np.testing.assert_allclose(frc[0], -np.asarray(g), atol=1e-10)
    # funct-2 bonds create chemical connectivity (1-2/1-3 exclusions)
    assert (0, 1) in par.explicit_exclusions or (0, 2) in [
        tuple(sorted(p)) for p in par.explicit_exclusions
    ]


def test_vsite4_fdn_construction():
    """[virtual_sites4] funct 2 (4fdn): the site sits at distance c along
    the normal of the plane spanned by (a r_ik - r_ij, b r_il - r_ij)."""
    import jax.numpy as jnp

    from torchmd_tpu.vsites import apply_vsites, build_vsite_groups

    a, b, c_nm = 0.3, 0.4, 0.105
    groups = build_vsite_groups([
        ((4, 0, 1, 2, 3), 4, 2, [a, b, c_nm]),
    ])
    assert groups[0].kind == (4, 2)
    assert groups[0].hosts.shape == (1, 4)
    pos = np.array([[0.2, 0.1, 0.0],     # i
                    [1.3, 0.0, 0.2],     # j
                    [0.1, 1.2, -0.1],    # k
                    [-0.2, 0.3, 1.4],    # l
                    [0.0, 0.0, 0.0]])    # site placeholder
    out = np.asarray(apply_vsites(groups, jnp.asarray(pos), None))
    ri = pos[0]
    rij, rik, ril = pos[1] - ri, pos[2] - ri, pos[3] - ri
    rm = np.cross(a * rik - rij, b * ril - rij)
    expected = ri + 10.0 * c_nm * rm / np.linalg.norm(rm)
    np.testing.assert_allclose(out[4], expected, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(out[4] - ri), 1.05,
                               atol=1e-12)


def _tip4p_box8(tmp_path):
    top_text = TIP4P2005_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "tip4p8.top", top_text)
    mol = Molecule(top)
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 5.2 + 1.2))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 10.4)
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    switch_dist=3.5, rfa=True)
    return mol, par, forces


def test_tip4p_mtk_virial_matches_finite_difference(tmp_path):
    """Per-axis scaling virial with virtual sites: sites reconstruct from
    the SCALED hosts but their internal offsets (fixed A lengths) do not
    scale with the box — the AD dU/ds must equal the numeric derivative
    of the energy evaluated at snapped geometry."""
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.potentials import compute_potentials
    from torchmd_tpu.vsites import apply_vsites

    mol, par, forces, = _tip4p_box8(tmp_path)
    ffp, cfg = forces.ffparams, forces.config
    pos = jnp.asarray(mol.coords[:, :, 0])
    box = jnp.asarray([10.4, 10.4, 10.4])

    def etot(p, s):
        p2 = apply_vsites(par.vsites, p * s, box * s)
        pot = compute_potentials(ffp, p2, box * s, cfg)
        return sum(jax.tree_util.tree_leaves(pot))

    one = jnp.ones((3,))
    vir_ad = -jax.grad(etot, argnums=1)(pos, one)
    h = 1e-6
    for k in range(3):
        sp = np.ones(3); sp[k] += h
        sm = np.ones(3); sm[k] -= h
        fd = -(float(etot(pos, jnp.asarray(sp)))
               - float(etot(pos, jnp.asarray(sm)))) / (2 * h)
        np.testing.assert_allclose(float(vir_ad[k]), fd, rtol=1e-5,
                                   atol=1e-8)
    # the site rows carry no direct force (they are overwritten by the
    # reconstruction): grad wrt pos must vanish there
    gp = jax.grad(etot, argnums=0)(pos, one)
    site_rows = np.arange(3, mol.numAtoms, 4)
    np.testing.assert_allclose(np.asarray(gp)[site_rows], 0.0, atol=1e-12)


def test_tip4p_mtk_settle_npt(tmp_path):
    """True NPT of TIP4P water: MTK barostat + SETTLE + virtual sites all
    compose in one compiled scan. Checks sites stay snapped, constraints
    hold through the barostat-scaled drift, the conserved quantity is
    bounded, and the box stays liquid-like."""
    import jax.numpy as jnp

    from torchmd_tpu.barostat import MTKBarostat
    from torchmd_tpu.constraints import build_constraint_spec
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System
    from torchmd_tpu.vsites import apply_vsites

    mol, par, forces = _tip4p_box8(tmp_path)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=5))
    integ = Integrator(syst, forces, timestep=2.0, T=300.0,
                       thermostat="nhc", constraints="settle",
                       barostat=MTKBarostat(1.0, 300.0, tau_fs=1000.0),
                       seed=5)
    v0 = float(np.prod(np.asarray(syst.box_diag)[0]))
    hs = []
    for _ in range(4):
        ek, ep, T = integ.step(niter=25)
        hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                  + integ.npt_energy()[0])
    assert np.all(np.isfinite(np.asarray(syst.pos)))
    box = np.asarray(syst.box_diag)[0]
    pos = np.asarray(syst.pos)[0]
    # sites track their construction after the scan (box changed!)
    snapped = np.asarray(
        apply_vsites(par.vsites, jnp.asarray(pos), jnp.asarray(box))
    )
    site_rows = np.arange(3, mol.numAtoms, 4)
    np.testing.assert_allclose(pos[site_rows], snapped[site_rows],
                               atol=1e-9)
    # SETTLE held through the barostat drift
    cs = build_constraint_spec(par, np.asarray(par.masses), mode="settle")
    d_oh1 = np.linalg.norm(pos[cs.settle.oidx] - pos[cs.settle.h1], axis=1)
    np.testing.assert_allclose(d_oh1, np.asarray(cs.settle.r_oh),
                               atol=1e-8)
    # box stayed liquid-like and the conserved quantity is bounded
    v1 = float(np.prod(box))
    assert 0.5 * v0 < v1 < 2.0 * v0
    drift = abs(hs[-1] - hs[0])
    assert drift < 5.0, f"MTK+SETTLE+vsites drifted {drift}: {hs}"


def _tip4p_box216(tmp_path):
    """6x6x6 TIP4P lattice at 3.25 A spacing (19.5 A box, near liquid
    density): large enough to host a cell grid at a 4.0 A cutoff
    (rc = 6.0 with the default skin), dense enough that LJ repulsion is
    active and a short NPT run stays tame."""
    top_text = TIP4P2005_TOP.replace("SOL 2", "SOL 216")
    top = write(tmp_path / "tip4p216.top", top_text)
    mol = Molecule(top)
    pts = []
    for ix in range(6):
        for iy in range(6):
            for iz in range(6):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 3.25 + 0.9))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 19.5)
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    return mol, par, terms


def test_tip4p_mtk_cell_matches_dense(tmp_path):
    """Virtual sites + SETTLE + MTK NPT on the cell-kernel path: the
    kernel's analytic pair virial is vjp-spread onto the hosts and
    jvp-corrected for the non-scaling site offsets; the trajectory,
    box and conserved quantity must match the dense NPT scan (whose
    E(s*pos, s*box) AD handles sites exactly) to f64 round-off."""
    from torchmd_tpu.barostat import MTKBarostat
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, terms = _tip4p_box216(tmp_path)

    def run(kernel):
        forces = Forces(par, terms=terms, precision="double", cutoff=4.0,
                        switch_dist=3.2, rfa=True, kernel=kernel)
        syst = System(mol.numAtoms, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=5)
        )
        forces.compute(syst.pos, syst.box, syst.forces)
        integ = Integrator(syst, forces, timestep=2.0, T=300.0,
                           thermostat="nhc", constraints="settle",
                           barostat=MTKBarostat(1.0, 300.0,
                                                tau_fs=1000.0),
                           seed=5)
        hs = []
        for _ in range(2):
            ek, ep, _T = integ.step(niter=15)
            hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                      + integ.npt_energy()[0])
        return (syst.pos.copy(), syst.box_diag.copy(), hs,
                getattr(integ, "_cell_kernel", None))

    pos_d, box_d, hs_d, k_d = run("auto")
    pos_c, box_c, hs_c, k_c = run("cell")
    assert k_d is None and k_c is not None
    np.testing.assert_allclose(box_c, box_d, rtol=1e-9)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-6)
    np.testing.assert_allclose(hs_c, hs_d, atol=1e-6)
    # sites stayed snapped through the kernel-path NPT scan
    import jax.numpy as jnp

    from torchmd_tpu.vsites import apply_vsites

    pos = pos_c[0]
    snapped = np.asarray(apply_vsites(
        par.vsites, jnp.asarray(pos), jnp.asarray(box_c[0])
    ))
    site_rows = np.arange(3, mol.numAtoms, 4)
    np.testing.assert_allclose(pos[site_rows], snapped[site_rows],
                               atol=1e-9)


def test_tip4p_production_config_cell_matches_dense(tmp_path):
    """The production water-box configuration, downsampled: TIP4P vsites
    + SETTLE + Ewald electrostatics + NHC on the cell-kernel scan must
    match the dense f64 path step for step (the correctness anchor for
    the 62k-atom TPU run in scripts/bench_waterbox.py)."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, terms = _tip4p_box216(tmp_path)

    def run(kernel):
        forces = Forces(par, terms=terms, precision="double", cutoff=4.0,
                        kernel=kernel, elec="ewald")
        syst = System(mol.numAtoms, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=9)
        )
        integ = Integrator(syst, forces, timestep=2.0, T=300.0,
                           thermostat="nhc", constraints="settle",
                           seed=9)
        es = []
        for _ in range(2):
            _ek, ep, _T = integ.step(niter=15)
            es.append(ep[0])
        return (syst.pos.copy(), np.asarray(es),
                getattr(integ, "_cell_kernel", None))

    pos_d, e_d, k_d = run("auto")
    pos_c, e_c, k_c = run("cell")
    assert k_d is None and k_c is not None
    np.testing.assert_allclose(e_c, e_d, rtol=1e-9)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-6)


def test_tip4p_production_config_column_matches_cell(tmp_path):
    """Same production configuration through the z-sorted COLUMN kernel
    (the TPU large-N default, interpret mode on CPU) vs the ghost-cell
    kernel at f32: the exclusion-aware Pallas column path must carry the
    full vsites + SETTLE + Ewald composition."""
    from torchmd_tpu.columns import ColumnKernel
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, par, terms = _tip4p_box216(tmp_path)
    vel = maxwell_boltzmann(
        np.asarray(par.masses, np.float64), 300.0, 1, seed=9
    )

    def run(column):
        forces = Forces(par, terms=terms, precision="single", cutoff=4.0,
                        kernel="cell", elec="ewald")
        syst = System(mol.numAtoms, 1, "single")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(vel)
        if column:
            forces._cell_kernel = ColumnKernel(
                forces.ffparams, forces.config, par,
                np.full(3, 19.5), pos0=mol.coords[:, :, 0],
                interpret=True)
            forces.cell_requested = True
        integ = Integrator(syst, forces, timestep=2.0, T=300.0,
                           thermostat="nhc", constraints="settle",
                           seed=9)
        es = []
        for _ in range(2):
            _ek, ep, _T = integ.step(niter=10)
            es.append(ep[0])
        return syst.pos.copy(), np.asarray(es)

    pos_c, e_c = run(False)
    pos_q, e_q = run(True)
    np.testing.assert_allclose(e_q, e_c, rtol=2e-4)
    np.testing.assert_allclose(pos_q, pos_c, atol=5e-3)


def test_run_cli_gromacs(tmp_path):
    """run.py end to end from .top + .gro (the GROMACS user workflow)."""
    from torchmd_tpu import run as runmod

    top_text = SPC_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "spc8.top", top_text)
    mol = Molecule(top)
    w = spc_coords()[:3]
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(w + np.array([ix, iy, iz]) * 6.0 + 1.0)
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 12.0)
    gro = str(tmp_path / "conf.gro")
    mol.write(gro)

    logdir = tmp_path / "out"
    args = runmod.get_args([
        "--topology", top,
        "--coordinates", gro,
        "--forcefield", top,
        "--forceterms", "bonds", "lj", "electrostatics",
        "--cutoff", "5.0", "--rfa",
        "--precision", "double",
        "--steps", "20", "--output-period", "10", "--save-period", "20",
        "--temperature", "300", "--langevin-temperature", "300",
        "--langevin-gamma", "1.0",
        "--constraints", "settle",
        "--log-dir", str(logdir),
        "--device", "cpu",
    ])
    mol2, system, forces = runmod.setup(args)
    assert np.allclose(np.asarray(system.box_diag)[0], 12.0)
    runmod.dynamics(args, mol2, system, forces)
    assert os.path.exists(logdir / "monitor_0.csv")
    traj = np.load(logdir / "output_0.npy")
    assert traj.shape[0] == 24
    rows = open(logdir / "monitor_0.csv").read().strip().splitlines()
    assert len(rows) >= 2 and np.isfinite(float(rows[-1].split(",")[2]))


MARTINI_TOP = """
[ defaults ]
; Martini 2.x: LJ in C6/C12 form, no gen-pairs
  1 1 no 1.0 1.0

[ atomtypes ]
; name mass charge ptype C6 C12
  P4   72.0 0.0    A     0.21558E-00  0.23238E-02
  C1   72.0 0.0    A     0.14805E-00  0.16944E-02

[ nonbond_params ]
  P4 C1 1 0.10620E-00 0.12156E-02

[ moleculetype ]
  W 1

[ atoms ]
  1 P4 1 W W 1 0.0 72.0

[ moleculetype ]
  HEX 1

[ atoms ]
  1 C1 1 HEX C1A 1 0.0 72.0
  2 C1 1 HEX C1B 2 0.0 72.0

[ bonds ]
  1 2 1 0.480 1250.0

[ system ]
martini droplet

[ molecules ]
W 2
HEX 1
"""


def test_martini_cg(tmp_path):
    """Martini-style coarse-grained topology: C6/C12 types, cross-type
    [nonbond_params] override, CG bead bond -- vs numpy."""
    top = write(tmp_path / "martini.top", MARTINI_TOP)
    mol = Molecule(top)
    assert mol.numAtoms == 4
    coords = np.array([
        [0.0, 0.0, 0.0],
        [5.3, 0.0, 0.0],
        [2.5, 4.6, 0.0],
        [2.5, 4.6, 4.9],
    ])
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    c6conv = KJ2KCAL * 1e6
    c12conv = KJ2KCAL * 1e12

    def lj(c6, c12, r):
        return c12 * c12conv / r**12 - c6 * c6conv / r**6

    P4 = (0.21558, 0.23238e-02)
    C1 = (0.14805, 0.16944e-02)
    X = (0.10620, 0.12156e-02)

    def r(i, j):
        return np.linalg.norm(coords[i] - coords[j])

    e = lj(*P4, r(0, 1))                      # W-W
    e += lj(*X, r(0, 2)) + lj(*X, r(0, 3))    # W-HEX override
    e += lj(*X, r(1, 2)) + lj(*X, r(1, 3))
    # bead 2-3 bonded (excluded from LJ by nrexcl=1)
    assert pots["lj"] == pytest.approx(e, rel=1e-9)
    e_bond = (1250.0 * KJ2KCAL / 100.0 / 2.0) * (r(2, 3) - 4.80) ** 2
    assert pots["bonds"] == pytest.approx(e_bond, rel=1e-9)


POSRES_TOP = """
[ defaults ]
  1 2 no 1.0 1.0

[ atomtypes ]
  AR 39.95 0.0 A 0.34 1.0

[ moleculetype ]
  M 1

[ atoms ]
  1 AR 1 M AR 1 0.0 39.95
  2 AR 1 M AR2 1 0.0 39.95

#ifdef POSRES
[ position_restraints ]
; atom funct kx ky kz (kJ/mol/nm^2)
  1    1     1000.0 500.0 0.0
#endif

[ system ]
posres

[ molecules ]
M 2
"""


def test_position_restraints(tmp_path, monkeypatch):
    from torchmd_tpu.restraints import make_gromacs_posres

    top = write(tmp_path / "posres.top", POSRES_TOP)

    # without the define: records absent
    mol = Molecule(top)
    ff = GromacsForcefield(mol, top, defines={})
    par = Parameters(ff, mol, ["lj"], precision="double")
    assert par.gmx_posres == []
    assert make_gromacs_posres(par, mol.coords[:, :, 0]) is None

    # with POSRES via the env var (the CLI path)
    monkeypatch.setenv("TMD_GMX_DEFINES", "POSRES")
    mol2 = Molecule(top)
    ff2 = ForceField.create(mol2, top)
    par2 = Parameters(ff2, mol2, ["lj"], precision="double")
    # one record per molecule instance
    assert [r[0] for r in par2.gmx_posres] == [0, 2]

    ref = np.array([
        [1.0, 2.0, 3.0], [8.0, 2.0, 3.0],
        [1.0, 6.0, 3.0], [8.0, 6.0, 3.0],
    ])
    pr = make_gromacs_posres(par2, ref)
    moved = ref.copy()
    moved[0] += [0.3, -0.2, 0.7]   # restrained: x,y count, z free
    moved[1] += [1.0, 1.0, 1.0]    # unrestrained atom
    moved[2] += [0.0, 0.5, 0.0]    # restrained
    e = float(pr.energy_fn(moved, None))
    kx = 1000.0 * KJ2KCAL / 100.0 / 2.0
    ky = 500.0 * KJ2KCAL / 100.0 / 2.0
    expected = kx * 0.3**2 + ky * 0.2**2 + ky * 0.5**2
    assert e == pytest.approx(expected, rel=1e-9)

    # forces flow through the Forces external slot (bonds-only term set:
    # the restraint is the sole contribution)
    forces = Forces(par2, terms=["bonds"], precision="double", external=pr)
    frc = np.zeros((1, 4, 3))
    pots = forces.compute(moved[None], None, frc, returnDetails=True)[0]
    assert pots["external"] == pytest.approx(expected, rel=1e-6)
    assert frc[0, 0, 0] == pytest.approx(-2 * kx * 0.3, rel=1e-5)
    assert frc[0, 0, 2] == pytest.approx(0.0, abs=1e-10)


MDP_TEXT = """
; production run
integrator               = sd
dt                       = 0.002  ; 2 fs
nsteps                   = 40
nstenergy                = 10
nstxout-compressed       = 20
rvdw                     = 0.5
rcoulomb                 = 0.5
vdw-modifier             = potential-switch
rvdw-switch              = 0.4
coulombtype              = Reaction-Field
epsilon-rf               = 62.0
ref_t                    = 310 310
tau_t                    = 2.0 2.0
gen-vel                  = yes
gen-temp                 = 300
constraints              = h-bonds
ld-seed                  = 42
"""


def test_mdp_translation():
    from torchmd_tpu.io.mdp import mdp_to_args, read_mdp

    mdp = read_mdp(MDP_TEXT, is_text=True)
    args = mdp_to_args(mdp, warn=lambda *a: None)
    assert args["timestep"] == pytest.approx(2.0)
    assert args["steps"] == 40
    assert args["output_period"] == 10
    assert args["save_period"] == 20
    assert args["cutoff"] == pytest.approx(5.0)
    assert args["switch_dist"] == pytest.approx(4.0)
    assert args["rfa"] is True
    assert args["solvent_dielectric"] == pytest.approx(62.0)
    assert args["thermostat"] == "langevin"
    assert args["langevin_temperature"] == pytest.approx(310.0)
    assert args["langevin_gamma"] == pytest.approx(0.5)  # 1/tau_t
    assert args["temperature"] == pytest.approx(300.0)
    assert args["constraints"] == "settle"
    assert args["seed"] == 42


def test_mdp_variants(monkeypatch):
    from torchmd_tpu.io.mdp import mdp_to_args, read_mdp

    args = mdp_to_args(read_mdp("""
integrator = md
tcoupl     = v-rescale
ref-t      = 300
tau-t      = 1.0
coulombtype = PME
pcoupl     = Parrinello-Rahman
ref-p      = 1.0
define     = -DPOSRES -DFLEXIBLE
""", is_text=True), warn=lambda *a: None)
    assert args["thermostat"] == "csvr"
    assert args["thermostat_tau"] == pytest.approx(1000.0)
    assert args["elec"] == "pme"
    assert args["pressure"] == pytest.approx(1.0)
    assert args["barostat_mode"] == "mtk"
    # defines are carried on the namespace, not leaked into the env
    assert args["gmx_defines"] == ["POSRES", "FLEXIBLE"]
    assert "TMD_GMX_DEFINES" not in os.environ

    em = mdp_to_args(read_mdp("""
integrator = steep
nsteps     = 500
""", is_text=True), warn=lambda *a: None)
    assert em["minimize"] == 500 and em["steps"] == 0


def test_run_cli_full_gromacs_triple(tmp_path):
    """The complete GROMACS workflow: .mdp + .top + .gro through the CLI."""
    from torchmd_tpu import run as runmod

    top_text = SPC_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "topol.top", top_text)
    mol = Molecule(top)
    w = spc_coords()[:3]
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(w + np.array([ix, iy, iz]) * 6.0 + 1.0)
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 12.0)
    gro = str(tmp_path / "conf.gro")
    mol.write(gro)
    mdp = write(tmp_path / "md.mdp", MDP_TEXT)

    logdir = tmp_path / "out"
    args = runmod.get_args([
        "--conf", mdp,
        "--topology", top,
        "--coordinates", gro,
        "--forcefield", top,
        "--forceterms", "bonds", "lj", "electrostatics",
        "--precision", "double",
        "--log-dir", str(logdir),
        "--device", "cpu",
    ])
    assert args.timestep == pytest.approx(2.0)
    assert args.constraints == "settle"
    mol2, system, forces = runmod.setup(args)
    assert forces.solventDielectric == pytest.approx(62.0)
    runmod.dynamics(args, mol2, system, forces)
    rows = open(logdir / "monitor_0.csv").read().strip().splitlines()
    assert len(rows) >= 2 and np.isfinite(float(rows[-1].split(",")[2]))


def test_trr_roundtrip(tmp_path):
    from torchmd_tpu.io.trr import read_trr, write_trr

    rs = np.random.RandomState(5)
    coords = rs.rand(7, 3, 4) * 20.0
    vels = rs.randn(7, 3, 4)
    frcs = rs.randn(7, 3, 4)
    box = np.tile(np.array([20.0, 18.0, 16.0])[:, None], (1, 4))
    f = str(tmp_path / "t.trr")
    write_trr(f, coords, box, velocities=vels, forces=frcs,
              timestep_ps=0.002, double=True)
    d = read_trr(f)
    assert d["coords"].shape == (7, 3, 4)
    assert np.allclose(d["coords"], coords, atol=1e-9)
    assert np.allclose(d["box"], box, atol=1e-9)
    assert np.allclose(d["velocities"], vels, atol=1e-9)
    assert np.allclose(d["forces"], frcs, atol=1e-9)
    assert list(d["step"]) == [0, 1, 2, 3]
    assert d["time"][1] == pytest.approx(0.002)

    # f32 roundtrip + header bytes are the canonical XDR layout
    f2 = str(tmp_path / "t32.trr")
    write_trr(f2, coords, box)
    d2 = read_trr(f2)
    assert np.allclose(d2["coords"], coords, atol=1e-3)
    assert d2["velocities"] is None
    import struct

    raw = open(f2, "rb").read()
    assert struct.unpack_from(">i", raw, 0)[0] == 1993
    assert struct.unpack_from(">i", raw, 4)[0] == 13  # len("GMX_trn_file")+1
    assert raw[8:20] == b"GMX_trn_file"


def test_trr_molecule_dispatch(tmp_path):
    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    coords = spc_coords()
    mol.coords = coords[:, :, None]
    mol.box = np.full((3, 1), 15.0)
    trr = str(tmp_path / "out.trr")
    mol.write(trr)
    mol2 = Molecule(top)
    mol2.read(trr)
    assert np.allclose(mol2.coords[:, :, 0], coords, atol=1e-3)
    assert np.allclose(mol2.box[:, 0], 15.0)


def test_tip4p_ewald_forces(tmp_path):
    """Virtual sites + full Ewald: the reciprocal sum sees the snapped M
    charges and its forces spread back to hosts (finite differences)."""
    top = write(tmp_path / "tip4p.top", TIP4P2005_TOP)
    mol = Molecule(top)
    pos = np.concatenate([tip4p_water((2.0, 2.0, 2.0)),
                          tip4p_water((5.2, 2.3, 2.1))])
    mol.coords = pos[:, :, None]
    box = np.array([10.0, 10.0, 10.0])
    mol.box = box[:, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    elec="ewald")
    frc = np.zeros((1, 8, 3))
    forces.compute(pos[None], box[None], frc)
    assert np.allclose(frc[0, 3], 0.0, atol=1e-9)  # site rows spread away

    def etot(p):
        return sum(
            forces.compute(p[None], box[None], returnDetails=True)[0]
            .values()
        )

    h = 1e-5
    for atom in (0, 2):
        for k in range(3):
            pp = pos.copy()
            pp[atom, k] += h
            pm = pos.copy()
            pm[atom, k] -= h
            fd = -(etot(pp) - etot(pm)) / (2 * h)
            assert frc[0, atom, k] == pytest.approx(fd, rel=3e-5, abs=1e-6)


def test_tip4p_mc_barostat_smoke(tmp_path):
    """Virtual sites + MC barostat: molecular COM scaling composes with
    site re-snapping (the energies behind accept/reject see snapped
    geometry through the wrapped evaluator)."""
    from torchmd_tpu.barostat import MonteCarloBarostat
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System
    from torchmd_tpu.wrapper import Wrapper

    top_text = TIP4P2005_TOP.replace("SOL 2", "SOL 8")
    top = write(tmp_path / "tip4p8.top", top_text)
    mol = Molecule(top)
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 5.2 + 1.2))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 10.4)

    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    switch_dist=3.5, rfa=True)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=2))
    integ = Integrator(syst, forces, timestep=1.0, gamma=1.0, T=300.0,
                       seed=2, constraints="settle")
    wrap = Wrapper(mol.numAtoms, mol.bonds)
    baro = MonteCarloBarostat(1.0, 300.0, group_id=wrap.group_id, seed=3)
    v0 = float(np.prod(np.asarray(syst.box_diag)[0]))
    moved = 0
    for _ in range(8):
        integ.step(niter=5)
        if baro.attempt(syst, forces):
            moved += 1
    v1 = float(np.prod(np.asarray(syst.box_diag)[0]))
    assert np.isfinite(v1) and v1 > 0
    out = np.asarray(syst.pos)[0]
    assert np.all(np.isfinite(out))


DISRES_TOP = """
[ defaults ]
  1 2 no 1.0 1.0

[ atomtypes ]
  AR 39.95 0.0 A 0.34 1.0

[ moleculetype ]
  M 1

[ atoms ]
  1 AR 1 M A1 1 0.0 39.95
  2 AR 1 M A2 1 0.0 39.95
  3 AR 1 M A3 1 0.0 39.95
  4 AR 1 M A4 1 0.0 39.95

[ distance_restraints ]
; ai aj type label low up1 up2 fac
  1  2  1    0     0.30 0.40 0.50 1.0
  3  4  1    1     0.30 0.40 0.50 2.0

[ dihedral_restraints ]
; ai aj ak al funct phi0 dphi kfac(kJ/rad^2)
  1  2  3  4  1     30.0 10.0 100.0

[ system ]
restraints

[ molecules ]
M 1
"""


def test_distance_dihedral_restraints(tmp_path):
    from torchmd_tpu.restraints import (
        make_gromacs_dihres,
        make_gromacs_distres,
    )

    top = write(tmp_path / "res.top", DISRES_TOP)
    mol = Molecule(top)
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["lj"], precision="double")
    assert len(par.gmx_distres) == 2
    assert len(par.gmx_dihres) == 1

    fc = 1000.0  # kJ/mol/nm^2
    dr = make_gromacs_distres(par, fc_kj_nm2=fc)
    k1 = 1.0 * fc * KJ2KCAL / 100.0
    k2 = 2.0 * fc * KJ2KCAL / 100.0

    # distances: pair (0,1) at 4.6 A (harmonic zone above up1=4.0),
    # pair (2,3) at 6.0 A (linear zone beyond up2=5.0)
    pos = np.array([
        [0.0, 0.0, 0.0], [4.6, 0.0, 0.0],
        [0.0, 3.0, 0.0], [6.0, 3.0, 0.0],
    ])
    e = float(dr.energy_fn(pos, None))
    e_mid = 0.5 * k1 * (4.6 - 4.0) ** 2
    e_lin = 0.5 * k2 * (5.0 - 4.0) * (2 * 6.0 - 5.0 - 4.0)
    assert e == pytest.approx(e_mid + e_lin, rel=1e-9)

    # inside the flat window: zero
    pos2 = pos.copy()
    pos2[1, 0] = 3.5
    pos2[3, 0] = 3.4
    assert float(dr.energy_fn(pos2, None)) == pytest.approx(0.0, abs=1e-12)
    # below low: harmonic toward low
    pos3 = pos.copy()
    pos3[1, 0] = 2.0
    pos3[3, 0] = 3.4
    assert float(dr.energy_fn(pos3, None)) == pytest.approx(
        0.5 * k1 * (3.0 - 2.0) ** 2, rel=1e-9
    )

    # dihedral: chain at phi, restrained to 30 +- 10 deg, k=100 kJ/rad^2
    dh = make_gromacs_dihres(par)
    coords = butane_coords(75.0)
    phi = measured_phi(coords)
    over = abs(np.degrees(phi) - 30.0) - 10.0
    expected = 0.5 * 100.0 * KJ2KCAL * np.radians(over) ** 2
    assert float(dh.energy_fn(coords, None)) == pytest.approx(
        expected, rel=1e-8
    )
    coords_in = butane_coords(33.0)  # within the flat window
    assert float(dh.energy_fn(coords_in, None)) == pytest.approx(
        0.0, abs=1e-12
    )


def test_gro_velocity_continuation(tmp_path):
    """gen-vel = no + .gro velocities: the run continues with the file's
    velocities (A/ps -> internal AKMA units), GROMACS semantics."""
    from torchmd_tpu import run as runmod
    from torchmd_tpu.units import TIMEFACTOR

    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    coords = spc_coords()
    mol.coords = coords[:, :, None]
    mol.box = np.full((3, 1), 20.0)
    # hand-write a .gro with velocities
    lines = ["with velocities", "6"]
    vels = np.round(np.random.RandomState(3).randn(6, 3) * 0.3, 4)
    for i in range(6):
        x, y, z = coords[i] / 10.0
        vx, vy, vz = vels[i]
        lines.append(
            f"{1 + i // 3:5d}{'SOL':<5s}{'AT':>5s}{i + 1:5d}"
            f"{x:8.3f}{y:8.3f}{z:8.3f}{vx:8.4f}{vy:8.4f}{vz:8.4f}"
        )
    lines.append("   2.00000   2.00000   2.00000")
    gro = write(tmp_path / "c.gro", "\n".join(lines) + "\n")
    mdp = write(tmp_path / "md.mdp", """
integrator = md
dt = 0.001
nsteps = 10
gen-vel = no
""")
    args = runmod.get_args([
        "--conf", mdp, "--topology", top, "--coordinates", gro,
        "--forcefield", top,
        "--forceterms", "bonds", "lj", "electrostatics",
        "--precision", "double", "--device", "cpu",
        "--log-dir", str(tmp_path / "out"),
    ])
    assert args.use_file_velocities is True
    mol2, system, forces = runmod.setup(args)
    expected = vels * 10.0 * (TIMEFACTOR / 1000.0)  # nm/ps->A/ps->internal
    assert np.allclose(np.asarray(system.vel)[0], expected, atol=1e-9)


def test_gen_pairs_comb_rule1(tmp_path):
    """gen-pairs under comb-rule 1 combines C6/C12 geometrically (not
    sigma arithmetically) and scales both by fudgeLJ."""
    top = write(tmp_path / "g1.top", """
[ defaults ]
  1 1 yes 0.5 1.0

[ atomtypes ]
  A1 10.0 0.1 A 6.0e-03 1.0e-05
  A2 10.0 -0.1 A 9.0e-03 2.5e-05

[ moleculetype ]
  M 2

[ atoms ]
  1 A1 1 M A 1  0.1 10.0
  2 A1 1 M B 1  0.0 10.0
  3 A2 1 M C 1 -0.1 10.0

[ bonds ]
  1 2 1 0.30 1000.0
  2 3 1 0.30 1000.0

[ pairs ]
  1 3 1

[ system ]
g1

[ molecules ]
M 1
""")
    mol = Molecule(top)
    coords = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [5.5, 1.0, 0.0]])
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "dihedrals", "1-4", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]

    r = np.linalg.norm(coords[0] - coords[2])
    c6 = np.sqrt(6.0e-03 * 9.0e-03) * KJ2KCAL * 1e6 * 0.5   # x fudgeLJ
    c12 = np.sqrt(1.0e-05 * 2.5e-05) * KJ2KCAL * 1e12 * 0.5
    e_lj = c12 / r**12 - c6 / r**6
    e_el = 1.0 * ELEC_FACTOR * 0.1 * (-0.1) / r  # fudgeQQ = 1
    assert pots["lj"] == pytest.approx(e_lj, rel=1e-9)
    assert pots["electrostatics"] == pytest.approx(e_el, rel=1e-9)


def test_bond_funct6_does_not_exclude(tmp_path):
    """funct 6 'bonds' are harmonic restraints WITHOUT connectivity: the
    pair keeps its nonbonded interaction and stays out of the molecule
    graph, while the spring energy still applies."""
    top = write(tmp_path / "f6.top", """
[ defaults ]
  1 2 no 1.0 1.0

[ atomtypes ]
  AR 39.95 0.0 A 0.34 1.0

[ moleculetype ]
  M 3

[ atoms ]
  1 AR 1 M A 1 0.2 39.95
  2 AR 1 M B 1 -0.2 39.95

[ bonds ]
  1 2 6 0.40 500.0

[ system ]
f6

[ molecules ]
M 1
""")
    mol = Molecule(top)
    assert mol.bonds.shape == (0, 2)  # no connectivity edge
    coords = np.array([[0.0, 0.0, 0.0], [4.6, 0.0, 0.0]])
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    assert par.get_exclusions() == []  # funct 6 generates no exclusions
    forces = Forces(par, terms=terms, precision="double")
    pots = forces.compute(coords[None], None, returnDetails=True)[0]
    r = 4.6
    sig, eps = 3.4, 1.0 * KJ2KCAL
    e_lj = 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
    e_el = ELEC_FACTOR * 0.2 * (-0.2) / r
    e_bond = (500.0 * KJ2KCAL / 100.0 / 2.0) * (r - 4.0) ** 2
    assert pots["lj"] == pytest.approx(e_lj, rel=1e-9)
    assert pots["electrostatics"] == pytest.approx(e_el, rel=1e-9)
    assert pots["bonds"] == pytest.approx(e_bond, rel=1e-9)


def test_old_two_atom_improper_dihedraltypes(tmp_path):
    """Legacy 2-atom [dihedraltypes] for funct 2 name the OUTER atoms."""
    top = write(tmp_path / "oldimp.top", """
[ defaults ]
  1 2 no 1.0 1.0

[ atomtypes ]
  CA 12.0 0.0 A 0.3 0.3
  CB 12.0 0.0 A 0.3 0.3
  NB 14.0 0.0 A 0.3 0.3
  HX  1.0 0.0 A 0.1 0.1

[ dihedraltypes ]
; outer atoms (i, l) for harmonic impropers
  CA HX 2 35.264 334.72

[ moleculetype ]
  M 1

[ atoms ]
  1 CA 1 M C1 1 0.0 12.0
  2 CB 1 M C2 1 0.0 12.0
  3 NB 1 M N1 1 0.0 14.0
  4 HX 1 M H1 1 0.0 1.0

[ dihedrals ]
  1 2 3 4 2

[ system ]
oldimp

[ molecules ]
M 1
""")
    mol = Molecule(top)
    coords = butane_coords(20.0)
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["impropers"], precision="double")
    # harmonic row: [k/2 conv, xi0, per=0]
    row = par.improper_params["params"][0]
    assert row[2] == 0.0
    assert row[0] == pytest.approx(334.72 * KJ2KCAL / 2.0, rel=1e-9)
    assert row[1] == pytest.approx(np.radians(35.264), rel=1e-9)


def test_ndx_roundtrip_and_groups(tmp_path):
    from torchmd_tpu.io.ndx import read_ndx, write_ndx

    ndx = write(tmp_path / "index.ndx", """
[ Protein ]
1 2 3 4 5
6 7
; a comment
[ SOL ]
8 9 10
[ Protein_LIG ]
1 2 3 11
""")
    g = read_ndx(ndx)
    assert list(g) == ["Protein", "SOL", "Protein_LIG"]
    assert list(g["Protein"]) == [0, 1, 2, 3, 4, 5, 6]
    assert list(g["SOL"]) == [7, 8, 9]

    out = str(tmp_path / "out.ndx")
    write_ndx(out, g)
    g2 = read_ndx(out)
    for k in g:
        assert np.array_equal(g[k], g2[k])


def test_ndx_with_interaction_energies(tmp_path):
    """The energygrps workflow: groups from .ndx feed the decomposition."""
    from torchmd_tpu.analysis import interaction_energies
    from torchmd_tpu.io.ndx import read_ndx

    top = write(tmp_path / "spc.top", SPC_TOP)
    mol = Molecule(top)
    coords = spc_coords()
    mol.coords = coords[:, :, None]
    ff = ForceField.create(mol, top)
    par = Parameters(ff, mol, ["bonds", "lj", "electrostatics"],
                     precision="double")
    forces = Forces(par, terms=["bonds", "lj", "electrostatics"],
                    precision="double")
    ndx = write(tmp_path / "index.ndx", """
[ W1 ]
1 2 3
[ W2 ]
4 5 6
""")
    g = read_ndx(ndx)
    out = interaction_energies(forces, coords, sel_a=g["W1"],
                               sel_b=g["W2"])
    # equals the full intermolecular energy of the 2-water system
    pots = forces.compute(coords[None], None, returnDetails=True)[0]
    assert out["lj"] == pytest.approx(pots["lj"], rel=1e-9)
    assert out["electrostatics"] == pytest.approx(
        pots["electrostatics"], rel=1e-9
    )


def test_mdp_defines_do_not_leak_between_setups(tmp_path, monkeypatch):
    """Two setup() calls in one process: the first .mdp's -DPOSRES must
    not bleed into a second run without defines (regression: the env var
    used to be mutated globally)."""
    from torchmd_tpu import run as runmod

    monkeypatch.delenv("TMD_GMX_DEFINES", raising=False)
    top = write(tmp_path / "posres.top", POSRES_TOP)
    mol = Molecule(top)
    mol.coords = np.array([[1.0, 2.0, 3.0], [8.0, 2.0, 3.0],
                           [1.0, 6.0, 3.0], [8.0, 6.0, 3.0]])[:, :, None]
    gro = str(tmp_path / "c.gro")
    mol.box = np.full((3, 1), 30.0)
    mol.write(gro)

    mdp_pr = write(tmp_path / "pr.mdp", """
integrator = md
dt = 0.001
nsteps = 10
define = -DPOSRES
""")
    mdp_plain = write(tmp_path / "plain.mdp", """
integrator = md
dt = 0.001
nsteps = 10
""")

    def build(conf):
        args = runmod.get_args([
            "--conf", conf, "--topology", top, "--coordinates", gro,
            "--forcefield", top, "--forceterms", "lj",
            "--precision", "double", "--device", "cpu",
            "--log-dir", str(tmp_path / "out"),
        ])
        return runmod.setup(args)

    _, _, forces1 = build(mdp_pr)
    assert forces1.par.gmx_posres  # POSRES active in run 1
    assert "TMD_GMX_DEFINES" not in os.environ  # scope restored
    _, _, forces2 = build(mdp_plain)
    assert forces2.par.gmx_posres == []  # no leak into run 2

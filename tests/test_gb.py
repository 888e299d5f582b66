"""GB/OBC implicit-solvent tests.

Oracle-free validation: the analytic Born-ion and distant-pair limits of
the GB energy are exact, the ACE term is closed-form for an isolated
atom, forces check against finite differences, and the prmtop
RADII/SCREEN ingestion runs on the bundled Amber systems.
"""

import numpy as np
import pytest

from torchmd_tpu.gb import (
    ACE_SIGMA,
    GBSA,
    OFFSET,
    PROBE,
    default_radii,
    make_gbsa,
)
from torchmd_tpu.units import ELEC_FACTOR

EPS = 78.5
PREF = -0.5 * ELEC_FACTOR * (1.0 - 1.0 / EPS)


def test_born_ion_analytic():
    """A single ion has no descreening: B = rho = R - offset, and the
    polarization energy is the exact Born formula."""
    R = 1.5
    gb = GBSA([1.0], [R], [0.85], sa=False)
    pos = np.zeros((1, 3))
    B = float(gb.born_radii(pos)[0])
    assert B == pytest.approx(R - OFFSET, rel=1e-12)
    e = float(gb.energy_fn(pos, None))
    assert e == pytest.approx(PREF / (R - OFFSET), rel=1e-10)


def test_ace_surface_area_isolated():
    R = 1.7
    gb = GBSA([0.0], [R], [0.72], sa=True)
    pos = np.zeros((1, 3))
    rho = R - OFFSET
    expected = ACE_SIGMA * 4 * np.pi * (R + PROBE) ** 2 * (R / rho) ** 6
    assert float(gb.energy_fn(pos, None)) == pytest.approx(
        expected, rel=1e-10
    )
    # literal pin against OpenMM's prefactor: 4*pi*sigma must equal
    # 28.3919551 kJ/mol/nm^2 = 0.06786 kcal/mol/A^2
    assert 4 * np.pi * ACE_SIGMA == pytest.approx(
        28.3919551 / 4.184 / 100.0, rel=2e-2
    )


def test_distant_pair_limit():
    """Far apart, f_GB -> r and each Born radius -> rho: the energy is
    two Born self terms plus the screened Coulomb cross term."""
    R1, R2, q1, q2, r = 1.5, 1.8, 1.0, -1.0, 60.0
    gb = GBSA([q1, q2], [R1, R2], [0.85, 0.85], sa=False)
    pos = np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    e = float(gb.energy_fn(pos, None))
    expected = (
        PREF * q1 * q1 / (R1 - OFFSET)
        + PREF * q2 * q2 / (R2 - OFFSET)
        + 2.0 * PREF * q1 * q2 / r
    )
    assert e == pytest.approx(expected, rel=1e-4)


def test_descreening_direction():
    """A neutral neighbor displaces solvent: the ion's Born radius grows
    and the polarization energy weakens (less negative)."""
    gb = GBSA([1.0, 0.0], [1.5, 1.7], [0.85, 0.72], sa=False)
    far = np.array([[0.0, 0.0, 0.0], [40.0, 0.0, 0.0]])
    near = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    B_far = float(gb.born_radii(far)[0])
    B_near = float(gb.born_radii(near)[0])
    assert B_near > B_far
    assert float(gb.energy_fn(near, None)) > float(gb.energy_fn(far, None))


def test_forces_finite_difference():
    import jax

    rs = np.random.RandomState(0)
    n = 5
    q = rs.randn(n)
    radii = 1.4 + 0.4 * rs.rand(n)
    screen = 0.7 + 0.2 * rs.rand(n)
    gb = GBSA(q, radii, screen, sa=True)
    pos = rs.rand(n, 3) * 4.0

    g = np.asarray(jax.grad(lambda p: gb.energy_fn(p, None))(pos))
    h = 1e-6
    for atom in range(n):
        for k in range(3):
            pp = pos.copy()
            pp[atom, k] += h
            pm = pos.copy()
            pm[atom, k] -= h
            fd = (
                float(gb.energy_fn(pp, None))
                - float(gb.energy_fn(pm, None))
            ) / (2 * h)
            assert g[atom, k] == pytest.approx(fd, rel=5e-5, abs=1e-7)


@pytest.mark.parametrize("sa", [False, True])
@pytest.mark.parametrize("cutoff", [None, 6.0])
def test_analytic_forces_match_ad(sa, cutoff):
    """energy_forces_fn (the O(N)-state multi-pass formulation with
    forward-mode descreening derivatives) must reproduce jax.grad of
    energy_fn to f64 round-off — same model, different evaluation
    order."""
    import jax

    rs = np.random.RandomState(3)
    n = 24
    q = rs.randn(n) * 0.5
    radii = 1.3 + 0.5 * rs.rand(n)
    screen = 0.7 + 0.25 * rs.rand(n)
    gb = GBSA(q, radii, screen, sa=sa, cutoff=cutoff)
    pos = rs.rand(n, 3) * 9.0

    e_ad, g = jax.value_and_grad(lambda p: gb.energy_fn(p, None))(pos)
    e_an, f_an = gb.energy_forces_fn(pos, None)
    assert float(e_an) == pytest.approx(float(e_ad), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f_an), -np.asarray(g),
                               rtol=1e-9, atol=1e-10)


def test_analytic_forces_match_ad_pbc():
    """Same equivalence under a periodic box (wrapped displacements)."""
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(5)
    n = 20
    gb = GBSA(rs.randn(n) * 0.4, 1.4 + 0.4 * rs.rand(n),
              0.75 + 0.2 * rs.rand(n), sa=True, cutoff=5.0)
    pos = rs.rand(n, 3) * 12.0
    box = jnp.asarray([12.0, 12.0, 12.0])
    e_ad, g = jax.value_and_grad(lambda p: gb.energy_fn(p, box))(pos)
    e_an, f_an = gb.energy_forces_fn(pos, box)
    assert float(e_an) == pytest.approx(float(e_ad), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f_an), -np.asarray(g),
                               rtol=1e-9, atol=1e-10)


def test_gbsa_md_analytic_matches_ad_scan():
    """The compiled MD scan picks the analytic GB force path through
    external_ef; the trajectory must match a run forced onto the AD
    path (JaxExternal with only energy_fn)."""
    from torchmd_tpu.external import JaxExternal
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System

    rs = np.random.RandomState(7)
    n = 10
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["CX"] * n, dtype=object)
    mol.element = np.array(["C"] * n, dtype=object)
    mol.charge = rs.randn(n) * 0.2
    mol.masses = np.full(n, 12.011)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    mol.coords = rs.rand(n, 3, 1) * 7.0
    ff = YamlForcefield(mol, {
        "atomtypes": ["CX"],
        "lj": {"CX": {"sigma": 3.4, "epsilon": 0.1}},
        "electrostatics": {"CX": {"charge": 0.0}},
        "masses": {"CX": 12.011},
    })
    par = Parameters(ff, mol, ["lj", "electrostatics"],
                     precision="double")
    par.charges = np.asarray(mol.charge)
    gb = make_gbsa(par, mol, sa=True)

    def run(external):
        forces = Forces(par, terms=["lj", "electrostatics"],
                        precision="double", external=external)
        syst = System(n, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=4)
        )
        integ = Integrator(syst, forces, timestep=1.0, seed=4)
        es = [integ.step(niter=10)[1][0] for _ in range(2)]
        return syst.pos.copy(), np.asarray(es)

    pos_an, e_an = run(gb)                       # analytic path
    pos_ad, e_ad = run(JaxExternal(gb.energy_fn))  # AD-only path
    np.testing.assert_allclose(pos_an, pos_ad, atol=1e-10)
    np.testing.assert_allclose(e_an, e_ad, rtol=1e-10)


def test_make_gbsa_from_prmtop():
    """Amber's own RADII/SCREEN load and produce a finite implicit-solvent
    energy + forces through the Forces external slot."""
    import os

    from conftest import DATA_DIR

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters

    d = os.path.join(DATA_DIR, "ligand-amber")
    mol = Molecule(os.path.join(d, "structure.prmtop"))
    # coordinates: any pdb in the folder
    for f in os.listdir(d):
        if f.endswith(".pdb"):
            mol.read(os.path.join(d, f))
            break
    assert mol.coords.shape[0] == mol.numAtoms

    terms = ["bonds", "angles", "dihedrals", "impropers", "1-4",
             "electrostatics", "lj"]
    ff = ForceField.create(mol, os.path.join(d, "structure.prmtop"))
    par = Parameters(ff, mol, terms, precision="double")
    gb = make_gbsa(par, mol)
    assert gb.radii.shape[0] == mol.numAtoms
    assert float(np.asarray(gb.radii).min()) > 0.5

    forces = Forces(par, terms=terms, precision="double", external=gb)
    frc = np.zeros((1, mol.numAtoms, 3))
    pots = forces.compute(mol.coords[:, :, 0][None], None, frc,
                          returnDetails=True)[0]
    assert np.isfinite(pots["external"])
    assert pots["external"] < 0.0  # net solvation of a charged ligand
    assert np.all(np.isfinite(frc))


def test_default_radii_fallback():
    r, s = default_radii(["C", "H", "O", "N", "S", "Xx"])
    assert list(r[:3]) == [1.7, 1.2, 1.5]
    assert s[1] == 0.85 and s[-1] == 0.8


def test_gbsa_md_smoke():
    """Implicit-solvent Langevin MD stays finite (small dipeptide-like
    random cluster, element-default radii)."""
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System

    rs = np.random.RandomState(2)
    n = 8
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["CX"] * n, dtype=object)
    mol.element = np.array(["C"] * n, dtype=object)
    mol.charge = rs.randn(n) * 0.2
    mol.masses = np.full(n, 12.011)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    mol.coords = (rs.rand(n, 3, 1) * 6.0)
    ff = YamlForcefield(mol, {
        "atomtypes": ["CX"],
        "lj": {"CX": {"sigma": 3.4, "epsilon": 0.1}},
        "electrostatics": {"CX": {"charge": 0.0}},
        "masses": {"CX": 12.011},
    })
    par = Parameters(ff, mol, ["lj", "electrostatics"], precision="double")
    par.charges = np.asarray(mol.charge)
    from torchmd_tpu.gb import make_gbsa as mk

    gb = mk(par, mol, sa=True)
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="double", external=gb)
    syst = System(n, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=4))
    integ = Integrator(syst, forces, timestep=1.0, gamma=1.0, T=300.0,
                       seed=4)
    ekin, epot, temp = integ.step(niter=20)
    assert np.isfinite(float(np.asarray(epot).reshape(-1)[0]))
    assert np.all(np.isfinite(np.asarray(syst.pos)))

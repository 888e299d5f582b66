"""CMAP cross-term tests: periodic bicubic spline correctness, force
consistency, CHARMM .prm / PSF parsing, and the end-to-end Forces path.

Capability beyond the reference (torchmd has no CMAP); validated against
the analytic generating surface instead of a cross-engine oracle.
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.cmap import (
    CMapTable,
    bicubic_coefficients,
    build_cmap_coeff_table,
    cmap_energy,
)


def _surface(phi, psi):
    """Smooth periodic test surface (kcal/mol-ish scale)."""
    return (
        np.cos(phi)
        + 0.7 * np.sin(psi)
        + 0.3 * np.cos(phi + psi)
        + 0.2 * np.sin(2.0 * psi - phi)
    )


def _grid(n):
    ang = -np.pi + 2.0 * np.pi * np.arange(n) / n
    return _surface(ang[:, None], ang[None, :])


def _interp(coeffs, phi, psi):
    """Host-side bicubic lookup mirroring the device formula."""
    n = coeffs.shape[0]
    h = 2.0 * np.pi / n

    def locate(a):
        x = (np.asarray(a) + np.pi) / h
        c = np.floor(x)
        return (c.astype(int) % n), (x - c)

    ci, t = locate(phi)
    cj, u = locate(psi)
    a = coeffs[ci, cj]
    tp = np.stack([np.ones_like(t), t, t**2, t**3], axis=-1)
    up = np.stack([np.ones_like(u), u, u**2, u**3], axis=-1)
    return np.einsum("...p,...pq,...q->...", tp, a, up)


def test_bicubic_exact_at_grid_nodes():
    g = _grid(12)
    coeffs = bicubic_coefficients(g)
    # a[i, j, 0, 0] is the interpolant at the cell origin = the grid value
    np.testing.assert_allclose(coeffs[:, :, 0, 0], g, atol=1e-12)


def test_bicubic_matches_smooth_surface():
    coeffs = bicubic_coefficients(_grid(24))
    rs = np.random.RandomState(0)
    phi = rs.uniform(-np.pi, np.pi, 400)
    psi = rs.uniform(-np.pi, np.pi, 400)
    err = np.max(np.abs(_interp(coeffs, phi, psi) - _surface(phi, psi)))
    assert err < 5e-4, err  # 15-degree spacing, smooth surface


def test_bicubic_c1_across_cell_boundaries():
    coeffs = bicubic_coefficients(_grid(8))
    n, h = 8, 2.0 * np.pi / 8
    eps = 1e-7
    # step across every interior phi boundary at a few psi values
    for i in range(n):
        b = -np.pi + i * h
        for psi in (-1.0, 0.3, 2.2):
            lo = _interp(coeffs, b - eps, psi)
            hi = _interp(coeffs, b + eps, psi)
            assert abs(hi - lo) < 1e-5  # C0
            dlo = (_interp(coeffs, b - eps, psi) - _interp(coeffs, b - 3 * eps, psi)) / (2 * eps)
            dhi = (_interp(coeffs, b + 3 * eps, psi) - _interp(coeffs, b + eps, psi)) / (2 * eps)
            assert abs(dhi - dlo) < 1e-3  # C1 (FD noise dominated)


def _chain_table(n=24):
    coeffs = build_cmap_coeff_table([_grid(n)])
    # phi = (0,1,2,3), psi = (1,2,3,4) on a 5-atom chain
    idx = np.array([[0, 1, 2, 3, 1, 2, 3, 4]])
    return CMapTable(
        idx=jnp.asarray(idx, jnp.int32),
        type=jnp.zeros(1, jnp.int32),
        coeffs=jnp.asarray(coeffs),
    )


def _chain_pos(rs):
    pos = np.array(
        [[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.2, 1.3, 0.0],
         [3.6, 1.5, 1.0], [4.0, 2.6, 1.8]]
    )
    return pos + 0.15 * rs.randn(5, 3)


def test_cmap_forces_match_finite_differences():
    table = _chain_table()
    rs = np.random.RandomState(3)
    pos = jnp.asarray(_chain_pos(rs))

    e, g = jax.value_and_grad(lambda p: cmap_energy(table, p, None))(pos)
    eps = 1e-6
    for (i, k) in [(0, 0), (1, 2), (2, 1), (3, 0), (4, 2)]:
        dp = np.zeros((5, 3))
        dp[i, k] = eps
        ep = cmap_energy(table, pos + dp, None)
        em = cmap_energy(table, pos - dp, None)
        fd = (float(ep) - float(em)) / (2 * eps)
        assert abs(fd - float(g[i, k])) < 1e-5, (i, k, fd, float(g[i, k]))


def test_cmap_energy_matches_surface():
    from torchmd_tpu.potentials import _dihedral_phi

    table = _chain_table()
    rs = np.random.RandomState(7)
    for _ in range(10):
        pos = jnp.asarray(_chain_pos(rs))
        phi = float(_dihedral_phi(pos, table.idx[:, :4], None)[0])
        psi = float(_dihedral_phi(pos, table.idx[:, 4:], None)[0])
        e = float(cmap_energy(table, pos, None))
        assert abs(e - _surface(phi, psi)) < 5e-4


# ----------------------------------------------------------------------
# Parsing + end-to-end
# ----------------------------------------------------------------------

def _write_prm(path, n=8):
    g = _grid(n)
    body = "\n".join(
        "\n".join(
            " ".join(f"{v:.10f}" for v in row[k:k + 5])
            for k in range(0, n, 5)
        )
        for row in g
    )
    path.write_text(textwrap.dedent("""\
        * synthetic CMAP test parameters
        *

        ATOMS
        MASS 1 A1 12.011

        BONDS
        A1 A1 300.0 1.5

        ANGLES
        A1 A1 A1 50.0 109.5

        DIHEDRALS
        A1 A1 A1 A1 0.20 3 0.0

        NONBONDED
        A1 0.0 -0.10 1.95

        CMAP
        ! two coupled dihedrals sharing three atoms
        A1 A1 A1 A1 A1 A1 A1 A1 {n}

    """).format(n=n) + body + "\nEND\n")
    return g


def test_prm_cmap_parsing(tmp_path):
    from torchmd_tpu.forcefields.ff_charmm import CharmmParameterSet

    g = _write_prm(tmp_path / "t.prm")
    prm = CharmmParameterSet(str(tmp_path / "t.prm"))
    key = ("A1",) * 8
    assert key in prm.cmap_types
    np.testing.assert_allclose(prm.cmap_types[key], g, atol=1e-9)


def test_psf_ncrterm_parsing(tmp_path):
    psf = tmp_path / "t.psf"
    psf.write_text(textwrap.dedent("""\
        PSF

               1 !NTITLE
         REMARKS synthetic

               5 !NATOM
               1 A    1    ALA  C1   A1    0.000000       12.0110           0
               2 A    1    ALA  C2   A1    0.000000       12.0110           0
               3 A    1    ALA  C3   A1    0.000000       12.0110           0
               4 A    1    ALA  C4   A1    0.000000       12.0110           0
               5 A    1    ALA  C5   A1    0.000000       12.0110           0

               4 !NBOND: bonds
               1       2       2       3       3       4       4       5

               1 !NCRTERM: cross-terms
               1       2       3       4       2       3       4       5
    """))
    from torchmd_tpu.io import Molecule

    mol = Molecule(str(psf))
    assert mol.crossterms.shape == (1, 8)
    np.testing.assert_array_equal(
        mol.crossterms[0], [0, 1, 2, 3, 1, 2, 3, 4]
    )


def test_forces_cmap_end_to_end(tmp_path):
    """Full pipeline: prm + manual topology -> Parameters -> Forces; the
    CMAP detail matches the analytic surface, and the fused hot path
    (ef_one, used by the integrator) agrees with the pure-AD path."""
    from torchmd_tpu.forcefields.ff_charmm import CharmmForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.potentials import _dihedral_phi

    n = 8
    _write_prm(tmp_path / "t.prm", n=n)

    rs = np.random.RandomState(11)
    mol = Molecule()
    mol.numAtoms = 5
    mol.atomtype = np.array(["A1"] * 5, dtype=object)
    mol.charge = np.zeros(5)
    mol.masses = np.full(5, 12.011)
    mol.bonds = np.array([[i, i + 1] for i in range(4)])
    mol.angles = np.array([[i, i + 1, i + 2] for i in range(3)])
    mol.dihedrals = np.array([[i, i + 1, i + 2, i + 3] for i in range(2)])
    mol.crossterms = np.array([[0, 1, 2, 3, 1, 2, 3, 4]])
    mol.coords = _chain_pos(rs)[:, :, None]

    ff = CharmmForcefield(mol, str(tmp_path / "t.prm"))
    terms = ["bonds", "angles", "dihedrals", "cmap"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")

    pos = jnp.asarray(mol.coords[:, :, 0])
    details = forces.compute(pos[None], None, returnDetails=True)[0]
    assert "cmap" in details

    phi = float(_dihedral_phi(pos, forces.ffparams.cmap.idx[:, :4], None)[0])
    psi = float(_dihedral_phi(pos, forces.ffparams.cmap.idx[:, 4:], None)[0])
    # n=8 grid (45-degree spacing): coarser -> looser spline tolerance
    assert abs(details["cmap"] - _surface(phi, psi)) < 0.05

    # hot path (bonded_ef_one wrap) vs pure-AD compute_potentials path
    pot_hot, frc_hot = forces.ef_one(pos, None)
    e_hot = sum(jax.tree_util.tree_leaves(pot_hot))
    from torchmd_tpu.potentials import energy_and_forces

    pot_ad, frc_ad = energy_and_forces(
        forces.ffparams, pos, None, forces.config
    )
    e_ad = sum(jax.tree_util.tree_leaves(pot_ad))
    assert abs(float(e_hot) - float(e_ad)) < 1e-10
    np.testing.assert_allclose(
        np.asarray(frc_hot), np.asarray(frc_ad), atol=1e-9
    )
    assert abs(float(pot_hot["cmap"]) - details["cmap"]) < 1e-10


def test_cmap_in_dynamics(tmp_path):
    """One short Langevin run with CMAP enabled steps without error and
    conserves sane energies (scan path exercises the wrapped bonded stage)."""
    from torchmd_tpu.forcefields.ff_charmm import CharmmForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System

    _write_prm(tmp_path / "t.prm", n=8)
    rs = np.random.RandomState(5)
    mol = Molecule()
    mol.numAtoms = 5
    mol.atomtype = np.array(["A1"] * 5, dtype=object)
    mol.charge = np.zeros(5)
    mol.masses = np.full(5, 12.011)
    mol.bonds = np.array([[i, i + 1] for i in range(4)])
    mol.angles = np.array([[i, i + 1, i + 2] for i in range(3)])
    mol.dihedrals = np.array([[i, i + 1, i + 2, i + 3] for i in range(2)])
    mol.crossterms = np.array([[0, 1, 2, 3, 1, 2, 3, 4]])
    mol.coords = _chain_pos(rs)[:, :, None]

    ff = CharmmForcefield(mol, str(tmp_path / "t.prm"))
    terms = ["bonds", "angles", "dihedrals", "cmap"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double")
    system = System(5, 1, "double")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=0))
    integ = Integrator(system, forces, 1.0, gamma=0.1, T=300.0, seed=0)
    ekin, epot, _ = integ.step(niter=20)
    assert np.all(np.isfinite(np.asarray(ekin)))
    assert np.all(np.isfinite(np.asarray(epot)))


def test_cmap_yaml_roundtrip(tmp_path):
    """CMAP through the YAML schema: prm -> Parameters -> to_yaml_ff ->
    YamlForcefield -> Parameters reproduces identical energies."""
    import yaml

    from torchmd_tpu.forcefields.ff_charmm import CharmmForcefield
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters, to_yaml_ff

    n = 8
    _write_prm(tmp_path / "t.prm", n=n)
    rs = np.random.RandomState(11)
    mol = Molecule()
    mol.numAtoms = 5
    mol.atomtype = np.array(["A1"] * 5, dtype=object)
    mol.charge = np.zeros(5)
    mol.masses = np.full(5, 12.011)
    mol.bonds = np.array([[i, i + 1] for i in range(4)])
    mol.angles = np.array([[i, i + 1, i + 2] for i in range(3)])
    mol.dihedrals = np.array([[i, i + 1, i + 2, i + 3] for i in range(2)])
    mol.crossterms = np.array([[0, 1, 2, 3, 1, 2, 3, 4]])
    mol.coords = _chain_pos(rs)[:, :, None]

    terms = ["bonds", "angles", "dihedrals", "cmap"]
    ff1 = CharmmForcefield(mol, str(tmp_path / "t.prm"))
    par1 = Parameters(ff1, mol, terms, precision="double")
    f1 = Forces(par1, terms=terms, precision="double")

    ffdict = to_yaml_ff(par1, mol)
    assert "cmap" in ffdict and len(ffdict["cmap"]) == 1
    # also exercise the file path through yaml serialization
    (tmp_path / "ff.yaml").write_text(yaml.dump(ffdict))
    ff2 = YamlForcefield(mol, str(tmp_path / "ff.yaml"))
    par2 = Parameters(ff2, mol, terms, precision="double")
    f2 = Forces(par2, terms=terms, precision="double")

    pos = jnp.asarray(mol.coords[:, :, 0])
    d1 = f1.compute(pos[None], None, returnDetails=True)[0]
    d2 = f2.compute(pos[None], None, returnDetails=True)[0]
    for k in d1:
        assert abs(d1[k] - d2[k]) < 1e-10, (k, d1[k], d2[k])

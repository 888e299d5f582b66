"""Permanent point dipoles: analytic anchors + frame rotation + AD
torque transfer (forces vs finite differences)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.potentials import ELEC_FACTOR, FFParams
from torchmd_tpu.multipoles import lab_dipoles, make_multipoles


def _ffp(charges, mask=None):
    n = len(charges)
    if mask is None:
        mask = ~np.eye(n, dtype=bool)
    return FFParams(
        charges=jnp.asarray(np.asarray(charges, np.float64)),
        masses=jnp.full((n, 1), 10.0),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.asarray([[1.0, 0.0]]),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None, nb_mask=jnp.asarray(mask),
    )


def test_dipole_dipole_analytic():
    """Two lab-frame dipoles: head-to-tail -2 EF mu^2/r^3, side-by-side
    + EF mu^2/r^3."""
    m, r = 0.4, 6.0
    ffp = _ffp([0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, m], "frame": "none"},
        {"atom": 1, "mu": [0, 0, m], "frame": "none"},
    ])
    # separation along the dipole axis (z)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), -2.0 * ELEC_FACTOR * m * m / r**3,
        rtol=1e-12,
    )
    # separation perpendicular to the dipoles
    pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), ELEC_FACTOR * m * m / r**3, rtol=1e-12,
    )


def test_charge_dipole_analytic():
    """Dipole pointing at a positive charge: E = + q EF mu / r^2."""
    m, r, q = 0.3, 8.0, 1.0
    ffp = _ffp([0.0, q])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, m], "frame": "none"},
    ])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    np.testing.assert_allclose(
        float(mp.energy_fn(pos)), q * ELEC_FACTOR * m / r**2, rtol=1e-12,
    )
    # flipped dipole: attractive
    mp2 = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, -m], "frame": "none"},
    ])
    np.testing.assert_allclose(
        float(mp2.energy_fn(pos)), -q * ELEC_FACTOR * m / r**2, rtol=1e-12,
    )


def test_z_then_x_frame_tracks_geometry():
    """mu_local = (0, 0, m) in a z-then-x frame points from the site
    toward its z neighbor, wherever that neighbor moves."""
    ffp = _ffp([0.0, 0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.5], "frame": "z-then-x", "z": 1,
         "x": 2},
    ])
    for direction in ([1.0, 0, 0], [0, 1.0, 0], [0.6, -0.64, 0.48]):
        d = np.asarray(direction) / np.linalg.norm(direction)
        pos = jnp.asarray([
            [0.0, 0.0, 0.0], (d * 1.4).tolist(), [0.0, -2.0, 1.0],
        ])
        mu = np.asarray(lab_dipoles(mp.spec, pos, None))[0]
        np.testing.assert_allclose(mu, 0.5 * d, atol=1e-12)


def test_bisector_frame():
    """Water-like site: the bisector dipole points between the two
    neighbors."""
    ffp = _ffp([0.0, 0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.7], "frame": "bisector", "z": 1,
         "x": 2},
    ])
    pos = jnp.asarray([
        [0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0],
    ])
    mu = np.asarray(lab_dipoles(mp.spec, pos, None))[0]
    np.testing.assert_allclose(mu, [0.0, 0.7, 0.0], atol=1e-12)


def test_forces_match_finite_difference_with_frames():
    """AD transfers dipole torques to the frame atoms exactly: gradient
    vs central differences, frames included."""
    rs = np.random.RandomState(2)
    ffp = _ffp(rs.randn(5) * 0.2)
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0.1, -0.05, 0.3], "frame": "z-then-x",
         "z": 1, "x": 2},
        {"atom": 3, "mu": [0.0, 0.0, 0.25], "frame": "bisector",
         "z": 2, "x": 4},
    ])
    pos = jnp.asarray(rs.rand(5, 3) * 4.0 + np.arange(5)[:, None] * 2.0)

    g = np.asarray(jax.grad(mp.energy_fn)(pos))
    h = 1e-6
    for _ in range(8):
        i, k = rs.randint(5), rs.randint(3)
        dp = np.zeros((5, 3))
        dp[i, k] = h
        fd = (
            float(mp.energy_fn(pos + dp)) - float(mp.energy_fn(pos - dp))
        ) / (2 * h)
        np.testing.assert_allclose(g[i, k], fd, rtol=5e-6, atol=1e-9)


def test_exclusions_and_cutoff_respected():
    mask = ~np.eye(3, dtype=bool)
    mask[0, 1] = mask[1, 0] = False  # excluded pair
    ffp = _ffp([0.0, 1.0, 1.0], mask=mask)
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.3], "frame": "none"},
    ], cutoff=5.0)
    pos = jnp.asarray([
        [0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 0.0, 20.0],
    ])
    # atom 1 excluded, atom 2 beyond cutoff -> zero energy
    np.testing.assert_allclose(float(mp.energy_fn(pos)), 0.0, atol=1e-14)


def test_rides_integrator_scan():
    """Multipoles as the external potential inside a compiled scan."""
    import os

    from conftest import SYSTEMS_DIR
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    mp = make_multipoles(forces.ffparams, [
        {"atom": 0, "mu": [0, 0, 0.4], "frame": "z-then-x", "z": 1},
        {"atom": 5, "mu": [0, 0, 0.4], "frame": "z-then-x", "z": 6},
    ], cutoff=9.0)
    forces.external = mp
    forces._build_evaluators()
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=1))
    integ = Integrator(system, forces, timestep=2.0, T=120.0, gamma=2.0)
    ek, ep, T = integ.step(niter=30)
    assert np.isfinite(ep[0]) and np.isfinite(T[0])


# ----------------------------------------------------------------------
# Quadrupole tier
# ----------------------------------------------------------------------

def _linear_quad(q, d):
    """Charges (+q at +-d z, -2q at origin): Q = diag(-2,-2,4) q d^2."""
    return np.diag([-2.0, -2.0, 4.0]) * q * d * d


def _coulomb(charges_pos):
    e = 0.0
    for i in range(len(charges_pos)):
        for j in range(i + 1, len(charges_pos)):
            qi, pi = charges_pos[i]
            qj, pj = charges_pos[j]
            e += ELEC_FACTOR * qi * qj / np.linalg.norm(pi - pj)
    return e


def test_charge_quadrupole_point_vs_array():
    """Point quadrupole-charge energy == closed form EF q Qzz/(2 r^3)
    AND the far-field limit of the explicit 3-charge array."""
    qq, d, r, qj = 0.8, 0.05, 9.0, 1.0
    Q = _linear_quad(qq, d)
    ffp = _ffp([0.0, qj])
    mp = make_multipoles(ffp, [{"atom": 0, "quad": Q, "frame": "none"}])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    e_point = float(mp.energy_fn(pos))
    np.testing.assert_allclose(
        e_point, ELEC_FACTOR * qj * Q[2, 2] / (2.0 * r**3), rtol=1e-12,
    )
    # explicit array (pair energy with the external charge only)
    arr = [(qq, np.array([0, 0, d])), (qq, np.array([0, 0, -d])),
           (-2 * qq, np.zeros(3))]
    e_arr = sum(
        ELEC_FACTOR * qa * qj / np.linalg.norm(np.array([0, 0, r]) - pa)
        for qa, pa in arr
    )
    np.testing.assert_allclose(e_point, e_arr, rtol=2 * (d / r) ** 2)


def test_quad_quad_and_quad_dipole_vs_arrays():
    """Point-model Q-Q and Q-mu energies match explicit charge arrays in
    the far field (convention-proof: no hand-derived T-tensors to get
    wrong -- everything comes from AD of one potential)."""
    qq, d, r = 0.8, 0.04, 10.0
    Q = _linear_quad(qq, d)

    # Q-Q, both linear quadrupoles along z, separated along z
    ffp = _ffp([0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "quad": Q, "frame": "none"},
        {"atom": 1, "quad": Q, "frame": "none"},
    ])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    e_point = float(mp.energy_fn(pos))
    arr_i = [(qq, np.array([0, 0, d])), (qq, np.array([0, 0, -d])),
             (-2 * qq, np.zeros(3))]
    arr_j = [(qa, pa + np.array([0, 0, r])) for qa, pa in arr_i]
    e_arr = sum(
        ELEC_FACTOR * qa * qb / np.linalg.norm(pa - pb)
        for qa, pa in arr_i for qb, pb in arr_j
    )
    np.testing.assert_allclose(e_point, e_arr, rtol=20 * (d / r) ** 2)

    # Q-mu: quadrupole at origin, small physical dipole at z = r
    m_d = 0.3
    dd = 0.05
    mp2 = make_multipoles(ffp, [
        {"atom": 0, "quad": Q, "frame": "none"},
        {"atom": 1, "mu": [0, 0, m_d], "frame": "none"},
    ])
    e_point2 = float(mp2.energy_fn(pos))
    # dipole as +-q pair: q = m_d / (2 dd) at z = r +- dd
    qd = m_d / (2 * dd)
    arr_dip = [(qd, np.array([0, 0, r + dd])),
               (-qd, np.array([0, 0, r - dd]))]
    e_arr2 = sum(
        ELEC_FACTOR * qa * qb / np.linalg.norm(pa - pb)
        for qa, pa in arr_i for qb, pb in arr_dip
    )
    np.testing.assert_allclose(e_point2, e_arr2,
                               rtol=20 * max(d / r, dd / r) ** 2)


def test_quadrupole_frame_rotation_and_fd_forces():
    """Frame-rotated quadrupole: Q_lab = R Q_local R^T stays traceless;
    forces (incl. frame torque transfer) match finite differences."""
    from torchmd_tpu.multipoles import lab_quadrupoles

    rs = np.random.RandomState(4)
    Q = _linear_quad(0.6, 0.05)
    ffp = _ffp(rs.randn(4) * 0.3)
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0.05, 0.0, 0.2], "quad": Q,
         "frame": "z-then-x", "z": 1, "x": 2},
    ])
    pos = jnp.asarray(rs.rand(4, 3) * 3.0 + np.arange(4)[:, None] * 2.5)
    Q_lab = np.asarray(lab_quadrupoles(mp.spec, pos, None))[0]
    np.testing.assert_allclose(np.trace(Q_lab), 0.0, atol=1e-12)
    np.testing.assert_allclose(Q_lab, Q_lab.T, atol=1e-12)
    # eigenvalues preserved under rotation
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvalsh(Q_lab)), np.sort(np.linalg.eigvalsh(Q)),
        atol=1e-10,
    )

    g = np.asarray(jax.grad(mp.energy_fn)(pos))
    h = 1e-6
    for _ in range(6):
        i, k = rs.randint(4), rs.randint(3)
        dp = np.zeros((4, 3))
        dp[i, k] = h
        fd = (
            float(mp.energy_fn(pos + dp)) - float(mp.energy_fn(pos - dp))
        ) / (2 * h)
        np.testing.assert_allclose(g[i, k], fd, rtol=5e-6, atol=1e-9)


def test_quadrupole_validation():
    ffp = _ffp([0.0, 0.0])
    with pytest.raises(ValueError, match="traceless"):
        make_multipoles(ffp, [{"atom": 0, "quad": np.eye(3)}])
    with pytest.raises(ValueError, match="symmetric"):
        bad = np.zeros((3, 3)); bad[0, 1] = 1.0
        make_multipoles(ffp, [{"atom": 0, "quad": bad}])


def test_z_then_x_requires_x_for_transverse_moments():
    """Regression: transverse mu/quad components in a z-then-x frame
    without an x atom used to vanish silently; axial-only moments remain
    allowed."""
    ffp = _ffp([0.0, 0.0])
    with pytest.raises(ValueError, match="x atom"):
        make_multipoles(ffp, [
            {"atom": 0, "mu": [0.4, 0.0, 0.2], "frame": "z-then-x",
             "z": 1},
        ])
    # axial dipole + axially symmetric quadrupole: fine without x
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, 0.2], "quad": _linear_quad(0.5, 0.05),
         "frame": "z-then-x", "z": 1},
    ])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    assert np.isfinite(float(mp.energy_fn(pos)))


def test_switching_removes_cutoff_discontinuity():
    """With switch_dist the pair energy tapers continuously to zero at
    the cutoff (no energy jump when a pair crosses it)."""
    m = 0.4
    ffp = _ffp([0.0, 0.0])
    mp = make_multipoles(ffp, [
        {"atom": 0, "mu": [0, 0, m], "frame": "none"},
        {"atom": 1, "mu": [0, 0, m], "frame": "none"},
    ], cutoff=8.0, switch_dist=6.0)

    def e(r):
        return float(mp.energy_fn(
            jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
        ))

    assert abs(e(7.999)) < 1e-5      # continuous to zero at the cutoff
    assert abs(e(8.001)) == 0.0
    np.testing.assert_allclose(      # untouched below the switch
        e(5.0), -2.0 * ELEC_FACTOR * m * m / 5.0**3, rtol=1e-12,
    )
    # monotone taper inside the switching window
    assert abs(e(6.5)) < abs(e(6.0)) and abs(e(7.5)) < abs(e(6.5))


def test_parse_tinker_multipole_records():
    """TINKER multipole record parsing: axis-sign frame decoding and the
    lower-triangular quadrupole mirror (values verbatim, file units)."""
    from torchmd_tpu.multipoles import parse_tinker_multipoles

    text = """
# AMOEBA water (amoeba09-style records)
multipole   401 -402 -402          -0.51966
                                    0.00000  0.00000  0.14279
                                    0.37928
                                    0.00000 -0.41809
                                    0.00000  0.00000  0.03881
multipole   402  401  402           0.25983
                                   -0.03859  0.00000 -0.05818
                                   -0.03673
                                    0.00000 -0.10739
                                   -0.00203  0.00000  0.14412
"""
    recs = parse_tinker_multipoles(text)
    assert set(recs) == {401, 402}
    o = recs[401]
    assert o["frame"] == "bisector"
    assert o["z_type"] == 402 and o["x_type"] == 402
    np.testing.assert_allclose(o["monopole"], -0.51966)
    np.testing.assert_allclose(o["dipole"], [0.0, 0.0, 0.14279])
    np.testing.assert_allclose(np.trace(o["quad"]), 0.0, atol=1e-10)
    np.testing.assert_allclose(o["quad"], o["quad"].T)
    h = recs[402]
    assert h["frame"] == "z-then-x"
    assert h["z_type"] == 401 and h["x_type"] == 402
    np.testing.assert_allclose(h["quad"][0, 2], -0.00203)
    np.testing.assert_allclose(h["quad"][2, 0], -0.00203)

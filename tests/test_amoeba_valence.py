"""AMOEBA valence terms from TINKER .prm files.

Anchors: closed-form energies recomputed in-test from the published
functional forms, finite-difference forces, and a physical pin -- the
O-H stretch frequency implied by the water03 bond constant lands in
the water band (~3600 cm^-1), validating the kcal/mol/A^2 + amu unit
chain end to end."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.amoeba_valence import (
    AmoebaValence,
    derive_valence_instances,
    parse_tinker_valence,
)

WATER03_VALENCE = """
bond-cubic              -2.55
bond-quartic            3.793125
angle-cubic             -0.014
angle-quartic           0.000056
angle-pentic            -0.0000007
angle-sextic            0.000000022

atom          1    1    O     "AMOEBA Water O"               8    15.995    2
atom          2    2    H     "AMOEBA Water H"               1     1.008    1

bond          1    2          529.60     0.9572
angle         2    1    2      34.05     108.50
ureybrad      2    1    2      38.25     1.5537
"""

DEG = np.pi / 180.0


def _water(r=0.9572, theta=108.50):
    th = np.deg2rad(theta)
    return np.asarray([
        [0.0, 0.0, 0.0],
        [r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
        [-r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
    ])


def test_parse_header_and_records():
    val = parse_tinker_valence(WATER03_VALENCE)
    s = val["scales"]
    assert s["bond_cubic"] == pytest.approx(-2.55)
    assert s["angle_sextic"] == pytest.approx(2.2e-8)
    assert s["angle_unit"] == pytest.approx(DEG * DEG)
    assert val["bond"][(1, 2)] == (529.60, 0.9572)
    assert val["angle"][(2, 1, 2)][0] == 34.05
    assert val["ureybrad"][(2, 1, 2)] == (38.25, 1.5537)


def test_instance_derivation():
    angles, torsions, _ = derive_valence_instances(
        5, [[0, 1], [1, 2], [2, 3], [3, 4]]
    )
    assert angles == [(0, 1, 2), (1, 2, 3), (2, 3, 4)]
    assert set(torsions) == {(0, 1, 2, 3), (1, 2, 3, 4)}


def test_water_energy_closed_form():
    """At the parameter minimum geometry only the Urey term is nonzero;
    a stretched/bent geometry matches the hand-evaluated anharmonic
    expansion."""
    pot = AmoebaValence(WATER03_VALENCE, [1, 2, 2],
                        [[0, 1], [0, 2]])
    pos0 = _water()
    e0 = float(pot.energy_fn(jnp.asarray(pos0)))
    d13 = np.linalg.norm(pos0[1] - pos0[2])
    e_urey = 38.25 * (d13 - 1.5537) ** 2
    assert e0 == pytest.approx(e_urey, rel=1e-10)

    r, th = 1.05, 100.0
    pos = _water(r=r, theta=th)
    dr = r - 0.9572
    dt = th - 108.50
    e_bond = 2 * 529.60 * dr**2 * (1 - 2.55 * dr + 3.793125 * dr**2)
    e_ang = (DEG**2) * 34.05 * dt**2 * (
        1 - 0.014 * dt + 5.6e-5 * dt**2 - 7e-7 * dt**3 + 2.2e-8 * dt**4
    )
    d13 = np.linalg.norm(pos[1] - pos[2])
    e_urey = 38.25 * (d13 - 1.5537) ** 2
    e = float(pot.energy_fn(jnp.asarray(pos)))
    assert e == pytest.approx(e_bond + e_ang + e_urey, rel=1e-9)


def test_forces_match_fd():
    pot = AmoebaValence(WATER03_VALENCE, [1, 2, 2],
                        [[0, 1], [0, 2]])
    pos = _water(r=1.02, theta=100.0) + np.asarray([0.01, 0.02, -0.01])
    g = np.asarray(jax.grad(pot.energy_fn)(jnp.asarray(pos)))
    for (i, a) in [(0, 0), (1, 2), (2, 1)]:
        h = 1e-6
        pp = pos.copy()
        pp[i, a] += h
        pm = pos.copy()
        pm[i, a] -= h
        fd = (float(pot.energy_fn(jnp.asarray(pp)))
              - float(pot.energy_fn(jnp.asarray(pm)))) / (2 * h)
        assert abs(fd - g[i, a]) < 1e-6 * max(1.0, abs(fd))


def test_oh_stretch_frequency_in_water_band():
    """The water03 bond constant implies an O-H harmonic stretch near
    3600 cm^-1 -- the physical pin on the unit chain."""
    pot = AmoebaValence(WATER03_VALENCE, [1, 2], [[0, 1]])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.9572, 0.0, 0.0]])
    H = np.asarray(jax.hessian(
        lambda p: pot.energy_fn(p.reshape(2, 3))
    )(pos.reshape(-1)))
    mu = 15.995 * 1.008 / (15.995 + 1.008)          # amu
    # curvature on the relative coordinate dr = x1 - x0: the quadratic
    # form q^T H q with q = (-1,0,0,+1,0,0)/..., i.e. (H00+H33-2*H03)/4
    k = (H[0, 0] + H[3, 3] - 2 * H[0, 3]) / 4.0     # kcal/mol/A^2 on dr
    k_si = k * 4184.0 / 6.02214076e23 * 1e20        # N/m
    mu_si = mu * 1.66053907e-27
    nu = np.sqrt(k_si / mu_si) / (2 * np.pi * 2.99792458e10)
    assert 3400.0 < nu < 3800.0


TORSION_PRM = """
torsionunit             0.5

atom          1    1    C     "sp3 carbon"      6    12.011    4

torsion       1    1    1    1      1.50   0.0  1   0.80 180.0  2   0.30   0.0  3
"""


def test_torsion_closed_form_and_wildcards():
    pot = AmoebaValence(TORSION_PRM, [1, 1, 1, 1],
                        [[0, 1], [1, 2], [2, 3]])
    # build a chain with a known dihedral phi
    for phi_deg in (0.0, 60.0, 123.4, 180.0):
        phi = np.deg2rad(phi_deg)
        pos = np.asarray([
            [1.0, 0.0, -1.0],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 1.5],
            [np.cos(phi), np.sin(phi), 2.5],
        ])
        e = float(pot.energy_fn(jnp.asarray(pos)))
        want = 0.5 * (
            1.50 / 2 * (1 + np.cos(phi))
            + 0.80 / 2 * (1 + np.cos(2 * phi - np.pi))
            + 0.30 / 2 * (1 + np.cos(3 * phi))
        )
        assert e == pytest.approx(want, abs=1e-9), phi_deg

    # 0-wildcard resolution
    wild = TORSION_PRM.replace(
        "torsion       1    1    1    1",
        "torsion       0    1    1    0"
    )
    pot_w = AmoebaValence(wild, [1, 1, 1, 1], [[0, 1], [1, 2], [2, 3]])
    pos = np.asarray([
        [1.0, 0.0, -1.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.5],
        [0.5, 0.5, 2.5],
    ])
    assert float(pot_w.energy_fn(jnp.asarray(pos))) == pytest.approx(
        float(pot.energy_fn(jnp.asarray(pos))), abs=1e-12
    )


OPBEND_PRM = """
opbend-cubic            -0.014
opbend-quartic          0.000056

atom          1    1    C     "sp2 carbon"      6    12.011    3
atom          2    2    H     "H on sp2 C"      1     1.008    1

opbend        2    1    0    0            14.40
strbnd        2    1    2            5.50   5.50
bond          1    2          370.00     1.09
angle         2    1    2      35.00     120.00
pitors        1    1           6.85
"""


def test_opbend_strbnd_closed_form():
    """Planar sp2 center: opbend zero in plane, quadratic out of plane;
    strbnd couples the hand-computed dr and dtheta."""
    types = [1, 2, 2, 2]
    bonds = [[0, 1], [0, 2], [0, 3]]
    r0, th = 1.09, np.deg2rad(120.0)
    planar = np.asarray([
        [0.0, 0.0, 0.0],
        [r0, 0.0, 0.0],
        [r0 * np.cos(th), r0 * np.sin(th), 0.0],
        [r0 * np.cos(th), -r0 * np.sin(th), 0.0],
    ])
    pot = AmoebaValence(OPBEND_PRM, types, bonds)
    # in-plane equilibrium: bond and opbend zero; angles exactly 120
    assert float(pot.energy_fn(jnp.asarray(planar))) == pytest.approx(
        0.0, abs=1e-9
    )

    # lift one H out of plane: ALL THREE opbend instances activate (the
    # lifted H against the other two's plane, and each in-plane H
    # against a now-tilted plane). Hand-compute every Wilson-Decius-
    # Cross chi in numpy and sum the expansions.
    chi = np.deg2rad(8.0)
    lifted = planar.copy()
    lifted[1] = [r0 * np.cos(chi), 0.0, r0 * np.sin(chi)]

    def wdc_chi_deg(p, a, b, c, d):
        va, vc, vd = p[a] - p[b], p[c] - p[b], p[d] - p[b]
        n = np.cross(vc, vd)
        s = np.dot(n, va) / (np.linalg.norm(n) * np.linalg.norm(va))
        return abs(np.degrees(np.arcsin(s)))

    e_op = 0.0
    for (a, c, d) in [(1, 2, 3), (2, 1, 3), (3, 1, 2)]:
        x = wdc_chi_deg(lifted, a, 0, c, d)
        e_op += (DEG**2) * 14.40 * x**2 * (
            1 - 0.014 * x + 5.6e-5 * x**2
        )
    e = float(pot.energy_fn(jnp.asarray(lifted)))
    no_op = OPBEND_PRM.replace("14.40", "0.0")
    pot0 = AmoebaValence(no_op, types, bonds)
    e_rest = float(pot0.energy_fn(jnp.asarray(lifted)))
    assert e - e_rest == pytest.approx(e_op, rel=1e-6)


def test_pitors_and_opbend_forces_fd():
    """Ethylene-like fragment: FD forces through opbend + pitors +
    strbnd + the full expansion."""
    prm = OPBEND_PRM + "\nbond 1 1  600.0  1.33\n"
    types = [1, 1, 2, 2, 2, 2]
    bonds = [[0, 1], [0, 2], [0, 3], [1, 4], [1, 5]]
    r0, th = 1.09, np.deg2rad(120.0)
    pos = np.asarray([
        [0.0, 0.0, 0.0],
        [1.33, 0.0, 0.0],
        [-r0 * np.cos(np.pi / 3), r0 * np.sin(np.pi / 3), 0.0],
        [-r0 * np.cos(np.pi / 3), -r0 * np.sin(np.pi / 3), 0.0],
        [1.33 + r0 * np.cos(np.pi / 3), r0 * np.sin(np.pi / 3), 0.02],
        [1.33 + r0 * np.cos(np.pi / 3), -r0 * np.sin(np.pi / 3), -0.03],
    ])
    pot = AmoebaValence(prm, types, bonds)
    assert pot._pitors is not None and pot._opbend is not None
    e0 = float(pot.energy_fn(jnp.asarray(pos)))
    assert np.isfinite(e0) and e0 > 0
    g = np.asarray(jax.grad(pot.energy_fn)(jnp.asarray(pos)))
    for (i, a) in [(0, 2), (4, 2), (2, 0), (5, 1)]:
        h = 1e-6
        pp = pos.copy()
        pp[i, a] += h
        pm = pos.copy()
        pm[i, a] -= h
        fd = (float(pot.energy_fn(jnp.asarray(pp)))
              - float(pot.energy_fn(jnp.asarray(pm)))) / (2 * h)
        assert abs(fd - g[i, a]) < 2e-5 * max(1.0, abs(fd)), (i, a)


def _tortors_prm(fn, n=12, key="1    1    1    1    1"):
    """Synthetic tortors table sampling fn(phi_deg, psi_deg) on an
    (n+1)x(n+1) TINKER-style grid (both +-180 edges listed)."""
    h = 360.0 / n
    lines = [
        "tortorunit              1.0",
        "",
        'atom          1    1    C     "chain atom"      6    12.011    4',
        "",
        f"tortors       {key}       {n + 1}  {n + 1}",
    ]
    for i in range(n + 1):
        for j in range(n + 1):
            x = -180.0 + i * h
            y = -180.0 + j * h
            lines.append(f"  {x:.1f} {y:.1f} {fn(x, y):.10f}")
    return "\n".join(lines)


def _chain_pos(phi, psi):
    """5-atom chain with dihedrals (phi, psi) about the two middle
    bonds (angles in radians)."""
    pos = np.zeros((5, 3))
    pos[1] = [0.0, 0.0, 1.5]
    pos[2] = [0.0, 1.0, 2.5]
    pos[3] = [0.0, 1.0, 4.0]
    # a: set phi about bond b-c; e: set psi about bond c-d
    pos[0] = pos[1] + [np.sin(phi), -np.cos(phi), -1.0]
    pos[4] = pos[3] + [np.sin(psi), np.cos(psi), 1.0]
    return pos


def test_tortors_grid_interpolation_matches_analytic():
    """An asymmetric analytic surface sampled on the tortors grid is
    reproduced by the bicubic interpolation at off-grid chain
    geometries -- pinning axis order, edge dedup and the CMAP reuse."""
    from torchmd_tpu.amoeba_valence import _dihedral

    def f(x_deg, y_deg):
        x, y = np.deg2rad(x_deg), np.deg2rad(y_deg)
        return np.cos(x) + 0.25 * np.sin(y) + 0.1 * np.cos(x + 2 * y)

    prm = _tortors_prm(f, n=24)
    pot = AmoebaValence(prm, [1] * 5, [[0, 1], [1, 2], [2, 3], [3, 4]])
    assert pot._tortors is not None
    assert pot._tortors.idx.shape == (1, 8)

    for phi_d, psi_d in [(0, 0), (67.3, -141.8), (-179.0, 12.0),
                         (100.0, 100.0)]:
        pos = _chain_pos(np.deg2rad(phi_d), np.deg2rad(psi_d))
        pj = jnp.asarray(pos)
        phi = float(_dihedral(pj, jnp.asarray([[0, 1, 2, 3]]))[0])
        psi = float(_dihedral(pj, jnp.asarray([[1, 2, 3, 4]]))[0])
        want = f(np.degrees(phi), np.degrees(psi))
        e = float(pot.energy_fn(pj))
        assert e == pytest.approx(want, abs=5e-3), (phi_d, psi_d)


def test_tortors_reversed_key_and_forces():
    """A table registered under the reversed class tuple matches the
    transposed forward surface; AD forces pass finite differences."""

    def f(x_deg, y_deg):
        x, y = np.deg2rad(x_deg), np.deg2rad(y_deg)
        return np.cos(x) + 0.5 * np.sin(2 * y)

    types = [2, 1, 1, 1, 3]           # asymmetric chain classes
    bonds = [[0, 1], [1, 2], [2, 3], [3, 4]]
    extra = (
        '\natom          2    2    N     "head"      7    14.007    3'
        '\natom          3    3    O     "tail"      8    15.999    1\n'
    )
    fwd = _tortors_prm(f, n=12, key="2    1    1    1    3") + extra
    # reversed key samples the transposed surface
    rev = _tortors_prm(lambda x, y: f(y, x), n=12,
                       key="3    1    1    1    2") + extra
    pot_f = AmoebaValence(fwd, types, bonds)
    pot_r = AmoebaValence(rev, types, bonds)
    pos = _chain_pos(np.deg2rad(55.0), np.deg2rad(-120.0))
    e_f = float(pot_f.energy_fn(jnp.asarray(pos)))
    e_r = float(pot_r.energy_fn(jnp.asarray(pos)))
    assert e_f == pytest.approx(e_r, abs=1e-9)

    g = np.asarray(jax.grad(pot_f.energy_fn)(jnp.asarray(pos)))
    for (i, a) in [(0, 0), (2, 1), (4, 2)]:
        h = 1e-6
        pp = pos.copy()
        pp[i, a] += h
        pm = pos.copy()
        pm[i, a] -= h
        fd = (float(pot_f.energy_fn(jnp.asarray(pp)))
              - float(pot_f.energy_fn(jnp.asarray(pm)))) / (2 * h)
        assert abs(fd - g[i, a]) < 1e-5 * max(1.0, abs(fd))

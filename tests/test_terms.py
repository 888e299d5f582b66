"""Closed-form unit tests for individual force-field terms and the
numerical edge cases SURVEY.md §7 flags (CHARMM ±π wrap, multi-term maps,
switching/RFA boundary behavior)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.potentials import (
    FFParams,
    ForceTermConfig,
    TermTable,
    bond_energy,
    angle_energy,
    torsion_energy,
    compute_potentials,
    nonbonded_energies,
)
from torchmd_tpu.units import ELEC_FACTOR


def _table(idx, params, mapping=None):
    idx = np.asarray(idx)
    params = np.asarray(params, dtype=np.float64)
    if mapping is None:
        mapping = np.stack([np.arange(len(idx)), np.arange(len(params))], 1)
    mapping = np.asarray(mapping)
    return TermTable(
        idx=jnp.asarray(idx, jnp.int32),
        map_term=jnp.asarray(mapping[:, 0], jnp.int32),
        map_param=jnp.asarray(mapping[:, 1], jnp.int32),
        params=jnp.asarray(params),
    )


def test_bond_closed_form():
    pos = jnp.asarray([[0.0, 0, 0], [1.3, 0, 0]])
    t = _table([[0, 1]], [[250.0, 1.0]])
    e = float(bond_energy(t, pos, None))
    assert e == pytest.approx(250.0 * 0.3**2, rel=1e-12)


def test_angle_90_degrees():
    pos = jnp.asarray([[1.0, 0, 0], [0.0, 0, 0], [0, 1.0, 0]])
    theta0 = np.deg2rad(120.0)
    t = _table([[0, 1, 2]], [[60.0, theta0]])
    e = float(angle_energy(t, pos, None))
    expected = 60.0 * (np.pi / 2 - theta0) ** 2
    assert e == pytest.approx(expected, rel=1e-10)


def _dihedral_pos(phi):
    """Quad with dihedral angle phi (radians)."""
    return jnp.asarray([
        [1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [np.cos(phi), 1.0, np.sin(phi)],
    ])


@pytest.mark.parametrize("phi_deg", [0, 60, 120, 179, -179, -60])
def test_amber_torsion_angle_convention(phi_deg):
    """E = k(1 + cos(per*phi - phi0)) with the sign convention of the
    reference's -atan2 formulation."""
    phi = np.deg2rad(phi_deg)
    pos = _dihedral_pos(phi)
    k, per, phi0 = 3.0, 1.0, 0.0
    t = _table([[0, 1, 2, 3]], [[k, phi0, per]])
    e = float(torsion_energy(t, pos, None, amber=True))
    # determine the engine's phi from energy: E = k(1+cos(phi_eng))
    # check against both +-phi (convention fixed by cross-system parity)
    e_expected = k * (1 + np.cos(phi))
    assert e == pytest.approx(e_expected, abs=1e-8)


def test_charmm_torsion_wrap():
    """CHARMM harmonic branch must wrap (phi - phi0) into [-pi, pi]."""
    # _dihedral_pos(x) produces engine dihedral phi = -x (reference
    # -atan2 convention); build engine phi = +170 deg:
    pos = _dihedral_pos(np.deg2rad(-170.0))
    k, phi0 = 5.0, np.deg2rad(-170.0)
    t = _table([[0, 1, 2, 3]], [[k, phi0, 0.0]])
    e = float(torsion_energy(t, pos, None, amber=False))
    # raw diff 340 deg wraps to -20 deg
    expected = k * np.deg2rad(20.0) ** 2
    assert abs(e - expected) < max(1e-6, expected * 1e-6)


def test_multi_term_dihedral_map():
    """One dihedral instance mapped to three parameter rows accumulates all
    terms (the reference's scatter_add indirection)."""
    phi = np.deg2rad(75.0)
    pos = _dihedral_pos(phi)
    params = [[1.0, 0.0, 1.0], [2.0, np.pi, 2.0], [0.5, 0.0, 3.0]]
    mapping = [[0, 0], [0, 1], [0, 2]]
    t = _table([[0, 1, 2, 3]], params, mapping)
    e = float(torsion_energy(t, pos, None, amber=True))
    expected = sum(k * (1 + np.cos(per * phi - p0)) for k, p0, per in params)
    assert e == pytest.approx(expected, abs=1e-8)


def _two_particle_ffp(q0, q1, sigma=3.0, eps=0.2):
    return FFParams(
        charges=jnp.asarray([q0, q1], jnp.float64),
        masses=jnp.ones((2, 1)),
        mapped_atom_types=jnp.asarray([0, 0], jnp.int32),
        lj_params=jnp.asarray([[sigma, eps]], jnp.float64),
        bonds=None, angles=None, dihedrals=None, impropers=None, nb14=None,
        nb_mask=jnp.asarray(~np.eye(2, dtype=bool)),
    )


def test_rfa_vanishes_at_cutoff():
    """The reaction-field potential is constructed to be zero at r = rc."""
    rc = 9.0
    ffp = _two_particle_ffp(0.5, -0.8)
    cfg = ForceTermConfig(terms=("electrostatics",), cutoff=rc, rfa=True)
    pos = jnp.asarray([[0.0, 0, 0], [rc - 1e-9, 0, 0]])
    e = float(nonbonded_energies(ffp, pos, jnp.zeros(3), cfg)["electrostatics"])
    assert abs(e) < 1e-8


def test_lj_switching_continuity():
    """Switched LJ must be continuous at switch_dist and ~0 at cutoff."""
    ffp = _two_particle_ffp(0.0, 0.0)
    cfg = ForceTermConfig(terms=("lj",), cutoff=9.0, switch_dist=7.5)
    cfg_ns = ForceTermConfig(terms=("lj",), cutoff=9.0)

    def e_at(r, c):
        pos = jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
        return float(nonbonded_energies(ffp, pos, jnp.zeros(3), c)["lj"])

    # continuity at the switch distance
    assert abs(e_at(7.5 - 1e-7, cfg) - e_at(7.5 + 1e-7, cfg)) < 1e-9
    # inside the switch region, switched magnitude <= raw magnitude
    assert abs(e_at(8.5, cfg)) < abs(e_at(8.5, cfg_ns))
    # vanishes at the cutoff
    assert abs(e_at(9.0 - 1e-9, cfg)) < 1e-10


def test_coulomb_pair_value():
    ffp = _two_particle_ffp(1.0, -1.0)
    cfg = ForceTermConfig(terms=("electrostatics",))
    pos = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
    e = float(nonbonded_energies(ffp, pos, jnp.zeros(3), cfg)["electrostatics"])
    assert e == pytest.approx(-ELEC_FACTOR / 2.0, rel=1e-12)


def test_minimum_image_wrap():
    """Pair at 0.9*L distance interacts at 0.1*L through the boundary."""
    L = 20.0
    ffp = _two_particle_ffp(1.0, 1.0)
    cfg = ForceTermConfig(terms=("electrostatics",))
    pos = jnp.asarray([[0.5, 0, 0], [L - 1.5, 0, 0]])
    e = float(nonbonded_energies(
        ffp, pos, jnp.asarray([L, L, L]), cfg)["electrostatics"])
    assert e == pytest.approx(ELEC_FACTOR / 2.0, rel=1e-12)

"""Drude-oscillator polarizable electrostatics.

Validation anchors are analytic: the SCF-relaxed oscillator in an
external field must recover U = -alpha E^2 / (2 ELEC_FACTOR) (the
classical induced-dipole energy in this package's units), Thole
screening must vanish at range, and the dual-Langevin integrator must
keep the relative coordinates cold while the physical DOFs thermalize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.potentials import ELEC_FACTOR, FFParams, ForceTermConfig
from torchmd_tpu.drude import (
    DrudeIntegrator,
    drude_energy,
    init_drude_positions,
    make_drude_ffparams,
    scf_drude,
    thole_energy,
)


def _bare_ffparams(charges, alpha_like=None, mask=None, masses=None):
    n = len(charges)
    if mask is None:
        mask = ~np.eye(n, dtype=bool)
    return FFParams(
        charges=jnp.asarray(np.asarray(charges, np.float64)),
        masses=jnp.asarray(
            np.asarray(masses if masses is not None else [40.0] * n,
                       np.float64).reshape(-1, 1)
        ),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.asarray([[1.0, 0.0]]),  # one dummy zero-eps type
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None, nb_mask=jnp.asarray(mask),
    )


CFG = ForceTermConfig(terms=("electrostatics", "bonds"))


def test_induced_dipole_scf_energy():
    """One neutral polarizable atom + a distant unit charge: the relaxed
    oscillator energy equals -alpha E^2 / (2 ELEC_FACTOR)."""
    alpha, R, Q = 1.5, 10.0, 1.0
    ffp = _bare_ffparams([0.0, Q])
    ffp_ext, spec = make_drude_ffparams(ffp, [alpha, 0.0])
    # charge bookkeeping: totals preserved, dipole is neutral
    q = np.asarray(ffp_ext.charges)
    np.testing.assert_allclose(q.sum(), Q, atol=1e-12)
    np.testing.assert_allclose(q[0] + q[2], 0.0, atol=1e-12)
    # alpha reproduced by the charge/spring combination
    np.testing.assert_allclose(
        ELEC_FACTOR * q[2] ** 2 / (2.0 * spec.k_drude), alpha, rtol=1e-12
    )

    pos = jnp.asarray([[0.0, 0.0, 0.0], [R, 0.0, 0.0]])
    p0 = init_drude_positions(pos, spec)
    e0 = float(drude_energy(ffp_ext, spec, CFG, p0, None))
    p_min = scf_drude(ffp_ext, spec, CFG, p0, None)
    e_min = float(drude_energy(ffp_ext, spec, CFG, p_min, None))

    E_field = ELEC_FACTOR * Q / R**2
    u_ind = -alpha * E_field**2 / (2.0 * ELEC_FACTOR)
    # e0 already contains the (neutral-dipole x charge) energy = 0
    np.testing.assert_allclose(e0, 0.0, atol=1e-10)
    # small higher-order corrections from field inhomogeneity: ~d/R
    np.testing.assert_allclose(e_min, u_ind, rtol=2e-2)
    # the Drude displaced toward the positive charge (q_D < 0)
    d = np.asarray(p_min)[2] - np.asarray(p_min)[0]
    assert d[0] > 1e-4 and abs(d[1]) < 1e-8 and abs(d[2]) < 1e-8


def test_thole_screening_limits():
    """Bonded (excluded) polarizable pair: S(u) -> 1 at range (unscreened
    4-charge sum), -> 0 at contact (no divergence)."""
    mask = np.zeros((2, 2), bool)  # the pair is excluded -> Thole couples
    ffp = _bare_ffparams([0.0, 0.0], mask=mask)
    ffp_ext, spec = make_drude_ffparams(ffp, [1.0, 1.0], thole=2.6)
    assert spec.thole_i is not None and len(spec.thole_i) == 1

    # displace both Drudes into fixed dipoles and compare with the bare
    # Coulomb sum of the four charge pairs at large separation
    def four_pair_sum(p):
        qd = np.asarray(spec.q_drude)
        pairs = [
            (2, 3, qd[0] * qd[1]), (2, 1, -qd[0] * qd[1]),
            (0, 3, -qd[0] * qd[1]), (0, 1, qd[0] * qd[1]),
        ]
        return sum(
            ELEC_FACTOR * qq / np.linalg.norm(p[a] - p[b])
            for a, b, qq in pairs
        )

    for R, rtol in ((40.0, 1e-8), (15.0, 1e-4)):
        p = np.zeros((4, 3))
        p[1] = [R, 0, 0]
        p[2] = [0.15, 0, 0]       # Drude of atom 0, displaced
        p[3] = [R + 0.1, 0.1, 0]  # Drude of atom 1
        e_thole = float(thole_energy(spec, jnp.asarray(p), None))
        np.testing.assert_allclose(e_thole, four_pair_sum(p), rtol=rtol)

    # at contact the screened interaction stays finite
    p = np.zeros((4, 3))
    p[1] = [1e-3, 0, 0]
    p[2] = [0.05, 0, 0]
    p[3] = [1e-3, 0.05, 0]
    assert np.isfinite(float(thole_energy(spec, jnp.asarray(p), None)))


def test_dual_langevin_keeps_drudes_cold():
    """A 16-atom polarizable gas at 300 K: physical temperature
    thermalizes near 300 K while the relative (Drude) temperature stays
    near T_drude."""
    rs = np.random.RandomState(3)
    n = 16
    g = np.arange(4) * 4.0  # 4 A lattice spacing: no LJ-core overlaps
    pos = np.stack(np.meshgrid(g, g, [0.0, 4.0][:1], indexing="ij"),
                   axis=-1).reshape(-1, 3)[:n]
    pos = np.concatenate([pos, pos + [0.0, 0.0, 4.0]])[:n]
    charges = rs.randn(n) * 0.2
    charges -= charges.mean()
    ffp = _bare_ffparams(charges.tolist())
    # LJ cores keep opposite charges from collapsing into the 1/r well
    ffp = ffp._replace(lj_params=jnp.asarray([[3.0, 0.2]]))
    ffp_ext, spec = make_drude_ffparams(ffp, [0.8] * n)
    cfg = ForceTermConfig(terms=("lj", "electrostatics", "bonds"),
                          cutoff=6.0)
    p0 = init_drude_positions(jnp.asarray(pos), spec)
    integ = DrudeIntegrator(ffp_ext, spec, cfg, p0, box=None,
                            timestep=1.0, T=300.0, gamma=5.0,
                            T_drude=1.0, gamma_drude=20.0, seed=5)
    integ.set_velocities_boltzmann(seed=5)
    for _ in range(3):
        ke, ep, T_phys, T_rel = integ.step(niter=300)
    assert np.isfinite(ep)
    assert 150.0 < T_phys < 500.0, T_phys
    assert T_rel < 60.0, T_rel  # cold bath keeps oscillators adiabatic


def test_drude_validation():
    ffp = _bare_ffparams([0.0, 0.5])
    with pytest.raises(ValueError, match="alpha == 0"):
        make_drude_ffparams(ffp, [0.0, 0.0])
    with pytest.raises(ValueError, match=">= 0"):
        make_drude_ffparams(ffp, [-1.0, 0.0])
    ffp_ext, spec = make_drude_ffparams(ffp, [1.0, 0.0])
    with pytest.raises(ValueError, match="bonds"):
        drude_energy(ffp_ext, spec,
                     ForceTermConfig(terms=("electrostatics",)),
                     init_drude_positions(jnp.zeros((2, 3)), spec), None)


def test_drude_mass_partition_and_spring_table():
    ffp = _bare_ffparams([0.1, -0.1], masses=[16.0, 12.0])
    ffp_ext, spec = make_drude_ffparams(ffp, [1.0, 0.7], m_drude=0.4)
    m = np.asarray(ffp_ext.masses).ravel()
    np.testing.assert_allclose(m, [15.6, 11.6, 0.4, 0.4])
    assert ffp_ext.bonds is not None
    idx = np.asarray(ffp_ext.bonds.idx)
    np.testing.assert_array_equal(idx, [[0, 2], [1, 3]])
    # spring energy: E = k0 d^2 at r0 = 0
    p = init_drude_positions(jnp.zeros((2, 3)), spec)
    p = p.at[2, 0].set(0.1)
    from torchmd_tpu.potentials import compute_potentials

    pot = compute_potentials(ffp_ext, p, None,
                             ForceTermConfig(terms=("bonds",)))
    np.testing.assert_allclose(float(pot["bonds"]), 500.0 * 0.01,
                               rtol=1e-10)


def test_yaml_polarizabilities_to_drude(tmp_path):
    """YAML FF `polarizabilities:` section -> Parameters.alpha ->
    make_drude(forces) end-to-end, with a per-type Thole factor."""
    import os

    import yaml

    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters
    from conftest import SYSTEMS_DIR

    with open(os.path.join(SYSTEMS_DIR, "argon",
                           "argon_forcefield.yaml")) as fh:
        ff_dict = yaml.safe_load(fh)
    at = list(ff_dict["atomtypes"])[0]
    ff_dict["polarizabilities"] = {at: {"alpha": 1.6, "thole": 1.3}}
    ff_path = tmp_path / "polar.yaml"
    ff_path.write_text(yaml.safe_dump(ff_dict))

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(mol, str(ff_path))
    par = Parameters(ff, mol, ["lj", "bonds"], precision="double")
    assert par.alpha is not None
    np.testing.assert_allclose(par.alpha, 1.6)
    np.testing.assert_allclose(par.thole, 1.3)

    forces = Forces(par, terms=["lj", "electrostatics", "bonds"],
                    precision="double", cutoff=9.0)
    from torchmd_tpu.drude import make_drude

    ffp_ext, spec = make_drude(forces)
    assert len(np.asarray(spec.core_idx)) == mol.numAtoms
    np.testing.assert_allclose(np.asarray(spec.alpha), 1.6)
    # per-atom thole combine: u coeff = (1.3 + 1.3)/(1.6*1.6)^(1/6)
    if spec.thole_coeff is not None:
        np.testing.assert_allclose(
            np.asarray(spec.thole_coeff),
            2.6 / (1.6 * 1.6) ** (1 / 6.0), rtol=1e-12,
        )


def test_drude_forces_match_finite_difference():
    """AD forces through the full Drude energy (springs + Coulomb +
    Thole) against central finite differences."""
    mask = np.zeros((3, 3), bool)
    mask[0, 2] = mask[2, 0] = True  # one real nonbonded pair
    ffp = _bare_ffparams([0.1, -0.2, 0.1], mask=mask)
    ffp_ext, spec = make_drude_ffparams(ffp, [1.0, 0.8, 0.0])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [3.5, 0.2, -0.1],
                       [7.1, -0.3, 0.4]])
    p = init_drude_positions(pos, spec)
    p = p.at[3, 0].add(0.05).at[4, 1].add(-0.04)  # displaced Drudes

    def e(q):
        return drude_energy(ffp_ext, spec, CFG, q, None)

    g = np.asarray(jax.grad(e)(p))
    h = 1e-6
    rs = np.random.RandomState(0)
    for _ in range(6):
        i, k = rs.randint(p.shape[0]), rs.randint(3)
        dp = np.zeros_like(np.asarray(p))
        dp[i, k] = h
        fd = (float(e(p + dp)) - float(e(p - dp))) / (2 * h)
        np.testing.assert_allclose(g[i, k], fd, rtol=1e-6, atol=1e-9)


def test_drude_ewald_dilute_limit():
    """Periodic Drude electrostatics (erfc real space + reciprocal
    engine from make_drude_ewald) converges to the open-boundary SCF
    energy as the box dilutes, exercising the extended-topology
    exclusion correction (oscillator + bonded pairs) and the Thole
    terms under Ewald."""
    from torchmd_tpu.drude import make_drude_ewald

    # a polarizable 3-charge cluster with one excluded (bonded) pair
    charges = [0.4, -0.4, 0.0]
    mask = ~np.eye(3, dtype=bool)
    mask[0, 1] = mask[1, 0] = False          # bonded pair -> Thole couples
    ffp = _bare_ffparams(charges, mask=mask)
    ffp_ext, spec = make_drude_ffparams(ffp, [0.9, 0.7, 1.1])
    assert spec.thole_i is not None
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.2, 0.4, 0.1],
                       [3.1, 0.8, -0.5]])
    p0 = init_drude_positions(pos, spec)

    cfg_open = ForceTermConfig(terms=("electrostatics", "bonds"))
    p_min = scf_drude(ffp_ext, spec, cfg_open, p0, None)
    e_open = float(drude_energy(ffp_ext, spec, cfg_open, p_min, None))

    gaps = []
    for L in (20.0, 40.0):
        box = np.asarray([L] * 3)
        cut = min(9.0, L / 2 - 1.0)
        recip, alpha = make_drude_ewald(ffp_ext, box, cut, tol=1e-7)
        cfg = ForceTermConfig(terms=("electrostatics", "bonds"),
                              cutoff=cut, ewald_alpha=alpha)
        pc = p0 + L / 2.0
        pm = scf_drude(ffp_ext, spec, cfg, pc, jnp.asarray(box),
                       recip=recip)
        e = float(drude_energy(ffp_ext, spec, cfg, pm, jnp.asarray(box),
                               recip=recip))
        gaps.append(abs(e - e_open))
    assert gaps[1] < gaps[0] / 2.0
    assert gaps[1] < 5e-3 * max(1.0, abs(e_open))


def test_drude_ewald_requires_recip():
    """cfg.ewald_alpha without a reciprocal engine is rejected (erfc
    real space alone is not valid electrostatics)."""
    ffp = _bare_ffparams([0.1, -0.1])
    ffp_ext, spec = make_drude_ffparams(ffp, [0.5, 0.5])
    cfg = ForceTermConfig(terms=("electrostatics", "bonds"),
                          cutoff=6.0, ewald_alpha=0.3)
    p0 = init_drude_positions(
        jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]]), spec
    )
    with pytest.raises(ValueError):
        drude_energy(ffp_ext, spec, cfg, p0, jnp.asarray([15.0] * 3))


def test_drude_ewald_integrator_smoke():
    """DrudeIntegrator with a periodic reciprocal engine runs the
    dual-Langevin scan stably."""
    from torchmd_tpu.drude import make_drude_ewald

    rs = np.random.RandomState(5)
    n = 8
    L = 12.0
    g = np.arange(2) * 4.0 + 2.0          # 4 A lattice, no core overlap
    pos = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:n]
    charges = rs.randn(n) * 0.2
    charges -= charges.mean()
    ffp = _bare_ffparams(charges.tolist())
    ffp = ffp._replace(lj_params=jnp.asarray([[3.0, 0.1]]))
    ffp_ext, spec = make_drude_ffparams(ffp, [0.6] * n)
    box = np.asarray([L] * 3)
    recip, alpha = make_drude_ewald(ffp_ext, box, 5.0, tol=1e-5)
    cfg = ForceTermConfig(terms=("lj", "electrostatics", "bonds"),
                          cutoff=5.0, ewald_alpha=alpha)
    p0 = init_drude_positions(jnp.asarray(pos), spec)
    integ = DrudeIntegrator(ffp_ext, spec, cfg, p0, box=box,
                            timestep=1.0, T=300.0, T_drude=1.0,
                            recip=recip)
    integ.set_velocities_boltzmann(seed=2)
    for _ in range(3):
        ek, ep, t_phys, t_rel = integ.step(20)
        assert np.isfinite(ep) and np.isfinite(t_phys)
    assert t_rel < 150.0       # relative coordinates stay cold

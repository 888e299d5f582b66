"""Ewald electrostatics validation.

The strongest checks need no external oracle:
  - the NaCl Madelung constant (exact lattice-sum result),
  - invariance of the total to the splitting parameter alpha / cutoff,
  - autodiff forces vs numerical differentiation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.ewald import (
    EwaldRecip,
    choose_parameters,
    ewald_real_pair_energy,
    madelung_nacl,
)
from torchmd_tpu.units import ELEC_FACTOR

MADELUNG = 1.7475645946331822


def _total_energy(pos, q, box, cutoff, tol=1e-7, excl=None):
    """real (direct masked double loop over minimum images) + recip."""
    pos = jnp.asarray(pos, jnp.float64)
    q = jnp.asarray(q, jnp.float64)
    box = jnp.asarray(box, jnp.float64)
    rec = EwaldRecip(q, box, cutoff, excl_pairs=excl, tol=tol,
                     dtype=jnp.float64)
    alpha = rec.cfg.alpha

    def e_real(p):
        dv = p[:, None, :] - p[None, :, :]
        dv = dv - box * jnp.round(dv / box)
        d2 = jnp.sum(dv * dv, axis=-1)
        n = p.shape[0]
        mask = ~jnp.eye(n, dtype=bool)
        if excl is not None:
            m = np.ones((n, n), dtype=bool)
            for a, b in excl:
                m[a, b] = m[b, a] = False
            mask = mask & jnp.asarray(m)
        d2 = jnp.where(mask, d2, 1.0)
        d = jnp.sqrt(d2)
        rinv = 1.0 / d
        qq = ELEC_FACTOR * q[:, None] * q[None, :]
        pot = ewald_real_pair_energy(qq, d, rinv, alpha)
        pot = jnp.where(mask & (d <= cutoff), pot, 0.0)
        return 0.5 * jnp.sum(pot)

    def e_tot(p):
        return e_real(p) + rec.energy(p, box)

    return e_tot(pos), e_tot


def test_madelung_constant():
    pos, q, box = madelung_nacl(a=5.64)
    e, _ = _total_energy(pos, q, box, cutoff=2.8)
    r0 = 5.64 / 2
    exact = -MADELUNG * ELEC_FACTOR * 8 / (2 * r0)  # 8 ions, E per pair *4
    np.testing.assert_allclose(float(e), exact, rtol=1e-6)


def test_alpha_independence():
    """The Ewald total must not depend on the real/reciprocal split."""
    rs = np.random.RandomState(0)
    n = 24
    box = np.array([11.0, 13.0, 12.0])
    pos = rs.rand(n, 3) * box
    q = rs.randn(n)
    q -= q.mean()  # neutral

    e1, _ = _total_energy(pos, q, box, cutoff=3.5, tol=1e-8)
    e2, _ = _total_energy(pos, q, box, cutoff=5.5, tol=1e-8)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-6)


def test_charged_system_background():
    """Non-neutral systems get the uniform-background correction and stay
    alpha-independent."""
    rs = np.random.RandomState(1)
    n = 16
    box = np.array([10.0, 10.0, 10.0])
    pos = rs.rand(n, 3) * box
    q = np.abs(rs.randn(n))  # net positive

    e1, _ = _total_energy(pos, q, box, cutoff=3.0, tol=1e-8)
    e2, _ = _total_energy(pos, q, box, cutoff=4.5, tol=1e-8)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-5)


def test_forces_match_numerical():
    rs = np.random.RandomState(2)
    n = 8
    box = np.array([9.0, 9.0, 9.0])
    pos = rs.rand(n, 3) * box
    q = rs.randn(n)
    q -= q.mean()

    e0, e_tot = _total_energy(pos, q, box, cutoff=3.0, tol=1e-8)
    g = jax.grad(e_tot)(jnp.asarray(pos))
    # numerical gradient on a few components
    h = 1e-5
    for (i, k) in [(0, 0), (3, 1), (7, 2)]:
        dp = np.zeros_like(pos)
        dp[i, k] = h
        ep = float(e_tot(jnp.asarray(pos + dp)))
        em = float(e_tot(jnp.asarray(pos - dp)))
        num = (ep - em) / (2 * h)
        np.testing.assert_allclose(float(g[i, k]), num, rtol=1e-5, atol=1e-7)


def test_exclusions_cancel():
    """An excluded pair must contribute nothing to the Ewald total:
    compare against the same system evaluated with the pair's charges off."""
    rs = np.random.RandomState(3)
    box = np.array([12.0, 12.0, 12.0])
    n = 10
    pos = rs.rand(n, 3) * box
    pos[1] = pos[0] + [1.0, 0, 0]  # close excluded pair
    q = rs.randn(n)

    excl = [(0, 1)]
    e_with, _ = _total_energy(pos, q, box, cutoff=4.0, tol=1e-8, excl=excl)

    # direct check: total with exclusion == limit where the 0-1 interaction
    # is absent. Build it by superposition: E(all) - E(pair 0,1 alone
    # interacting) is not separable in Ewald, so instead verify the
    # exclusion is alpha-independent too (it only cancels correctly if the
    # erf correction matches the reciprocal contribution of that pair).
    e_with2, _ = _total_energy(pos, q, box, cutoff=6.0, tol=1e-8, excl=excl)
    np.testing.assert_allclose(float(e_with), float(e_with2), rtol=1e-6)


def test_forces_ewald_mode_end_to_end():
    """elec='ewald' through the Forces/Integrator stack: total energy is
    cutoff-split independent, and NVE dynamics conserve energy."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from common import ALL_TERMS, load_system
    from conftest import DATA_DIR
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol, ff, _ = load_system(os.path.join(DATA_DIR, "2watersperiodic"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    pos = mol.coords[:, :, 0][None]
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], mol.box[:, 0])

    def etot(cutoff):
        f = Forces(par, terms=ALL_TERMS, precision="double",
                   cutoff=cutoff, elec="ewald")
        det = f.compute(pos, box, returnDetails=True)[0]
        return det

    d1 = etot(6.0)
    d2 = etot(8.0)
    # electrostatics alpha-split independent; lj changes with cutoff a bit
    assert abs(d1["electrostatics"] - d2["electrostatics"]) < 1e-4, (
        d1["electrostatics"], d2["electrostatics"]
    )

    # NVE conservation through the scan path
    f = Forces(par, terms=ALL_TERMS, precision="double", cutoff=8.0,
               elec="ewald")
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(maxwell_boltzmann(par.masses, 100, 1, seed=0))
    integ = Integrator(system, f, timestep=0.5, device="cpu")
    etots = []
    for _ in range(4):
        Ekin, Epot, T = integ.step(niter=20)
        etots.append(float(Epot[0] + Ekin[0]))
    assert abs(etots[-1] - etots[0]) < 0.05, etots


def test_ewald_with_constraints_nve():
    """Cross-feature integration: Ewald electrostatics + SHAKE-rigid water
    conserve energy at 2 fs NVE."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from common import ALL_TERMS, load_system
    from conftest import DATA_DIR
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol, ff, _ = load_system(os.path.join(DATA_DIR, "2watersperiodic"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", cutoff=8.0,
                    elec="ewald")
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(maxwell_boltzmann(par.masses, 150, 1, seed=2))
    integ = Integrator(system, forces, timestep=2.0, device="cpu",
                       constraints="allbonds")
    etots = []
    for _ in range(5):
        Ekin, Epot, T = integ.step(niter=25)
        etots.append(float(Epot[0] + Ekin[0]))
    assert np.isfinite(etots).all()
    assert abs(etots[-1] - etots[0]) < 0.05, etots


# ----------------------------------------------------------------------
# PME (smooth particle-mesh Ewald)
# ----------------------------------------------------------------------

def _nacl_supercell(reps=2, jitter=0.0, seed=0):
    from torchmd_tpu.ewald import madelung_nacl

    pos, q, box = madelung_nacl()
    pos2 = np.concatenate([
        pos + np.array([i, j, k]) * box
        for i in range(reps) for j in range(reps) for k in range(reps)
    ])
    q2 = np.tile(q, reps**3)
    if jitter:
        pos2 = pos2 + np.random.RandomState(seed).randn(*pos2.shape) * jitter
    return pos2, q2, box * reps


def test_pme_matches_ewald_energy_and_forces():
    from torchmd_tpu.ewald import PmeRecip

    pos, q, box = _nacl_supercell(jitter=0.3)
    er = EwaldRecip(q, box, 5.0, tol=1e-6, dtype=jnp.float64)
    pm = PmeRecip(q, box, 5.0, tol=1e-6, dtype=jnp.float64)
    assert pm.cfg.alpha == er.cfg.alpha  # identical real-space split
    p, b = jnp.asarray(pos), jnp.asarray(box)
    e1, e2 = float(er.energy(p, b)), float(pm.energy(p, b))
    assert abs(e1 - e2) / abs(e1) < 5e-5
    g1 = jax.grad(lambda x: er.energy(x, b))(p)
    g2 = jax.grad(lambda x: pm.energy(x, b))(p)
    scale = float(jnp.max(jnp.abs(g1)))
    assert float(jnp.max(jnp.abs(g1 - g2))) < 5e-4 * scale


def test_pme_spread_variants_equivalent():
    """All three spreading formulations — MXU matmul (the TPU default),
    windowed scatter-add, scalar segment_sum — are bit-level equivalent
    in f64: values AND position-gradients, at both spline orders,
    including atoms exactly on mesh nodes and in the wrap bands."""
    from torchmd_tpu.ewald import PmeRecip

    pos, q, box = _nacl_supercell(jitter=0.3)
    pos = np.concatenate([pos, [[0.0, 0.0, 0.0],           # mesh node
                                [box[0] - 1e-4, 0.1, 0.2]]])  # wrap band
    q = np.concatenate([q, [0.7, -0.7]])
    b = jnp.asarray(box)
    rs = np.random.RandomState(3)
    for order in (4, 6):
        pm = PmeRecip(q, box, 5.0, tol=1e-6, dtype=jnp.float64,
                      order=order)
        p = jnp.asarray(pos)
        qd = jnp.asarray(q, jnp.float64)
        m_s = pm._spread_segsum(p, b, qd)
        scale = float(jnp.max(jnp.abs(m_s)))
        probe = jnp.asarray(rs.randn(*m_s.shape))
        g_s = jax.grad(
            lambda x: jnp.vdot(probe, pm._spread_segsum(x, b, qd)))(p)
        gscale = float(jnp.max(jnp.abs(g_s)))
        for variant in (pm._spread_matmul, pm._spread_scatter):
            m_v = variant(p, b, qd)
            assert float(jnp.max(jnp.abs(m_v - m_s))) < 1e-12 * scale, (
                variant.__name__)
            # gradients through each formulation agree (probe: a fixed
            # random linear functional of the mesh)
            g_v = jax.grad(
                lambda x, v=variant: jnp.vdot(probe, v(x, b, qd)))(p)
            assert float(jnp.max(jnp.abs(g_v - g_s))) < 1e-11 * max(
                gscale, 1.0), variant.__name__
        assert pm.spread_mode == "matmul"  # the default routes to MXU


def test_pme_analytic_energy_forces_match_ad():
    """PmeRecip.energy_forces (analytic stacked-gather formulation, the
    hot path of the production waterbox step) matches value_and_grad of
    .energy to f64 roundoff — both spline orders, exclusion pairs, atoms
    on mesh nodes and in the wrap bands. EwaldRecip.energy_forces (the
    AD fallback spelling) is covered for interface parity."""
    from torchmd_tpu.ewald import PmeRecip

    pos, q, box = _nacl_supercell(jitter=0.3)
    pos = np.concatenate([pos, [[0.0, 0.0, 0.0],             # mesh node
                                [box[0] - 1e-4, 0.1, 0.2]]])  # wrap band
    q = np.concatenate([q, [0.7, -0.7]])
    excl = np.array([[0, 1], [2, 3], [len(q) - 2, len(q) - 1]])
    b = jnp.asarray(box)
    p = jnp.asarray(pos)
    for order in (4, 6):
        pm = PmeRecip(q, box, 5.0, tol=1e-6, dtype=jnp.float64,
                      order=order, excl_pairs=excl)
        e_ad, g_ad = jax.value_and_grad(pm.energy)(p, b)
        e_an, f_an = pm.energy_forces(p, b)
        assert abs(float(e_an - e_ad)) < 1e-10 * abs(float(e_ad))
        scale = float(jnp.max(jnp.abs(g_ad)))
        assert float(jnp.max(jnp.abs(f_an + g_ad))) < 1e-10 * scale

    er = EwaldRecip(q, box, 5.0, tol=1e-6, dtype=jnp.float64,
                    excl_pairs=excl)
    e_ad, g_ad = jax.value_and_grad(er.energy)(p, b)
    e_an, f_an = er.energy_forces(p, b)
    assert float(e_an) == float(e_ad)
    np.testing.assert_allclose(np.asarray(f_an), -np.asarray(g_ad))


def test_pme_madelung():
    """Full electrostatic energy through the PME path reproduces the NaCl
    Madelung constant (jittered off the mesh knots: AD at exact B-spline
    knot positions is a measure-zero artifact)."""
    from torchmd_tpu.ewald import PmeRecip

    pos, q, box = _nacl_supercell(reps=2)
    a = box[0] / 2  # conventional cell edge
    cutoff = 5.0
    e_exact = -MADELUNG * ELEC_FACTOR * len(q) / (a / 2) / 2.0

    pm = PmeRecip(q, box, cutoff, tol=1e-7, dtype=jnp.float64)
    alpha = pm.cfg.alpha
    p = jnp.asarray(pos, jnp.float64)
    b = jnp.asarray(box, jnp.float64)

    def e_real(x):
        dv = x[:, None, :] - x[None, :, :]
        dv = dv - b * jnp.round(dv / b)
        d2 = jnp.sum(dv * dv, axis=-1)
        n = x.shape[0]
        mask = ~jnp.eye(n, dtype=bool)
        d2 = jnp.where(mask, d2, 1.0)
        d = jnp.sqrt(d2)
        qq = ELEC_FACTOR * jnp.asarray(q)[:, None] * jnp.asarray(q)[None, :]
        pot = ewald_real_pair_energy(qq, d, 1.0 / d, alpha)
        return 0.5 * jnp.sum(jnp.where(mask & (d <= cutoff), pot, 0.0))

    e_tot = float(e_real(p) + pm.energy(p, b))
    np.testing.assert_allclose(e_tot, e_exact, rtol=2e-5)


def test_forces_elec_pme_matches_ewald():
    """Forces(elec='pme') reproduces Forces(elec='ewald') energies/forces
    on alanine dipeptide (VERDICT: 'alanine Ewald energies unchanged')."""
    import os as _os

    from conftest import DATA_DIR
    from common import ALL_TERMS, load_system
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters

    mol, ff, nbconf = load_system(
        _os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")
    )
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    pos = mol.coords[:, :, 0][None]
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], mol.box[:, 0])

    def run(mode):
        f = Forces(par, terms=ALL_TERMS, precision="double", cutoff=9.0,
                   switch_dist=7.5, elec=mode)
        e = f.compute(pos, box, returnDetails=True)[0]
        return e, np.asarray(f.last_forces)

    e_w, f_w = run("ewald")
    e_p, f_p = run("pme")
    for k in e_w:
        scale = max(1.0, abs(e_w[k]))
        assert abs(e_w[k] - e_p[k]) < 2e-4 * scale, (k, e_w[k], e_p[k])
    np.testing.assert_allclose(f_p, f_w, atol=2e-4 * np.abs(f_w).max())


def test_pme_force_on_mesh_node_atom():
    """AD forces are correct for an atom sitting EXACTLY on a PME mesh
    node: the spline taps land on the Cox-de Boor knots there, and
    plain AD picks a wrong one-sided subgradient (sum of derivative
    taps -1 instead of 0). bspline_weights carries a custom JVP with
    the analytic recursion M_n' = M_{n-1}(u) - M_{n-1}(u-1); this
    pins it against central differences."""
    from torchmd_tpu.ewald import PmeRecip, bspline_weights

    # the derivative-tap sum rule at the knot itself
    dw = jax.jacfwd(lambda x: bspline_weights(x, 6))(jnp.asarray([0.0]))
    assert abs(float(jnp.sum(dw[0, :, 0]))) < 1e-14

    L = 20.0
    box = np.asarray([L] * 3)
    q = np.asarray([0.5, -0.5, 0.3, -0.3])
    pme = PmeRecip(q, box, cutoff=9.0, tol=1e-6)
    Kx, Ky, Kz = pme.cfg.kmax
    pos = np.asarray([
        [4 * L / Kx, 6 * L / Ky, 8 * L / Kz],   # exactly on a node
        [7.3, 11.1, 3.9], [12.7, 6.2, 15.5], [2.2, 17.8, 9.4],
    ])
    efn = lambda p: pme.energy(p, jnp.asarray(box))
    g = np.asarray(jax.grad(efn)(jnp.asarray(pos)))
    for a in range(3):
        eps = 1e-5
        pp = pos.copy()
        pp[0, a] += eps
        pm = pos.copy()
        pm[0, a] -= eps
        fd = (float(efn(jnp.asarray(pp)))
              - float(efn(jnp.asarray(pm)))) / (2 * eps)
        assert abs(g[0, a] - fd) < 1e-6 * max(1.0, abs(fd))


def test_pme_strided_exclusion_corrections_match_gather():
    """The uniform-solvent strided exclusion fast path (_corrections,
    detected via _detect_strided_pairs) must equal the general gather
    formulation in value and gradient."""
    import os

    from torchmd_tpu.ewald import PmeRecip, _detect_strided_pairs

    rng = np.random.default_rng(5)
    nmol, s = 23, 4
    n = nmol * s
    box = np.array([14.0, 14.0, 14.0])
    pos = rng.random((n, 3)) * box
    q = rng.random(n) - 0.5
    loc = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pairs = [(m * s + a, m * s + b) for m in range(nmol) for a, b in loc]
    lay = _detect_strided_pairs(np.asarray(pairs), n)
    assert lay is not None and lay[0] == 0 and lay[1] == s
    assert lay[2] == nmol and sorted(lay[3]) == sorted(loc)

    rec = PmeRecip(q, box, cutoff=4.0, order=4, dtype=jnp.float64,
                   excl_pairs=pairs)
    assert rec._excl_strided is not None
    pj, bj = jnp.asarray(pos), jnp.asarray(box)
    qj = rec.charges

    def corr(p):
        return rec._corrections(p, bj, qj)

    e_s, g_s = jax.value_and_grad(corr)(pj)
    os.environ["TMD_PME_EXCL_STRIDED"] = "0"
    try:
        e_g, g_g = jax.value_and_grad(corr)(pj)
    finally:
        del os.environ["TMD_PME_EXCL_STRIDED"]
    assert abs(float(e_s) - float(e_g)) < 1e-11 * max(1.0, abs(float(e_g)))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               atol=1e-12)
    # a non-uniform pattern must decline the fast path
    assert _detect_strided_pairs(
        np.asarray(pairs[:-1]), n) is None

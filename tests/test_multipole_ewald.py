"""Multipole Ewald: charge-limit consistency with the charge Ewald
module, splitting-parameter (alpha) invariance, nested-AD self terms vs
closed forms, the isolated-pair limit against the real-space multipole
module, and finite-difference forces through the local frames."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.ewald import EwaldRecip
from torchmd_tpu.multipoles import (
    FRAME_NONE,
    FRAME_Z_THEN_X,
    MultipoleSpec,
    Multipoles,
)
from torchmd_tpu.multipole_ewald import (
    MultipoleEwald,
    _g_erf,
    _self_energy,
)
from torchmd_tpu.potentials import ELEC_FACTOR


def _spec(n, sites, mu, frame=None, z=None, x=None, quad=None,
          nb_mask=None, cutoff=None):
    ns = len(sites)
    if nb_mask is None:
        nb_mask = jnp.ones((n, n), bool) & ~jnp.eye(n, dtype=bool)
    return MultipoleSpec(
        sites=jnp.asarray(sites, jnp.int32),
        mu_local=jnp.asarray(mu, jnp.float64).reshape(ns, 3),
        frame_kind=jnp.asarray(
            frame if frame is not None else [FRAME_NONE] * ns, jnp.int32
        ),
        z_atom=jnp.asarray(z if z is not None else sites, jnp.int32),
        x_atom=jnp.asarray(
            x if x is not None else (z if z is not None else sites),
            jnp.int32,
        ),
        nb_mask=nb_mask,
        cutoff=cutoff,
        quad_local=None if quad is None else jnp.asarray(quad),
    )


def _random_system(n=24, L=18.0, seed=0, neutral=True):
    rs = np.random.RandomState(seed)
    pos = rs.rand(n, 3) * L
    q = rs.randn(n) * 0.3
    if neutral:
        q -= q.mean()
    return jnp.asarray(pos), jnp.asarray(q), jnp.asarray([L] * 3)


def _charge_ewald_total(q, pos, box, cutoff, tol, nb_mask):
    """Reference total: existing charge Ewald recip/self/excl + an
    explicit erfc real-space sum over non-excluded pairs in cutoff."""
    n = q.shape[0]
    mask = np.asarray(nb_mask)
    iu, ju = np.triu_indices(n, 1)
    excl = np.stack([iu[~mask[iu, ju]], ju[~mask[iu, ju]]], 1)
    rec = EwaldRecip(q, np.asarray(box), cutoff,
                     excl_pairs=excl if len(excl) else None, tol=tol,
                     dtype=jnp.float64)
    alpha = rec.cfg.alpha
    e = rec.energy(pos, box)
    dv = pos[iu] - pos[ju]
    dv = dv - box * jnp.round(dv / box)
    r = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
    keep = jnp.asarray(mask[iu, ju]) & (r <= cutoff)
    qq = q[iu] * q[ju]
    e_real = jnp.sum(
        jnp.where(
            keep,
            ELEC_FACTOR * qq * jax.scipy.special.erfc(alpha * r) / r,
            0.0,
        )
    )
    return float(e + e_real)


def test_charge_limit_matches_charge_ewald():
    """With zero dipoles/quadrupoles the multipole Ewald must reproduce
    the charge-only Ewald module exactly (same alpha/kmax heuristics)."""
    pos, q, box = _random_system(n=20, L=16.0, seed=1)
    # a few excluded pairs exercise the erf correction tier
    nb = np.ones((20, 20), bool)
    np.fill_diagonal(nb, False)
    for a, b in [(0, 1), (2, 3), (4, 7)]:
        nb[a, b] = nb[b, a] = False
    nb = jnp.asarray(nb)
    spec = _spec(20, [0], [[0.0, 0.0, 0.0]], nb_mask=nb)
    me = MultipoleEwald(spec, q, np.asarray(box), cutoff=7.0, tol=1e-6)
    e_mp = float(me.energy_fn(pos, box))
    e_ref = _charge_ewald_total(q, pos, box, 7.0, 1e-6, nb)
    assert e_mp == pytest.approx(e_ref, rel=1e-10)


def test_alpha_invariance_with_dipoles_and_quads():
    """The real/reciprocal/self split must be invariant to the splitting
    parameter: different (tol -> alpha, kmax) choices agree."""
    pos, q, box = _random_system(n=16, L=15.0, seed=2)
    rs = np.random.RandomState(3)
    sites = [0, 3, 7, 11]
    mu = rs.randn(4, 3) * 0.4
    # random symmetric traceless quadrupoles
    quads = []
    for _ in range(4):
        A = rs.randn(3, 3) * 0.3
        Qm = 0.5 * (A + A.T)
        Qm -= np.eye(3) * np.trace(Qm) / 3.0
        quads.append(Qm)
    spec = _spec(16, sites, mu, quad=np.stack(quads))
    e1 = float(
        MultipoleEwald(spec, q, np.asarray(box), cutoff=7.0,
                       tol=1e-6).energy_fn(pos, box)
    )
    e2 = float(
        MultipoleEwald(spec, q, np.asarray(box), cutoff=6.0,
                       tol=1e-7).energy_fn(pos, box)
    )
    assert e1 == pytest.approx(e2, rel=2e-5)


def test_self_terms_match_closed_forms():
    """The nested-AD self energy at d=0 reproduces the textbook Ewald
    self constants for charge, dipole and traceless quadrupole."""
    alpha = 0.41
    g = _g_erf(alpha)
    q, mu = 0.7, jnp.asarray([0.2, -0.4, 0.1])
    Qm = jnp.asarray([[0.3, 0.1, -0.05], [0.1, -0.2, 0.02],
                      [-0.05, 0.02, -0.1]])
    e = float(_self_energy(g, q, mu, Qm))
    sp = np.sqrt(np.pi)
    e_q = -alpha / sp * q**2
    e_mu = -2.0 * alpha**3 / (3.0 * sp) * float(mu @ mu)
    e_quad = -2.0 * alpha**5 / (45.0 * sp) * float(jnp.sum(Qm * Qm))
    assert e == pytest.approx(e_q + e_mu + e_quad, rel=1e-10)


def test_isolated_pair_limit_matches_realspace_module():
    """Two antiparallel dipoles (zero net dipole, zero charges) in a big
    box: the lattice sum approaches the isolated real-space interaction
    of the existing Multipoles module."""
    mu = np.asarray([[0.0, 0.5, 0.1], [0.0, -0.5, -0.1]])
    q = jnp.zeros(2)
    spec = _spec(2, [0, 1], mu)
    gaps = []
    for L in (40.0, 80.0):
        box = jnp.asarray([L] * 3)
        c = L / 2
        pos = jnp.asarray([[c - 2.1, c, c], [c + 2.1, c, c]])
        e_ew = float(
            MultipoleEwald(spec, q, np.asarray(box), cutoff=9.0,
                           tol=1e-6).energy_fn(pos, box)
        )
        e_direct = float(Multipoles(spec, q).energy_fn(pos, box))
        gaps.append(abs(e_ew - e_direct))
    # the residual is the genuine image-lattice tail: it must shrink
    # ~1/L^3 with the box and be small in absolute terms
    assert gaps[1] < gaps[0] / 4
    assert gaps[1] < 1e-4


def test_forces_finite_difference_through_frames():
    """AD forces (including frame torque transfer) match central
    differences on a charged system with z-then-x framed dipoles+quads."""
    pos, q, box = _random_system(n=8, L=14.0, seed=5)
    mu = [[0.1, 0.05, 0.4], [0.0, 0.0, -0.3]]
    quads = np.zeros((2, 3, 3))
    quads[0] = np.diag([0.2, -0.1, -0.1])
    spec = _spec(
        8, [0, 4], mu, frame=[FRAME_Z_THEN_X] * 2, z=[1, 5], x=[2, 6],
        quad=quads,
    )
    me = MultipoleEwald(spec, q, np.asarray(box), cutoff=6.0, tol=1e-6)
    efun = lambda p: me.energy_fn(p, box)  # noqa: E731
    g = jax.grad(efun)(pos)
    h = 1e-6
    pos_np = np.asarray(pos)
    for a, d in [(0, 0), (1, 2), (4, 1), (5, 0), (7, 2)]:
        pp = pos_np.copy(); pp[a, d] += h
        pm = pos_np.copy(); pm[a, d] -= h
        fd = (float(efun(jnp.asarray(pp))) - float(efun(jnp.asarray(pm)))
              ) / (2 * h)
        assert float(g[a, d]) == pytest.approx(fd, rel=5e-6, abs=1e-8)


def test_spec_cutoff_conflict_rejected():
    spec = _spec(4, [0], [[0.0, 0.0, 0.1]], cutoff=8.0)
    with pytest.raises(ValueError):
        MultipoleEwald(spec, jnp.zeros(4), np.asarray([20.0] * 3),
                       cutoff=7.0)


def _quad_system(n=24, L=16.0, seed=3):
    """Charges everywhere + dipoles/quadrupoles on every other atom."""
    rs = np.random.RandomState(seed)
    pos = jnp.asarray(rs.rand(n, 3) * L)
    q = rs.randn(n) * 0.3
    q -= q.mean()
    sites = list(range(0, n, 2))
    mu = rs.randn(len(sites), 3) * 0.2
    quads = []
    for _ in sites:
        A = rs.randn(3, 3) * 0.1
        Qm = A + A.T
        Qm -= np.eye(3) * np.trace(Qm) / 3.0
        quads.append(Qm)
    spec = _spec(n, sites, mu, quad=np.stack(quads))
    return pos, jnp.asarray(q), jnp.asarray([L] * 3), spec


def test_pme_reciprocal_matches_exact_by_tier():
    """MultipolePme's derivative-spline reciprocal sum converges to the
    exact structure-factor sum tier by tier (charges / dipoles /
    quadrupoles isolated), and sharpens with spline order."""
    from torchmd_tpu.multipole_ewald import MultipolePme

    pos, q, box, spec = _quad_system()
    me = MultipoleEwald(spec, q, np.asarray(box), cutoff=7.0, tol=1e-7)
    qq, mu, Q = me._moments(pos, box)
    alpha = jnp.asarray(me.cfg.alpha, jnp.float64)
    zq, zmu, zQ = jnp.zeros_like(qq), jnp.zeros_like(mu), jnp.zeros_like(Q)

    mp6 = MultipolePme(spec, q, np.asarray(box), cutoff=7.0, tol=1e-7,
                       order=6, spacing=0.8)
    for moments, tol in [((qq, zmu, zQ), 5e-5), ((zq, mu, zQ), 2e-4),
                         ((zq, zmu, Q), 1e-3), ((qq, mu, Q), 2e-4)]:
        e_exact = float(me._reciprocal(pos, box, *moments, alpha))
        e_pme = float(mp6._reciprocal(pos, box, *moments, alpha))
        assert abs(e_pme - e_exact) <= tol * abs(e_exact)

    # order-8 must beat order-6 on the hardest (quadrupole) tier
    mp8 = MultipolePme(spec, q, np.asarray(box), cutoff=7.0, tol=1e-7,
                       order=8, spacing=0.8)
    eQ = float(me._reciprocal(pos, box, zq, zmu, Q, alpha))
    err6 = abs(float(mp6._reciprocal(pos, box, zq, zmu, Q, alpha)) - eQ)
    err8 = abs(float(mp8._reciprocal(pos, box, zq, zmu, Q, alpha)) - eQ)
    assert err8 < err6 / 5


def test_pme_total_energy_and_forces_match_exact():
    """Full energy_fn (real + self + exclusions + reciprocal) and AD
    forces agree between the exact and PME engines."""
    from torchmd_tpu.multipole_ewald import MultipolePme

    pos, q, box, spec = _quad_system()
    me = MultipoleEwald(spec, q, np.asarray(box), cutoff=7.0, tol=1e-7)
    mp = MultipolePme(spec, q, np.asarray(box), cutoff=7.0, tol=1e-7,
                      order=8, spacing=0.5)
    e1, g1 = jax.value_and_grad(me.energy_fn)(pos, box)
    e2, g2 = jax.value_and_grad(mp.energy_fn)(pos, box)
    # scale-referenced: the total is small through real/recip cancellation
    scale = float(jnp.max(jnp.abs(g1)))
    assert abs(float(e2) - float(e1)) < 1e-4 * max(1.0, abs(float(e1)))
    assert float(jnp.max(jnp.abs(g2 - g1))) < 1e-5 * scale



"""Holonomic bond constraints: SHAKE (positions) + RATTLE (velocities).

New capability relative to the reference (which has none -- unconstrained
X-H stretches limit it to ~1 fs timesteps): constraining hydrogen bonds
(or all bonds) permits the 2-4 fs production timesteps its own bundled
configs assume.

TPU-first formulation: instead of the classical serial Gauss-Seidel sweep,
constraints are relaxed in parallel (Jacobi / matrix-free SHAKE) inside a
`lax.fori_loop` with a fixed iteration count -- static shapes, no
data-dependent control flow, vmappable over replicas, and safe inside the
integrator's scan. Overlapping clusters (e.g. CH3) converge in a few tens
of iterations with under-relaxation.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ConstraintSet(NamedTuple):
    pairs: jnp.ndarray    # (C, 2) int32 atom indices
    r0: jnp.ndarray       # (C,) target distances
    invm: jnp.ndarray     # (natoms, 1) inverse masses
    iterations: int
    relax: float          # under-relaxation factor for Jacobi sweeps


def build_constraints(parameters, masses, mode="hbonds", iterations=50,
                      relax=0.5, h_mass_cut=3.5) -> Optional[ConstraintSet]:
    """Build constraints from assembled bond parameters.

    mode: "hbonds" constrains bonds with a light (<= h_mass_cut amu) atom;
    "allbonds" constrains every bond (with the reference water model's
    zero-k H-H spacer bonds this makes water rigid)."""
    if parameters.bond_params is None or mode in (None, "none", False):
        return None
    idx = np.asarray(parameters.bond_params["idx"])
    bmap = np.asarray(parameters.bond_params["map"])
    bpar = np.asarray(parameters.bond_params["params"])
    r0_all = bpar[bmap[:, 1], 1]
    masses = np.asarray(masses, dtype=np.float64).reshape(-1)

    if mode == "allbonds":
        keep = np.ones(len(idx), dtype=bool)
    elif mode == "hbonds":
        light = masses <= h_mass_cut
        keep = light[idx[:, 0]] | light[idx[:, 1]]
    else:
        raise ValueError(f"Unknown constraint mode: {mode}")
    if not keep.any():
        return None
    invm = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-12), 0.0)
    return ConstraintSet(
        pairs=jnp.asarray(idx[keep], jnp.int32),
        r0=jnp.asarray(r0_all[keep]),
        invm=jnp.asarray(invm.reshape(-1, 1)),
        iterations=int(iterations),
        relax=float(relax),
    )


def shake_positions(cs: ConstraintSet, pos_new, pos_ref):
    """Project `pos_new` back onto the constraint manifold, using the
    pre-step geometry `pos_ref` for the constraint gradients (standard
    SHAKE linearization)."""
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    ref = pos_ref[i] - pos_ref[j]                       # (C, 3)
    wi = cs.invm[i]
    wj = cs.invm[j]
    denom = 2.0 * jnp.sum(ref * ref, axis=1) * (wi + wj)[:, 0]

    def body(_, p):
        d = p[i] - p[j]
        diff = jnp.sum(d * d, axis=1) - cs.r0 * cs.r0
        g = cs.relax * diff / denom                      # (C,)
        corr = g[:, None] * ref
        p = p.at[i].add(-corr * wi)
        p = p.at[j].add(corr * wj)
        return p

    return jax.lax.fori_loop(0, cs.iterations, body, pos_new)


def rattle_velocities(cs: ConstraintSet, pos, vel):
    """Remove velocity components along the constraints (RATTLE)."""
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    d = pos[i] - pos[j]
    wi = cs.invm[i]
    wj = cs.invm[j]
    denom = jnp.sum(d * d, axis=1) * (wi + wj)[:, 0]

    def body(_, v):
        rv = jnp.sum((v[i] - v[j]) * d, axis=1)
        k = cs.relax * rv / denom
        corr = k[:, None] * d
        v = v.at[i].add(-corr * wi)
        v = v.at[j].add(corr * wj)
        return v

    return jax.lax.fori_loop(0, cs.iterations, body, vel)


def max_constraint_error(cs: ConstraintSet, pos):
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    d = jnp.linalg.norm(pos[i] - pos[j], axis=1)
    return jnp.max(jnp.abs(d - cs.r0))


# ----------------------------------------------------------------------
# SETTLE: analytic rigid 3-site water (Miyamoto & Kollman 1992)
# ----------------------------------------------------------------------

class SettleSet(NamedTuple):
    oidx: jnp.ndarray   # (W,) int32 oxygen
    h1: jnp.ndarray     # (W,) int32
    h2: jnp.ndarray     # (W,) int32
    m_o: jnp.ndarray    # (W, 1)
    m_h: jnp.ndarray    # (W, 1)
    ra: jnp.ndarray     # (W,) canonical-triangle COM..O distance
    rb: jnp.ndarray     # (W,) COM..HH-midline distance
    rc: jnp.ndarray     # (W,) half H-H distance
    r_oh: jnp.ndarray   # (W,)
    r_hh: jnp.ndarray   # (W,)


def find_waters(parameters, masses, h_mass_cut=3.5):
    """(W, 3) [O, H1, H2] index triplets of rigid-water candidates: a heavy
    atom bonded to exactly two light atoms that have no other heavy bond.
    Returns (triplets, r_oh per water, r_hh per water) from the equilibrium
    bond lengths / H-O-H angle."""
    if parameters.bond_params is None:
        return np.zeros((0, 3), np.int64), np.zeros(0), np.zeros(0)
    idx = np.asarray(parameters.bond_params["idx"])
    bmap = np.asarray(parameters.bond_params["map"])
    bpar = np.asarray(parameters.bond_params["params"])
    r0_all = bpar[bmap[:, 1], 1]
    masses = np.asarray(masses, np.float64).reshape(-1)
    light = masses <= h_mass_cut

    neigh: dict = {}
    bond_r0: dict = {}
    for (a, b), r0 in zip(idx, r0_all):
        a, b = int(a), int(b)
        neigh.setdefault(a, []).append(b)
        neigh.setdefault(b, []).append(a)
        bond_r0[(min(a, b), max(a, b))] = float(r0)

    # angle targets for r_HH via the law of cosines
    ang_theta: dict = {}
    if parameters.angle_params is not None:
        aidx = np.asarray(parameters.angle_params["idx"])
        amap = np.asarray(parameters.angle_params["map"])
        apar = np.asarray(parameters.angle_params["params"])
        th_all = apar[amap[:, 1], 1]
        for (a, b, c), th in zip(aidx, th_all):
            ang_theta[(int(a), int(b), int(c))] = float(th)
            ang_theta[(int(c), int(b), int(a))] = float(th)

    waters, r_ohs, r_hhs = [], [], []
    for o, nb in neigh.items():
        if light[o]:
            continue
        hs = sorted(h for h in nb if light[h])
        if len(hs) != 2:
            continue
        h1, h2 = hs
        # hydrogens must belong to this water only
        if any(not light[x] and x != o for x in neigh.get(h1, [])):
            continue
        if any(not light[x] and x != o for x in neigh.get(h2, [])):
            continue
        r1 = bond_r0.get((min(o, h1), max(o, h1)))
        r2 = bond_r0.get((min(o, h2), max(o, h2)))
        if r1 is None or r2 is None or abs(r1 - r2) > 1e-6:
            continue
        rhh = bond_r0.get((min(h1, h2), max(h1, h2)))
        if rhh is None:
            th = ang_theta.get((h1, o, h2))
            if th is None:
                continue
            rhh = float(np.sqrt(2.0 * r1 * r1 * (1.0 - np.cos(th))))
        waters.append((o, h1, h2))
        r_ohs.append(r1)
        r_hhs.append(rhh)
    if not waters:
        return np.zeros((0, 3), np.int64), np.zeros(0), np.zeros(0)
    return (np.asarray(waters, np.int64), np.asarray(r_ohs),
            np.asarray(r_hhs))


def build_settle(parameters, masses, h_mass_cut=3.5) -> Optional[SettleSet]:
    triplets, r_oh, r_hh = find_waters(parameters, masses, h_mass_cut)
    if len(triplets) == 0:
        return None
    masses = np.asarray(masses, np.float64).reshape(-1)
    m_o = masses[triplets[:, 0]]
    m_h = masses[triplets[:, 1]]
    mtot = m_o + 2.0 * m_h
    rc = 0.5 * r_hh
    t1 = np.sqrt(np.maximum(r_oh**2 - rc**2, 1e-12))  # O..HH-midline
    ra = t1 * 2.0 * m_h / mtot
    rb = t1 - ra
    return SettleSet(
        oidx=jnp.asarray(triplets[:, 0], jnp.int32),
        h1=jnp.asarray(triplets[:, 1], jnp.int32),
        h2=jnp.asarray(triplets[:, 2], jnp.int32),
        m_o=jnp.asarray(m_o[:, None]),
        m_h=jnp.asarray(m_h[:, None]),
        ra=jnp.asarray(ra), rb=jnp.asarray(rb), rc=jnp.asarray(rc),
        r_oh=jnp.asarray(r_oh), r_hh=jnp.asarray(r_hh),
    )


def _unit_rows(v):
    return v / jnp.sqrt(
        jnp.maximum(jnp.sum(v * v, axis=1, keepdims=True), 1e-32)
    )


def _settle_strided_layout(ss: SettleSet, nrows: int):
    """Detect the regular solvent layout O = start + stride*arange(W),
    H1 = O+1, H2 = O+2 (e.g. repeating [O,H,H] SPC or [O,H,H,M] TIP4P
    blocks). When it holds, the 12 per-step row gathers/scatters of the
    SETTLE update become two static slices + reshapes — measured 14.5 ms
    -> sub-ms at 15,625 waters on TPU v5e, where XLA lowers row gathers
    to serialized loops (docs/PERF.md). Returns (start, stride, W) or
    None; disable via TMD_SETTLE_STRIDED=0 (the equivalence test runs
    both paths)."""
    import os as _os

    if _os.environ.get("TMD_SETTLE_STRIDED", "1") == "0":
        return None
    try:
        O = np.asarray(ss.oidx)
        H1 = np.asarray(ss.h1)
        H2 = np.asarray(ss.h2)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        # Traced (e.g. jit-arg or donated) index arrays force the generic
        # (gather-based, ~14.5 ms vs sub-ms) path; log so the perf cliff
        # is observable instead of silent.
        logging.debug(
            "SETTLE strided fast path declined: index arrays are traced "
            "(pass SettleSet as a static/closure value to enable it)")
        return None
    W = int(O.shape[0])
    if W < 2:
        return None
    stride = int(O[1]) - int(O[0])
    if stride < 3:
        return None
    if int(O[0]) + stride * W > int(nrows):
        return None  # last inferred block would overrun the array
    if not (
        np.array_equal(O, int(O[0]) + stride * np.arange(W))
        and np.array_equal(H1, O + 1)
        and np.array_equal(H2, O + 2)
    ):
        return None
    return int(O[0]), stride, W


def _strided_gather3(arr, start, stride, W):
    blk = arr[start:start + stride * W].reshape(W, stride, arr.shape[-1])
    return blk, blk[:, 0], blk[:, 1], blk[:, 2]


def _strided_write3(arr, blk, rows, start, stride, W):
    """Write rows 0..2 of each block back (rows: tuple of 3 (W, 3)
    arrays); block rows >= 3 (e.g. TIP4P M sites) keep their values."""
    cols = [r[:, None].astype(arr.dtype) for r in rows]
    if stride > 3:
        cols.append(blk[:, 3:])
    blk2 = jnp.concatenate(cols, axis=1)
    return jnp.concatenate(
        [arr[:start], blk2.reshape(stride * W, arr.shape[-1]),
         arr[start + stride * W:]], axis=0)


def settle_positions(ss: SettleSet, pos_new, pos_ref):
    """Analytic position constraint for rigid 3-site waters: places each
    water's target triangle so that COM and angular momentum match the
    unconstrained update (Miyamoto & Kollman 1992), vectorized over
    waters. One shot, machine-precision constraint satisfaction."""
    O, H1, H2 = ss.oidx, ss.h1, ss.h2
    mO, mH = ss.m_o, ss.m_h
    M = mO + 2.0 * mH

    lay = _settle_strided_layout(ss, pos_new.shape[0])
    if lay is not None:
        st, sd, W = lay
        _, refO, refH1, refH2 = _strided_gather3(pos_ref, st, sd, W)
        blk_new, newO, newH1, newH2 = _strided_gather3(pos_new, st, sd, W)
    else:
        refO, refH1, refH2 = pos_ref[O], pos_ref[H1], pos_ref[H2]
        newO, newH1, newH2 = pos_new[O], pos_new[H1], pos_new[H2]
    b0 = refH1 - refO
    c0 = refH2 - refO
    com = (newO * mO + (newH1 + newH2) * mH) / M
    a1 = newO - com
    b1 = newH1 - com
    c1 = newH2 - com

    # primed frame: z' = old-plane normal, x' ~ cross(a1, z'), y' completes
    zax = _unit_rows(jnp.cross(b0, c0))
    xax = _unit_rows(jnp.cross(a1, zax))
    yax = jnp.cross(zax, xax)

    def prime(v):
        return jnp.stack(
            [jnp.sum(v * xax, 1), jnp.sum(v * yax, 1), jnp.sum(v * zax, 1)],
            axis=1,
        )

    B0 = prime(b0)
    C0 = prime(c0)
    A1 = prime(a1)
    B1 = prime(b1)
    C1 = prime(c1)

    ra, rb, rc = ss.ra, ss.rb, ss.rc
    sinphi = jnp.clip(A1[:, 2] / ra, -1.0, 1.0)
    cosphi = jnp.sqrt(jnp.maximum(1.0 - sinphi**2, 1e-12))
    sinpsi = jnp.clip(
        (B1[:, 2] - C1[:, 2]) / (2.0 * rc * cosphi), -1.0, 1.0
    )
    cospsi = jnp.sqrt(jnp.maximum(1.0 - sinpsi**2, 0.0))

    ya2 = ra * cosphi
    xb2 = -rc * cospsi
    yb2 = -rb * cosphi - rc * sinpsi * sinphi
    yc2 = -rb * cosphi + rc * sinpsi * sinphi

    alpha = xb2 * (B0[:, 0] - C0[:, 0]) + B0[:, 1] * yb2 + C0[:, 1] * yc2
    beta = xb2 * (C0[:, 1] - B0[:, 1]) + B0[:, 0] * yb2 + C0[:, 0] * yc2
    gamma = (B0[:, 0] * B1[:, 1] - B1[:, 0] * B0[:, 1]
             + C0[:, 0] * C1[:, 1] - C1[:, 0] * C0[:, 1])
    a2b2 = alpha**2 + beta**2
    sinth = jnp.clip(
        (alpha * gamma - beta * jnp.sqrt(
            jnp.maximum(a2b2 - gamma**2, 0.0)
        )) / jnp.maximum(a2b2, 1e-32),
        -1.0, 1.0,
    )
    costh = jnp.sqrt(jnp.maximum(1.0 - sinth**2, 0.0))

    xa3 = -ya2 * sinth
    ya3 = ya2 * costh
    za3 = ra * sinphi
    xb3 = xb2 * costh - yb2 * sinth
    yb3 = xb2 * sinth + yb2 * costh
    zb3 = -rb * sinphi + rc * sinpsi * cosphi
    xc3 = -xb2 * costh - yc2 * sinth
    yc3 = -xb2 * sinth + yc2 * costh
    zc3 = -rb * sinphi - rc * sinpsi * cosphi

    def unprime(x, y, z):
        return (x[:, None] * xax + y[:, None] * yax + z[:, None] * zax
                + com)

    o3 = unprime(xa3, ya3, za3)
    b3 = unprime(xb3, yb3, zb3)
    c3 = unprime(xc3, yc3, zc3)
    if lay is not None:
        return _strided_write3(pos_new, blk_new, (o3, b3, c3), st, sd, W)
    pos = pos_new
    pos = pos.at[O].set(o3.astype(pos.dtype))
    pos = pos.at[H1].set(b3.astype(pos.dtype))
    pos = pos.at[H2].set(c3.astype(pos.dtype))
    return pos


def settle_velocities(ss: SettleSet, pos, vel):
    """Exact velocity constraint for rigid waters: solves the 3x3 RATTLE
    system per molecule (constraints O-H1, O-H2, H1-H2) in one batched
    linear solve."""
    O, H1, H2 = ss.oidx, ss.h1, ss.h2
    invO = (1.0 / ss.m_o[:, 0])
    invH = (1.0 / ss.m_h[:, 0])

    lay = _settle_strided_layout(ss, vel.shape[0])
    if lay is not None:
        st, sd, W = lay
        _, posO, posH1, posH2 = _strided_gather3(pos, st, sd, W)
        blk_v, velO, velH1, velH2 = _strided_gather3(vel, st, sd, W)
    else:
        posO, posH1, posH2 = pos[O], pos[H1], pos[H2]
        velO, velH1, velH2 = vel[O], vel[H1], vel[H2]
    e0 = _unit_rows(posO - posH1)        # constraint 0: (O, H1)
    e1 = _unit_rows(posO - posH2)        # constraint 1: (O, H2)
    e2 = _unit_rows(posH1 - posH2)       # constraint 2: (H1, H2)

    d0 = jnp.sum((velO - velH1) * e0, 1)
    d1 = jnp.sum((velO - velH2) * e1, 1)
    d2 = jnp.sum((velH1 - velH2) * e2, 1)

    dot01 = jnp.sum(e0 * e1, 1)
    dot02 = jnp.sum(e0 * e2, 1)
    dot12 = jnp.sum(e1 * e2, 1)

    # explicit 3x3 Cramer solve: jnp.linalg.solve's batched LU is a
    # serialized-pivot op on TPU; the adjugate form is pure elementwise
    # VPU math over the W waters (the matrix is symmetric positive
    # definite — a RATTLE mass-metric Gram matrix — so det > 0)
    a00 = (invO + invH) * jnp.ones_like(dot01)
    a01 = invO * dot01
    a02 = -invH * dot02
    a11 = (invO + invH) * jnp.ones_like(dot01)
    a12 = invH * dot12
    a22 = 2.0 * invH * jnp.ones_like(dot01)
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / det
    lam = jnp.stack([
        (c00 * d0 + c01 * d1 + c02 * d2) * inv_det,
        (c01 * d0 + c11 * d1 + c12 * d2) * inv_det,
        (c02 * d0 + c12 * d1 + c22 * d2) * inv_det,
    ], axis=1)

    dO = -(lam[:, 0:1] * e0 + lam[:, 1:2] * e1) * invO[:, None]
    dH1 = (lam[:, 0:1] * e0 - lam[:, 2:3] * e2) * invH[:, None]
    dH2 = (lam[:, 1:2] * e1 + lam[:, 2:3] * e2) * invH[:, None]
    if lay is not None:
        return _strided_write3(
            vel, blk_v, (velO + dO, velH1 + dH1, velH2 + dH2), st, sd, W)
    vel = vel.at[O].add(dO)
    vel = vel.at[H1].add(dH1)
    vel = vel.at[H2].add(dH2)
    return vel


# ----------------------------------------------------------------------
# Composite constraints + hydrogen mass repartitioning
# ----------------------------------------------------------------------

class Constraints(NamedTuple):
    shake: Optional[ConstraintSet]
    settle: Optional[SettleSet]
    ncon: int


def build_constraint_spec(parameters, masses, mode="hbonds",
                          **kw) -> Optional[Constraints]:
    """mode: 'hbonds' | 'allbonds' (SHAKE/RATTLE) | 'settle' (analytic
    rigid waters + SHAKE on the remaining hydrogen bonds)."""
    if mode in (None, "none", False):
        return None
    if mode != "settle":
        cs = build_constraints(parameters, masses, mode=mode, **kw)
        if cs is None:
            return None
        return Constraints(shake=cs, settle=None,
                           ncon=int(cs.pairs.shape[0]))
    ss = build_settle(parameters, masses)
    # SHAKE the hydrogen bonds that are not part of a rigid water
    cs = build_constraints(parameters, masses, mode="hbonds", **kw)
    if cs is not None and ss is not None:
        win = np.zeros(int(cs.invm.shape[0]) + 1, bool)
        for arr in (ss.oidx, ss.h1, ss.h2):
            win[np.asarray(arr)] = True
        pairs = np.asarray(cs.pairs)
        keep = ~(win[pairs[:, 0]] & win[pairs[:, 1]])
        if keep.any():
            cs = cs._replace(pairs=jnp.asarray(pairs[keep], jnp.int32),
                             r0=cs.r0[jnp.asarray(np.where(keep)[0])])
        else:
            cs = None
    if ss is None and cs is None:
        return None
    ncon = (0 if cs is None else int(cs.pairs.shape[0])) + (
        0 if ss is None else 3 * int(ss.oidx.shape[0])
    )
    return Constraints(shake=cs, settle=ss, ncon=ncon)


def apply_position_constraints(c: Constraints, pos_new, pos_ref):
    if c.shake is not None:
        pos_new = shake_positions(c.shake, pos_new, pos_ref)
    if c.settle is not None:
        pos_new = settle_positions(c.settle, pos_new, pos_ref)
    return pos_new


def apply_velocity_constraints(c: Constraints, pos, vel):
    if c.shake is not None:
        vel = rattle_velocities(c.shake, pos, vel)
    if c.settle is not None:
        vel = settle_velocities(c.settle, pos, vel)
    return vel


def repartition_hydrogen_masses(masses, bonds, factor=4.0, h_mass_cut=3.5):
    """Hydrogen mass repartitioning: scale each hydrogen's mass by `factor`
    and subtract the added mass from its bonded heavy atom. Total mass (and
    equilibrium thermodynamics) are unchanged; the fastest vibrations slow
    down, enabling 4 fs steps with constrained H bonds. Returns a new
    masses array."""
    m = np.asarray(masses, np.float64).reshape(-1).copy()
    light = m <= h_mass_cut
    added = m * (factor - 1.0)
    for a, b in np.asarray(bonds, np.int64).reshape(-1, 2):
        a, b = int(a), int(b)
        if light[a] and not light[b]:
            m[b] -= added[a]
        elif light[b] and not light[a]:
            m[a] -= added[b]
    m[light] *= factor
    if np.any(m <= 0):
        raise ValueError(
            "HMR factor too large: a heavy atom's mass went non-positive"
        )
    return m

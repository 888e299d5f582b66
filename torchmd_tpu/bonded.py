"""Fused analytic bonded energies + forces with one sorted segment-sum.

The AD path (grad of the bonded energy) turns every gather into a
scatter-add in the backward pass -- on TPU those dominate the whole MD
step once the nonbonded side runs in the Pallas kernel. Here forces come
from the reference's analytic formulas (torchmd/forces.py:494-605), and
ALL per-term force contributions scatter in a single
`jax.ops.segment_sum` whose atom indices were sorted once at setup
(indices_are_sorted=True), which lowers to an efficient sorted reduction
instead of random atomic updates.

Energies are identical to potentials.compute_potentials (tested to fp
accuracy); forces are identical to -grad (the angle sin(theta)->0 guard
zeroes the same measure-zero configurations the reference guards,
forces.py:523-526).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import (
    FFParams,
    ForceTermConfig,
    wrap_displacement,
    _safe_norm,
)
from .units import ELEC_FACTOR


class BondedPlan(NamedTuple):
    """Static scatter plan: sorted flat atom indices + inverse permutation
    for the concatenated per-term force contributions."""

    perm: jnp.ndarray          # (M,) int32 contribution -> sorted order
    idx_sorted: jnp.ndarray    # (M,) int32 atom id per sorted contribution
    natoms: int
    counts: tuple              # contributions per family (for slicing)


def build_bonded_plan(ffp: FFParams, cfg: ForceTermConfig) -> Optional[BondedPlan]:
    chunks = []
    counts = {}
    if "bonds" in cfg.terms and ffp.bonds is not None:
        idx = np.asarray(ffp.bonds.idx)
        chunks += [idx[:, 0], idx[:, 1]]
        counts["bonds"] = 2 * len(idx)
    if "angles" in cfg.terms and ffp.angles is not None:
        idx = np.asarray(ffp.angles.idx)
        chunks += [idx[:, 0], idx[:, 1], idx[:, 2]]
        counts["angles"] = 3 * len(idx)
    if "dihedrals" in cfg.terms and ffp.dihedrals is not None:
        idx = np.asarray(ffp.dihedrals.idx)
        chunks += [idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]]
        counts["dihedrals"] = 4 * len(idx)
    if "impropers" in cfg.terms and ffp.impropers is not None:
        idx = np.asarray(ffp.impropers.idx)
        chunks += [idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]]
        counts["impropers"] = 4 * len(idx)
    if "1-4" in cfg.terms and ffp.nb14 is not None:
        idx = np.asarray(ffp.nb14.idx)
        chunks += [idx[:, 0], idx[:, 1]]
        counts["nb14"] = 2 * len(idx)
    if "urey-bradley" in cfg.terms and ffp.urey_bradley is not None:
        idx = np.asarray(ffp.urey_bradley.idx)
        chunks += [idx[:, 0], idx[:, 1]]
        counts["ub"] = 2 * len(idx)
    if not chunks:
        return None
    flat = np.concatenate(chunks).astype(np.int64)
    perm = np.argsort(flat, kind="stable")
    return BondedPlan(
        perm=jnp.asarray(perm, jnp.int32),
        idx_sorted=jnp.asarray(flat[perm], jnp.int32),
        natoms=int(ffp.charges.shape[0]),
        counts=tuple(sorted(counts.items())),
    )


def _bond_like(table, pos, box, cutoff=None, scale=None):
    """Harmonic two-center term. Returns (E, [f_i, f_j] contributions)."""
    p = table.params[table.map_param]
    dv = wrap_displacement(
        pos[table.idx[:, 0]] - pos[table.idx[:, 1]], box
    )
    r = _safe_norm(dv)
    unit = dv / r[:, None]
    x = r[table.map_term] - p[:, 1]
    e = p[:, 0] * x * x
    coeff = 2.0 * p[:, 0] * x  # dE/dr
    if cutoff is not None:
        keep = r[table.map_term] <= cutoff
        e = jnp.where(keep, e, 0.0)
        coeff = jnp.where(keep, coeff, 0.0)
    # multi-term safety: sum assignments back to instances
    n_inst = table.idx.shape[0]
    coeff_inst = jax.ops.segment_sum(coeff, table.map_term, num_segments=n_inst)
    fv = unit * coeff_inst[:, None]
    return jnp.sum(e), (-fv, fv)


def _angle_term(table, pos, box):
    p = table.params[table.map_param]
    r21 = wrap_displacement(pos[table.idx[:, 0]] - pos[table.idx[:, 1]], box)
    r23 = wrap_displacement(pos[table.idx[:, 2]] - pos[table.idx[:, 1]], box)
    dot = jnp.sum(r21 * r23, axis=1)
    n21inv = 1.0 / _safe_norm(r21)
    n23inv = 1.0 / _safe_norm(r23)
    cos_t = jnp.clip(dot * n21inv * n23inv, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    theta = jnp.arctan2(jnp.maximum(sin_t, 1e-12), cos_t)
    n_inst = table.idx.shape[0]
    dt_ = theta[table.map_term] - p[:, 1]
    e = p[:, 0] * dt_ * dt_
    coeff_assign = jnp.where(
        sin_t[table.map_term] != 0,
        -2.0 * p[:, 0] * dt_ / jnp.maximum(sin_t[table.map_term], 1e-30),
        0.0,
    )
    coeff = jax.ops.segment_sum(coeff_assign, table.map_term, num_segments=n_inst)
    f0 = (
        coeff[:, None]
        * (cos_t[:, None] * r21 * n21inv[:, None] - r23 * n23inv[:, None])
        * n21inv[:, None]
    )
    f2 = (
        coeff[:, None]
        * (cos_t[:, None] * r23 * n23inv[:, None] - r21 * n21inv[:, None])
        * n23inv[:, None]
    )
    f1 = -(f0 + f2)
    return jnp.sum(e), (f0, f1, f2)


def _torsion_term(table, pos, box, amber: bool):
    idx = table.idx
    r12 = wrap_displacement(pos[idx[:, 0]] - pos[idx[:, 1]], box)
    r23 = wrap_displacement(pos[idx[:, 1]] - pos[idx[:, 2]], box)
    r34 = wrap_displacement(pos[idx[:, 2]] - pos[idx[:, 3]], box)
    crossA = jnp.cross(r12, r23)
    crossB = jnp.cross(r23, r34)
    crossC = jnp.cross(r23, crossA)
    normA = _safe_norm(crossA)
    normB = _safe_norm(crossB)
    normC = _safe_norm(crossC)
    ncB = crossB / normB[:, None]
    cos_phi = jnp.sum(crossA * ncB, axis=1) / normA
    sin_phi = jnp.sum(crossC * ncB, axis=1) / normC
    phi = -jnp.arctan2(sin_phi, cos_phi)

    p = table.params[table.map_param]
    k0, phi0, per = p[:, 0], p[:, 1], p[:, 2]
    phis = phi[table.map_term]
    if amber:
        diff = per * phis - phi0
        e = k0 * (1.0 + jnp.cos(diff))
        coeff_assign = -per * k0 * jnp.sin(diff)
    else:
        diff = phis - phi0
        diff = diff - 2.0 * jnp.pi * jnp.round(diff / (2.0 * jnp.pi))
        e = k0 * diff * diff
        coeff_assign = 2.0 * k0 * diff
    n_inst = idx.shape[0]
    coeff = jax.ops.segment_sum(
        coeff_assign, table.map_term, num_segments=n_inst
    )

    # OpenMM force distribution (reference forces.py:584-604)
    normD = _safe_norm(r23)
    norm2D = normD * normD
    ff0 = (-coeff * normD) / (normA * normA)
    ff1 = jnp.sum(r12 * r23, axis=1) / norm2D
    ff2 = jnp.sum(r34 * r23, axis=1) / norm2D
    ff3 = (coeff * normD) / (normB * normB)
    f0v = ff0[:, None] * crossA
    f3v = ff3[:, None] * crossB
    s = ff1[:, None] * f0v - ff2[:, None] * f3v
    return jnp.sum(e), (-f0v, f0v + s, f3v - s, -f3v)


def _nb14_term(table, pos, box, charges, want_lj, want_elec, dtype):
    dv = wrap_displacement(pos[table.idx[:, 0]] - pos[table.idx[:, 1]], box)
    r = _safe_norm(dv)
    unit = dv / r[:, None]
    p = table.params[table.map_param]
    aa, bb, scnb, scee = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    rinv = 1.0 / r
    e_lj = jnp.asarray(0.0, dtype)
    e_el = jnp.asarray(0.0, dtype)
    coeff = jnp.zeros_like(r)
    if want_lj:
        rinv6 = rinv**6
        rinv12 = rinv6 * rinv6
        e_lj = jnp.sum((aa * rinv12 - bb * rinv6) / scnb)
        coeff = coeff + (-12.0 * aa * rinv12 + 6.0 * bb * rinv6) * rinv / scnb
    if want_elec:
        qq = ELEC_FACTOR * charges[table.idx[:, 0]] * charges[table.idx[:, 1]]
        pot = qq * rinv / scee
        e_el = jnp.sum(pot)
        coeff = coeff + (-pot * rinv)
    fv = unit * coeff[:, None]
    return e_lj, e_el, (-fv, fv)


def bonded_energy_forces(ffp: FFParams, plan: BondedPlan, pos, box,
                         cfg: ForceTermConfig):
    """(per-term bonded potentials dict, bonded forces (natoms, 3))."""
    pot = {}
    contribs = []
    if "bonds" in cfg.terms and ffp.bonds is not None:
        e, fs = _bond_like(ffp.bonds, pos, box, cutoff=cfg.cutoff)
        pot["bonds"] = e
        contribs += list(fs)
    if "angles" in cfg.terms and ffp.angles is not None:
        e, fs = _angle_term(ffp.angles, pos, box)
        pot["angles"] = e
        contribs += list(fs)
    if "dihedrals" in cfg.terms and ffp.dihedrals is not None:
        e, fs = _torsion_term(ffp.dihedrals, pos, box, cfg.dihedrals_amber)
        pot["dihedrals"] = e
        contribs += list(fs)
    if "impropers" in cfg.terms and ffp.impropers is not None:
        e, fs = _torsion_term(ffp.impropers, pos, box, cfg.impropers_amber)
        pot["impropers"] = e
        contribs += list(fs)
    if "1-4" in cfg.terms and ffp.nb14 is not None:
        e_lj, e_el, fs = _nb14_term(
            ffp.nb14, pos, box, ffp.charges,
            "lj" in cfg.terms, "electrostatics" in cfg.terms, pos.dtype,
        )
        if "lj" in cfg.terms:
            pot["lj"] = pot.get("lj", 0.0) + e_lj
        if "electrostatics" in cfg.terms:
            pot["electrostatics"] = pot.get("electrostatics", 0.0) + e_el
        contribs += list(fs)
    if "urey-bradley" in cfg.terms and ffp.urey_bradley is not None:
        e, fs = _bond_like(ffp.urey_bradley, pos, box)
        pot["urey-bradley"] = e
        contribs += list(fs)

    if not contribs:
        return pot, jnp.zeros_like(pos)

    flat = jnp.concatenate(contribs, axis=0)          # (M, 3)
    flat_sorted = flat[plan.perm]
    forces = jax.ops.segment_sum(
        flat_sorted, plan.idx_sorted, num_segments=plan.natoms,
        indices_are_sorted=True,
    )
    return pot, forces

"""Bonded terms on the halo-exchange path.

Bonded interactions are spatially local (a dihedral spans ~5 A, far
inside the ghost band of cutoff + skin), so no extra communication is
needed beyond the existing position halo: every rank holds the FULL
(small, static) bonded term tables and evaluates them against the
positions it can see -- its owned rows plus both ghost bands --
scattered into a global-id position array.

Correctness without a force-return leg (the same property the pair
stage gets from symmetric evaluation):

  - energy: each term instance is weighted by the FRACTION of its atoms
    owned locally (mean of the owned flags); summed over ranks the
    weights add to exactly 1 per term.
  - forces: a rank computes the full gradient of every term that is
    completely VISIBLE to it (product of visibility flags) and keeps
    only the rows of atoms it OWNS. Any term touching an owned atom is
    fully visible because the band is wider than the largest bonded
    extent (guarded at HaloMD init), so owned rows receive complete
    forces.

Compute is replicated per term over the (at most two) ranks that see
it, plus masked-out rows elsewhere -- bonded work is a rounding error
next to the pair stage, and the comm story stays surface-proportional.

The reference has no distributed code at all (SURVEY.md §2.9); the
term forms mirror torchmd/forces.py:494-604 via the same math as
torchmd_tpu.potentials (per-row variants so ownership/visibility
weights can be applied before the reduction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..potentials import (
    FFParams,
    ForceTermConfig,
    TermTable,
    _dihedral_phi,
    _gather_disp,
    _safe_norm,
)
from ..units import ELEC_FACTOR


class HaloBondedPlan(NamedTuple):
    """Static, replicated bonded tables for the halo path (f32)."""

    bonds: Optional[TermTable]
    bonds_g96: Optional[TermTable]
    angles: Optional[TermTable]
    angles_g96: Optional[TermTable]
    urey_bradley: Optional[TermTable]
    dihedrals: Optional[TermTable]
    impropers: Optional[TermTable]
    nb14: Optional[TermTable]
    charges: Optional[jnp.ndarray]   # (natoms,) global charges for 1-4
    cmap: Optional[object]           # torchmd_tpu.cmap.CMapTable (f32)
    dihedrals_amber: bool
    impropers_amber: bool
    want_lj14: bool
    want_elec14: bool


def _f32_table(t: Optional[TermTable]) -> Optional[TermTable]:
    if t is None or t.idx.shape[0] == 0:
        return None
    return TermTable(
        idx=jnp.asarray(t.idx, jnp.int32),
        map_term=jnp.asarray(t.map_term, jnp.int32),
        map_param=jnp.asarray(t.map_param, jnp.int32),
        params=jnp.asarray(t.params, jnp.float32),
    )


def build_halo_bonded_plan(ffp: FFParams,
                           cfg: ForceTermConfig) -> Optional[HaloBondedPlan]:
    """Pack the active bonded families; None when no bonded term is on.

    CMAP cross-terms ride the same ownership/visibility weighting as the
    torsions: an 8-atom cross-term spans two fused dihedrals (~7 A),
    far inside the ghost band, and `cmap_energy_rows` gives the
    per-instance energies the weights multiply."""
    t = cfg.terms
    cm = None
    if "cmap" in t and ffp.cmap is not None and ffp.cmap.idx.shape[0]:
        cm = ffp.cmap._replace(
            idx=jnp.asarray(ffp.cmap.idx, jnp.int32),
            type=jnp.asarray(ffp.cmap.type, jnp.int32),
            coeffs=jnp.asarray(ffp.cmap.coeffs, jnp.float32),
        )
    plan = HaloBondedPlan(
        bonds=_f32_table(ffp.bonds) if "bonds" in t else None,
        bonds_g96=_f32_table(ffp.bonds_g96) if "bonds" in t else None,
        angles=_f32_table(ffp.angles) if "angles" in t else None,
        angles_g96=_f32_table(ffp.angles_g96) if "angles" in t else None,
        urey_bradley=(_f32_table(ffp.urey_bradley)
                      if "urey-bradley" in t else None),
        dihedrals=_f32_table(ffp.dihedrals) if "dihedrals" in t else None,
        impropers=_f32_table(ffp.impropers) if "impropers" in t else None,
        nb14=_f32_table(ffp.nb14) if "1-4" in t else None,
        charges=(jnp.asarray(ffp.charges, jnp.float32)
                 if "1-4" in t and ffp.nb14 is not None else None),
        cmap=cm,
        dihedrals_amber=cfg.dihedrals_amber,
        impropers_amber=cfg.impropers_amber,
        want_lj14="lj" in t,
        want_elec14="electrostatics" in t,
    )
    if all(
        getattr(plan, f) is None
        for f in ("bonds", "bonds_g96", "angles", "angles_g96",
                  "urey_bradley", "dihedrals", "impropers", "nb14",
                  "cmap")
    ):
        return None
    return plan


def max_bonded_extent(plan: HaloBondedPlan, pos, box) -> float:
    """Largest min-image distance between any two atoms of any bonded
    term at the given geometry (host-side; the HaloMD init guard)."""
    p = np.asarray(pos, np.float64).reshape(-1, 3)
    b = np.asarray(box, np.float64).reshape(3)
    dmax = 0.0
    for f in ("bonds", "bonds_g96", "angles", "angles_g96",
              "urey_bradley", "dihedrals", "impropers", "nb14", "cmap"):
        t = getattr(plan, f)
        if t is None:
            continue
        idx = np.asarray(t.idx)
        for a in range(idx.shape[1]):
            for c in range(a + 1, idx.shape[1]):
                d = p[idx[:, a]] - p[idx[:, c]]
                d -= b * np.round(d / b)
                if len(d):
                    dmax = max(dmax, float(np.sqrt(
                        np.max(np.sum(d * d, axis=1))
                    )))
    return dmax


def default_positions(natoms: int) -> jnp.ndarray:
    """(natoms+1, 3) low-discrepancy base for the global-id position
    scatter. Invisible atoms keep these defaults; their term rows carry
    zero weight, but the geometry must still be NON-degenerate --
    coincident points would send NaN through the atan2 gradient of the
    torsion forms, and 0 * NaN poisons the force sum. An R3-sequence
    spread guarantees distinct, generically non-collinear points."""
    ids = jnp.arange(natoms + 1, dtype=jnp.float32)[:, None] + 1.0
    alpha = jnp.asarray(
        [0.7548776662, 0.5698402910, 0.3028448153], jnp.float32
    )
    return (ids * alpha) % 1.0 * 5.0


def _inst_weight(table: TermTable, wg, mode: str):
    """Per-instance weight from the per-global-atom weight vector:
    'mean' = ownership fraction (energy), 'prod' = all-visible gate
    (forces)."""
    w = wg[table.idx]                       # (ninst, arity)
    return jnp.mean(w, axis=1) if mode == "mean" else jnp.prod(w, axis=1)


def _bond_rows(table, pg, box):
    p = table.params[table.map_param]
    dv = _gather_disp(pg, table.idx[:, 0], table.idx[:, 1], box)
    r = _safe_norm(dv)
    x = r[table.map_term] - p[:, 1]
    return p[:, 0] * x * x


def _g96_bond_rows(table, pg, box):
    p = table.params[table.map_param]
    dv = _gather_disp(pg, table.idx[:, 0], table.idx[:, 1], box)
    r2 = jnp.sum(dv * dv, axis=1)
    x = r2[table.map_term] - p[:, 1] * p[:, 1]
    return p[:, 0] * x * x


def _angle_rows(table, pg, box):
    p = table.params[table.map_param]
    r21 = _gather_disp(pg, table.idx[:, 0], table.idx[:, 1], box)
    r23 = _gather_disp(pg, table.idx[:, 2], table.idx[:, 1], box)
    dot = jnp.sum(r21 * r23, axis=1)
    cos_theta = jnp.clip(
        dot / (_safe_norm(r21) * _safe_norm(r23)), -1.0, 1.0
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-24))
    theta = jnp.arctan2(sin_theta, cos_theta)
    x = theta[table.map_term] - p[:, 1]
    return p[:, 0] * x * x


def _g96_angle_rows(table, pg, box):
    p = table.params[table.map_param]
    r21 = _gather_disp(pg, table.idx[:, 0], table.idx[:, 1], box)
    r23 = _gather_disp(pg, table.idx[:, 2], table.idx[:, 1], box)
    dot = jnp.sum(r21 * r23, axis=1)
    cos_theta = jnp.clip(
        dot / (_safe_norm(r21) * _safe_norm(r23)), -1.0, 1.0
    )
    x = cos_theta[table.map_term] - p[:, 1]
    return p[:, 0] * x * x


def _torsion_rows(table, pg, box, amber):
    phi = _dihedral_phi(pg, table.idx, box)
    p = table.params[table.map_param]
    k0, phi0, per = p[:, 0], p[:, 1], p[:, 2]
    phis = phi[table.map_term]
    if amber:
        return k0 * (1.0 + jnp.cos(per * phis - phi0))
    diff = phis - phi0
    diff = diff - 2.0 * jnp.pi * jnp.round(diff / (2.0 * jnp.pi))
    return k0 * diff * diff


def _nb14_rows(table, pg, box, charges, want_lj, want_elec, w_inst):
    """Scaled 1-4 LJ + electrostatics per assignment row. Rows whose
    instance weight is zero get r pinned to 1 A so the r^-12 of garbage
    (unscattered) positions cannot overflow f32 under the mask."""
    dv = _gather_disp(pg, table.idx[:, 0], table.idx[:, 1], box)
    r = _safe_norm(dv)
    live = (w_inst > 0.0)[table.map_term]
    r = jnp.where(live, r, 1.0)
    p = table.params[table.map_param]
    aa, bb, scnb, scee = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    rinv = 1.0 / r
    e = jnp.zeros_like(r)
    if want_lj:
        rinv6 = rinv**6
        e = e + (aa * rinv6 * rinv6 - bb * rinv6) / scnb
    if want_elec:
        q = charges[table.idx[:, 0]] * charges[table.idx[:, 1]]
        e = e + jnp.float32(ELEC_FACTOR) * q[table.map_term] * rinv / scee
    return e


def weighted_bonded_energy(plan: HaloBondedPlan, pg, wg, box, mode: str):
    """Sum over every bonded assignment row of e_row * weight(instance),
    with weight = mean (ownership fraction) or prod (visibility gate)
    of wg over the instance's atoms. pg is the (natoms+1, 3) global-id
    position scatter (slot natoms = padding scratch); wg is
    (natoms+1,)."""
    e = jnp.zeros((), pg.dtype)
    simple = (
        (plan.bonds, _bond_rows),
        (plan.bonds_g96, _g96_bond_rows),
        (plan.angles, _angle_rows),
        (plan.angles_g96, _g96_angle_rows),
        (plan.urey_bradley, _bond_rows),
    )
    for table, rows_fn in simple:
        if table is not None:
            w = _inst_weight(table, wg, mode)
            e = e + jnp.sum(rows_fn(table, pg, box) * w[table.map_term])
    for table, amber in ((plan.dihedrals, plan.dihedrals_amber),
                         (plan.impropers, plan.impropers_amber)):
        if table is not None:
            w = _inst_weight(table, wg, mode)
            e = e + jnp.sum(
                _torsion_rows(table, pg, box, amber) * w[table.map_term]
            )
    if plan.nb14 is not None and (plan.want_lj14 or plan.want_elec14):
        t = plan.nb14
        w = _inst_weight(t, wg, mode)
        rows = _nb14_rows(t, pg, box, plan.charges, plan.want_lj14,
                          plan.want_elec14, w)
        e = e + jnp.sum(rows * w[t.map_term])
    if plan.cmap is not None:
        from ..cmap import cmap_energy_rows

        w = _inst_weight(plan.cmap, wg, mode)   # (nc,) over the 8 atoms
        e = e + jnp.sum(cmap_energy_rows(plan.cmap, pg, box) * w)
    return e

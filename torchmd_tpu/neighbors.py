"""Cell lists and fixed-shape neighbor evaluation for O(N) nonbonded scaling.

The reference ships only a commented-out sketch of this
(torchmd/neighbourlist.py:4-48 -- `discretize_box` plus a dead
`neighbour_list`); its production path is all-vs-all O(N^2). Here the cell
list is a first-class, jit-compatible structure with static shapes:

  - the box is partitioned into cells of edge >= cutoff + skin
    (grid resolution fixed at construction from the concrete box),
  - atoms scatter into (ncells, capacity) slots via a rank-in-cell trick
    (sort by cell id; rank = position - first-occurrence), no host work,
  - pair evaluation for atom i runs over the 27 neighboring cells'
    slots -- a fixed (natoms, 27 * capacity) candidate matrix -- with
    exclusions checked against a padded per-atom exclusion list and the
    cutoff applied as a mask.  All shapes static, so the whole thing lives
    inside the integrator's lax.scan and differentiates.

Rebuild policy: with a skin s, the candidate set stays valid until some
atom moves more than s/2 since the last build; `needs_rebuild` implements
the standard criterion. Overflow (a cell exceeding capacity) is reported
as a flag; `CellListConfig.with_capacity` re-derives a larger
configuration host-side.

Orthorhombic PBC only (like the reference); open-boundary systems use the
dense path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .units import ELEC_FACTOR
from .potentials import FFParams, ForceTermConfig


class CellListConfig(NamedTuple):
    box: tuple            # concrete (lx, ly, lz)
    cutoff: float
    skin: float
    ncells: tuple         # (ncx, ncy, ncz)
    capacity: int
    max_exclusions: int

    @property
    def rc(self):
        return self.cutoff + self.skin

    def with_capacity(self, capacity: int) -> "CellListConfig":
        return self._replace(capacity=capacity)


def make_cell_config(box, cutoff, skin=2.0, capacity=None,
                     natoms=None, max_exclusions=16) -> CellListConfig:
    box = tuple(float(b) for b in np.asarray(box).reshape(-1)[:3])
    if min(box) <= 0:
        raise ValueError("Cell lists require a periodic box")
    rc = cutoff + skin
    nc = tuple(max(1, int(b // rc)) for b in box)
    if min(nc) < 3:
        # fewer than 3 cells along an axis makes the 27-stencil revisit
        # cells (double counting); such boxes belong on the dense path
        raise ValueError(
            f"Box {box} too small for cell list with rc={rc}: "
            f"need >= 3 cells per axis, got {nc}"
        )
    if capacity is None:
        ncells = nc[0] * nc[1] * nc[2]
        density = (natoms or 1000) / ncells
        capacity = int(max(8, density * 2.5))
    return CellListConfig(box, float(cutoff), float(skin), nc, capacity,
                          max_exclusions)


class CellList(NamedTuple):
    slots: jnp.ndarray      # (ncells, capacity) int32 atom ids, N = empty
    counts: jnp.ndarray     # (ncells,) int32
    ref_pos: jnp.ndarray    # positions at build time
    overflow: jnp.ndarray   # bool scalar


def _cell_ids(pos, cfg: CellListConfig):
    box = jnp.asarray(cfg.box, pos.dtype)
    nc = jnp.asarray(cfg.ncells, jnp.int32)
    frac = pos / box - jnp.floor(pos / box)  # wrap into [0, 1)
    cid3 = jnp.minimum(
        (frac * jnp.asarray(cfg.ncells, pos.dtype)).astype(jnp.int32),
        nc - 1,
    )
    return (cid3[:, 0] * cfg.ncells[1] + cid3[:, 1]) * cfg.ncells[2] + cid3[:, 2]


def build_cell_list(pos, cfg: CellListConfig) -> CellList:
    n = pos.shape[0]
    ncells = cfg.ncells[0] * cfg.ncells[1] * cfg.ncells[2]
    cid = _cell_ids(pos, cfg)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    # rank of each atom within its cell
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.any(rank >= cfg.capacity)
    rank = jnp.minimum(rank, cfg.capacity - 1)
    slots = jnp.full((ncells, cfg.capacity), n, dtype=jnp.int32)
    slots = slots.at[sorted_cid, rank].set(order.astype(jnp.int32))
    counts = jax.ops.segment_sum(
        jnp.ones(n, jnp.int32), cid, num_segments=ncells
    )
    return CellList(slots, counts, pos, overflow)


def needs_rebuild(cl: CellList, pos, cfg: CellListConfig):
    """True when any atom moved further than skin/2 since the build."""
    d = pos - cl.ref_pos
    box = jnp.asarray(cfg.box, pos.dtype)
    d = d - box * jnp.round(d / box)
    return jnp.any(jnp.sum(d * d, axis=1) > (cfg.skin * 0.5) ** 2)


def _neighbor_cell_offsets():
    off = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off.append((dx, dy, dz))
    return np.asarray(off, np.int32)  # (27, 3)


def candidate_matrix(cl: CellList, pos, cfg: CellListConfig):
    """(natoms, 27 * capacity) int32 candidate neighbor ids (n = padding)."""
    nc = np.asarray(cfg.ncells, np.int64)
    cid = _cell_ids(pos, cfg)
    cz = cid % cfg.ncells[2]
    cy = (cid // cfg.ncells[2]) % cfg.ncells[1]
    cx = cid // (cfg.ncells[1] * cfg.ncells[2])
    offs = jnp.asarray(_neighbor_cell_offsets())  # (27, 3)
    ncj = jnp.asarray(cfg.ncells, jnp.int32)
    nx = (cx[:, None] + offs[None, :, 0]) % ncj[0]
    ny = (cy[:, None] + offs[None, :, 1]) % ncj[1]
    nz = (cz[:, None] + offs[None, :, 2]) % ncj[2]
    ncell_ids = (nx * cfg.ncells[1] + ny) * cfg.ncells[2] + nz  # (N, 27)
    cands = cl.slots[ncell_ids]  # (N, 27, capacity)
    return cands.reshape(pos.shape[0], -1)


def build_exclusion_table(parameters, natoms, max_exclusions,
                          exclusions=("bonds", "angles", "1-4")):
    """Padded per-atom exclusion lists (host-side, once per topology)."""
    pairs = parameters.get_exclusions(types=exclusions)
    table = [[] for _ in range(natoms)]
    for a, b in pairs:
        a, b = int(a), int(b)
        if b not in table[a]:
            table[a].append(b)
        if a not in table[b]:
            table[b].append(a)
    width = max(max_exclusions, max((len(t) for t in table), default=1))
    out = np.full((natoms, width), natoms, dtype=np.int32)
    for i, t in enumerate(table):
        out[i, : len(t)] = t
    return jnp.asarray(out)


def cell_nonbonded_energy_forces(
    ffp: FFParams, cfg: ForceTermConfig, clcfg: CellListConfig,
    cl: CellList, excl_table, pos, box,
):
    """Nonbonded energies + forces over the fixed-shape candidate matrix.
    Same physics as potentials.nonbonded_energy_forces; O(N * 27 * capacity)
    instead of O(N^2)."""
    n = pos.shape[0]
    cands = candidate_matrix(cl, pos, clcfg)      # (N, M)
    m = cands.shape[1]
    padded_pos = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)])
    pj = padded_pos[cands]                        # (N, M, 3)
    dv = pos[:, None, :] - pj
    boxv = jnp.asarray(box, pos.dtype)
    safe = jnp.where(boxv > 0, boxv, 1.0)
    dv = dv - jnp.where(boxv > 0, safe * jnp.round(dv / safe), 0.0)
    d2 = jnp.sum(dv * dv, axis=-1)

    iidx = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (cands < n) & (cands != iidx)
    # exclusion check: candidate j present in atom i's exclusion list?
    excl = excl_table[:, None, :] == cands[:, :, None]  # (N, M, E)
    valid = valid & ~jnp.any(excl, axis=-1)

    d2 = jnp.where(valid, d2, 1.0)
    dist = jnp.sqrt(d2)
    rinv = 1.0 / dist
    mask = valid & (dist <= cfg.cutoff)
    fmask = mask.astype(pos.dtype)

    out = {}
    g = jnp.zeros_like(d2)
    needs_ab = any(t in cfg.terms for t in ("lj", "repulsion", "repulsioncg"))
    if needs_ab:
        if ffp.lj_ab is not None:
            ti = ffp.mapped_atom_types
            t_pad = jnp.concatenate([ti, jnp.zeros(1, ti.dtype)])
            tj = t_pad[cands]
            A = ffp.lj_ab[0][ti[:, None], tj]
            B = ffp.lj_ab[1][ti[:, None], tj]
        else:
            s_at = ffp.lj_params[:, 0][ffp.mapped_atom_types]
            e_at = ffp.lj_params[:, 1][ffp.mapped_atom_types]
            s_pad = jnp.concatenate([s_at, jnp.zeros(1, s_at.dtype)])
            e_pad = jnp.concatenate([e_at, jnp.zeros(1, e_at.dtype)])
            sig = 0.5 * (s_at[:, None] + s_pad[cands])
            eps = jnp.sqrt(jnp.abs(e_at[:, None] * e_pad[cands]))
            s6 = sig**6
            B = 4.0 * eps * s6
            A = B * s6
        rinv6 = rinv**6
        rinv12 = rinv6 * rinv6
    if "lj" in cfg.terms:
        pot = A * rinv12 - B * rinv6
        dEdr = (-12.0 * A * rinv12 + 6.0 * B * rinv6) * rinv
        if cfg.switch_dist is not None and cfg.cutoff is not None:
            t = (dist - cfg.switch_dist) / (cfg.cutoff - cfg.switch_dist)
            sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
            dsw = t * t * (-30.0 + t * (60.0 - t * 30.0)) / (
                cfg.cutoff - cfg.switch_dist
            )
            in_sw = dist > cfg.switch_dist
            dEdr = jnp.where(in_sw, dEdr * sw + pot * dsw, dEdr)
            pot = jnp.where(in_sw, pot * sw, pot)
        out["lj"] = 0.5 * jnp.sum(pot * fmask)
        g = g + dEdr * rinv * fmask
    if "repulsion" in cfg.terms:
        out["repulsion"] = 0.5 * jnp.sum(A * rinv12 * fmask)
        g = g + (-12.0 * A * rinv12 * rinv * rinv) * fmask
    if "repulsioncg" in cfg.terms:
        out["repulsioncg"] = 0.5 * jnp.sum(B * rinv6 * fmask)
        g = g + (-6.0 * B * rinv6 * rinv * rinv) * fmask
    if "electrostatics" in cfg.terms:
        q_pad = jnp.concatenate([ffp.charges, jnp.zeros(1, ffp.charges.dtype)])
        qq = ELEC_FACTOR * ffp.charges[:, None] * q_pad[cands]
        if cfg.ewald_alpha is not None:
            a = cfg.ewald_alpha
            erfc_t = jax.scipy.special.erfc(a * dist)
            pot = qq * erfc_t * rinv
            dEdr_r = -qq * rinv * rinv * (
                erfc_t * rinv
                + (2.0 * a / jnp.sqrt(jnp.pi)) * jnp.exp(-(a * dist) ** 2)
            )
        elif cfg.rfa and cfg.cutoff is not None:
            denom = 2.0 * cfg.solvent_dielectric + 1.0
            krf = (1.0 / cfg.cutoff**3) * (cfg.solvent_dielectric - 1.0) / denom
            crf = (1.0 / cfg.cutoff) * (3.0 * cfg.solvent_dielectric) / denom
            pot = qq * (rinv + krf * d2 - crf)
            dEdr_r = qq * (2.0 * krf - rinv * rinv * rinv)
        else:
            pot = qq * rinv
            dEdr_r = -qq * rinv * rinv * rinv
        out["electrostatics"] = 0.5 * jnp.sum(pot * fmask)
        g = g + dEdr_r * fmask

    forces = -jnp.einsum("ij,ijk->ik", g, dv)
    return out, forces


class CellKernel:
    """Bundles a static cell configuration + exclusion table with
    build/update/evaluate entry points for one topology.

    Usage in the integrator scan:
        aux = kern.build(pos, box)                     # once
        aux = kern.update(pos, aux)                    # lax.cond rebuild
        pot, forces = kern.energy_forces(pos, box, aux)
    All methods are jit/vmap-compatible; `check_overflow` is the host-side
    guard that grows the capacity if a cell ever overflows.
    """

    def __init__(self, ffp: FFParams, cfg: ForceTermConfig, parameters,
                 box, skin=2.0, exclusions=("bonds", "angles", "1-4"),
                 capacity=None):
        if cfg.cutoff is None:
            raise ValueError("Cell lists require a cutoff")
        natoms = int(ffp.charges.shape[0])
        self.ffp = ffp
        self.cfg = cfg
        self.clcfg = make_cell_config(
            box, cfg.cutoff, skin=skin, capacity=capacity, natoms=natoms
        )
        self.excl_table = build_exclusion_table(
            parameters, natoms, self.clcfg.max_exclusions, exclusions
        )

    def build(self, pos) -> CellList:
        return build_cell_list(pos, self.clcfg)

    def update(self, pos, cl: CellList) -> CellList:
        return jax.lax.cond(
            needs_rebuild(cl, pos, self.clcfg),
            lambda: build_cell_list(pos, self.clcfg),
            lambda: cl,
        )

    def energy_forces(self, pos, box, cl: CellList):
        return cell_nonbonded_energy_forces(
            self.ffp, self.cfg, self.clcfg, cl, self.excl_table, pos, box
        )

    def check_overflow(self, cl: CellList) -> bool:
        return bool(np.asarray(cl.overflow))

    def grow(self) -> "CellKernel":
        import copy

        new = copy.copy(self)
        new.clcfg = self.clcfg.with_capacity(self.clcfg.capacity * 2)
        return new


# ----------------------------------------------------------------------
# Reference-stub parity helper
# ----------------------------------------------------------------------

def discretize_box(box, subcell_size):
    """27-neighbor cell index table for a rectangular box, the utility the
    reference sketches in neighbourlist.py:4-31. Returns (ncells_per_dim,
    neighbor_cell_pairs)."""
    nc = tuple(max(1, int(float(b) // subcell_size)) for b in np.asarray(box))
    ncells = nc[0] * nc[1] * nc[2]
    offs = _neighbor_cell_offsets()
    pairs = set()
    for cx in range(nc[0]):
        for cy in range(nc[1]):
            for cz in range(nc[2]):
                c = (cx * nc[1] + cy) * nc[2] + cz
                for dx, dy, dz in offs:
                    nx, ny, nz = (cx + dx) % nc[0], (cy + dy) % nc[1], (cz + dz) % nc[2]
                    c2 = (nx * nc[1] + ny) * nc[2] + nz
                    pairs.add((min(c, c2), max(c, c2)))
    return nc, np.asarray(sorted(pairs), dtype=np.int64).reshape(-1, 2)

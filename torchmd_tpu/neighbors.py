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
    split: int = 1        # cells have edge >= rc/split; stencil (2*split+1)^3

    @property
    def rc(self):
        return self.cutoff + self.skin

    @property
    def stencil(self):
        return 2 * self.split + 1

    def with_capacity(self, capacity: int) -> "CellListConfig":
        return self._replace(capacity=capacity)


def make_cell_config(box, cutoff, skin=2.0, capacity=None,
                     natoms=None, max_exclusions=16,
                     split=2) -> CellListConfig:
    """split=2 (half-size cells, 125-stencil) keeps the per-cell capacity
    small, which bounds both the padded candidate count and the memory of
    the dense cell-pair evaluation; split=1 is the classic 27-stencil."""
    box = tuple(float(b) for b in np.asarray(box).reshape(-1)[:3])
    if min(box) <= 0:
        raise ValueError("Cell lists require a periodic box")
    rc = cutoff + skin
    for s_try in range(split, 0, -1):
        edge = rc / s_try
        nc = tuple(max(1, int(b // edge)) for b in box)
        if min(nc) >= 2 * s_try + 1:
            split = s_try
            break
    else:
        raise ValueError(
            f"Box {box} too small for a cell list with rc={rc}; "
            "use the dense path"
        )
    if capacity is None:
        ncells = nc[0] * nc[1] * nc[2]
        density = (natoms or 1000) / ncells
        capacity = int(max(4, np.ceil(density * 2.5)))
    return CellListConfig(box, float(cutoff), float(skin), nc, capacity,
                          max_exclusions, split)


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


def neighbor_cell_table(cfg: CellListConfig) -> np.ndarray:
    """(ncells, stencil^3) static table of neighbor cell ids (periodic)."""
    s = cfg.split
    offs = np.array(
        [(dx, dy, dz)
         for dx in range(-s, s + 1)
         for dy in range(-s, s + 1)
         for dz in range(-s, s + 1)], dtype=np.int64,
    )
    ncx, ncy, ncz = cfg.ncells
    cx, cy, cz = np.meshgrid(
        np.arange(ncx), np.arange(ncy), np.arange(ncz), indexing="ij"
    )
    cx, cy, cz = cx.ravel(), cy.ravel(), cz.ravel()
    nx = (cx[:, None] + offs[None, :, 0]) % ncx
    ny = (cy[:, None] + offs[None, :, 1]) % ncy
    nz = (cz[:, None] + offs[None, :, 2]) % ncz
    return ((nx * ncy + ny) * ncz + nz).astype(np.int32)


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


def candidate_matrix(cl: CellList, pos, cfg: CellListConfig):
    """(natoms, stencil^3 * capacity) int32 candidate ids (n = padding)."""
    cid = _cell_ids(pos, cfg)
    table = jnp.asarray(neighbor_cell_table(cfg))
    cands = cl.slots[table[cid]]  # (N, S3, capacity)
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
    cl: CellList, excl_table, pos, box, cell_chunk=None,
):
    """Nonbonded energies + forces in cell-pair form.

    TPU-native formulation: positions and per-atom attributes are gathered
    into the (ncells, capacity) slot layout ONCE per evaluation (cell-slice
    granularity, not per-pair rows), then every chunk of cells evaluates a
    dense (capacity x stencil^3*capacity) pair block against its neighbor
    cells -- pure vectorized math, no per-pair gathers. Forces accumulate
    in slot layout and scatter back to atoms with a single segment add.

    Same physics as potentials.nonbonded_energy_forces (0.5 * symmetric
    double count); equivalence is tested against the dense path.
    """
    n = pos.shape[0]
    cap = clcfg.capacity
    s3 = clcfg.stencil ** 3
    ncells = clcfg.ncells[0] * clcfg.ncells[1] * clcfg.ncells[2]
    slots = cl.slots                                   # (ncells, cap)
    table = jnp.asarray(neighbor_cell_table(clcfg))    # (ncells, S3)
    dtype = pos.dtype

    if cell_chunk is None:
        e_width = excl_table.shape[1]
        budget = 48_000_000  # elements in the largest boolean intermediate
        cell_chunk = max(1, min(ncells, budget // max(cap * s3 * cap * e_width, 1)))
    nchunk = -(-ncells // cell_chunk)
    ncpad = nchunk * cell_chunk

    # slot-layout attribute tables (single cheap gathers)
    pos_pad = jnp.concatenate([pos, jnp.zeros((1, 3), dtype)])
    P = pos_pad[slots]                                 # (ncells, cap, 3)
    q_pad = jnp.concatenate([ffp.charges.astype(dtype), jnp.zeros(1, dtype)])
    Q = q_pad[slots]
    if ffp.lj_ab is not None:
        t_pad = jnp.concatenate(
            [ffp.mapped_atom_types, jnp.zeros(1, ffp.mapped_atom_types.dtype)]
        )
        TY = t_pad[slots]
        SG = EP = None
    else:
        s_at = ffp.lj_params[:, 0].astype(dtype)[ffp.mapped_atom_types]
        e_at = ffp.lj_params[:, 1].astype(dtype)[ffp.mapped_atom_types]
        SG = jnp.concatenate([s_at, jnp.zeros(1, dtype)])[slots]
        EP = jnp.concatenate([e_at, jnp.zeros(1, dtype)])[slots]
        TY = None
    e_width = excl_table.shape[1]
    excl_pad = jnp.concatenate(
        [excl_table, jnp.full((1, e_width), n, excl_table.dtype)]
    )
    EX = excl_pad[slots]                               # (ncells, cap, E)

    def pad_cells(a, fill=0):
        return jnp.pad(
            a, [(0, ncpad - ncells)] + [(0, 0)] * (a.ndim - 1),
            constant_values=fill,
        )

    Pc_all = pad_cells(P)
    Sc_all = pad_cells(slots, n)
    Qc_all = pad_cells(Q)
    EXc_all = pad_cells(EX, n)
    Tb_all = pad_cells(table)  # padded cells read neighbor block 0 (masked)
    if TY is not None:
        TYc_all = pad_cells(TY)
    else:
        SGc_all = pad_cells(SG)
        EPc_all = pad_cells(EP)

    boxv = jnp.asarray(box, dtype)
    safe = jnp.where(boxv > 0, boxv, 1.0)

    needs_ab = any(t in cfg.terms for t in ("lj", "repulsion", "repulsioncg"))
    want_elec = "electrostatics" in cfg.terms

    def block(args):
        if TY is not None:
            Pc, Sc, Qc, EXc, nbr, TYc = args
        else:
            Pc, Sc, Qc, EXc, nbr, SGc, EPc = args
        cc = Pc.shape[0]
        # neighbor-side data: cell-slice gathers
        Pn = P[nbr].reshape(cc, s3 * cap, 3)
        cand = slots[nbr].reshape(cc, s3 * cap)
        Qn = Q[nbr].reshape(cc, s3 * cap)

        dv = Pc[:, :, None, :] - Pn[:, None, :, :]     # (cc, cap, S3cap, 3)
        dv = dv - jnp.where(boxv > 0, safe * jnp.round(dv / safe), 0.0)
        d2 = jnp.sum(dv * dv, axis=-1)

        valid = (cand[:, None, :] < n) & (Sc[:, :, None] < n)
        valid = valid & (cand[:, None, :] != Sc[:, :, None])
        excl_hit = jnp.any(
            EXc[:, :, None, :] == cand[:, None, :, None], axis=-1
        )
        valid = valid & ~excl_hit

        d2 = jnp.where(valid, d2, 1.0)
        dist = jnp.sqrt(d2)
        rinv = 1.0 / dist
        mask = valid & (dist <= cfg.cutoff)
        fmask = mask.astype(dtype)

        pot = {}
        g = jnp.zeros_like(d2)
        if needs_ab:
            if TY is not None:
                TYn = jnp.zeros(0)  # placeholder (defined below)
                tyn = (
                    jnp.concatenate(
                        [ffp.mapped_atom_types,
                         jnp.zeros(1, ffp.mapped_atom_types.dtype)]
                    )[cand]
                )
                A = ffp.lj_ab[0].astype(dtype)[TYc[:, :, None], tyn[:, None, :]]
                B = ffp.lj_ab[1].astype(dtype)[TYc[:, :, None], tyn[:, None, :]]
            else:
                SGn = SG.reshape(-1)[  # neighbor sigma via cell slices
                    jnp.zeros(0, jnp.int32)
                ] if False else SG[nbr].reshape(cc, s3 * cap)
                EPn = EP[nbr].reshape(cc, s3 * cap)
                sig = 0.5 * (SGc[:, :, None] + SGn[:, None, :])
                eps = jnp.sqrt(jnp.abs(EPc[:, :, None] * EPn[:, None, :]))
                s6 = sig**6
                B = 4.0 * eps * s6
                A = B * s6
            rinv6 = rinv**6
            rinv12 = rinv6 * rinv6
        if "lj" in cfg.terms:
            p = A * rinv12 - B * rinv6
            dEdr = (-12.0 * A * rinv12 + 6.0 * B * rinv6) * rinv
            if cfg.switch_dist is not None and cfg.cutoff is not None:
                t = (dist - cfg.switch_dist) / (cfg.cutoff - cfg.switch_dist)
                sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
                dsw = t * t * (-30.0 + t * (60.0 - t * 30.0)) / (
                    cfg.cutoff - cfg.switch_dist
                )
                in_sw = dist > cfg.switch_dist
                dEdr = jnp.where(in_sw, dEdr * sw + p * dsw, dEdr)
                p = jnp.where(in_sw, p * sw, p)
            pot["lj"] = 0.5 * jnp.sum(p * fmask)
            g = g + dEdr * rinv * fmask
        if "repulsion" in cfg.terms:
            pot["repulsion"] = 0.5 * jnp.sum(A * rinv12 * fmask)
            g = g + (-12.0 * A * rinv12 * rinv * rinv) * fmask
        if "repulsioncg" in cfg.terms:
            pot["repulsioncg"] = 0.5 * jnp.sum(B * rinv6 * fmask)
            g = g + (-6.0 * B * rinv6 * rinv * rinv) * fmask
        if want_elec:
            qq = ELEC_FACTOR * Qc[:, :, None] * Qn[:, None, :]
            if cfg.ewald_alpha is not None:
                a = cfg.ewald_alpha
                erfc_t = jax.scipy.special.erfc(a * dist)
                p = qq * erfc_t * rinv
                dEdr_r = -qq * rinv * rinv * (
                    erfc_t * rinv
                    + (2.0 * a / jnp.sqrt(jnp.pi)) * jnp.exp(-(a * dist) ** 2)
                )
            elif cfg.rfa and cfg.cutoff is not None:
                denom = 2.0 * cfg.solvent_dielectric + 1.0
                krf = (1.0 / cfg.cutoff**3) * (cfg.solvent_dielectric - 1.0) / denom
                crf = (1.0 / cfg.cutoff) * (3.0 * cfg.solvent_dielectric) / denom
                p = qq * (rinv + krf * d2 - crf)
                dEdr_r = qq * (2.0 * krf - rinv * rinv * rinv)
            else:
                p = qq * rinv
                dEdr_r = -qq * rinv * rinv * rinv
            pot["electrostatics"] = 0.5 * jnp.sum(p * fmask)
            g = g + dEdr_r * fmask

        f_slots = -jnp.einsum("icj,icjk->ick", g, dv)   # (cc, cap, 3)
        return pot, f_slots

    def stack(a):
        return a.reshape((nchunk, cell_chunk) + a.shape[1:])

    if TY is not None:
        args = (stack(Pc_all), stack(Sc_all), stack(Qc_all), stack(EXc_all),
                stack(Tb_all), stack(TYc_all))
    else:
        args = (stack(Pc_all), stack(Sc_all), stack(Qc_all), stack(EXc_all),
                stack(Tb_all), stack(SGc_all), stack(EPc_all))
    pots, f_blocks = jax.lax.map(block, args)
    out = {k: jnp.sum(v) for k, v in pots.items()}

    # scatter slot forces back to atoms (padding rows land in the n-th bin)
    f_flat = f_blocks.reshape(-1, 3)
    ids = Sc_all.reshape(-1)
    forces = jnp.zeros((n + 1, 3), dtype).at[ids].add(f_flat)[:n]
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
    box = tuple(float(b) for b in np.asarray(box).reshape(-1)[:3])
    nc = tuple(max(1, int(b // subcell_size)) for b in box)
    cfg = CellListConfig(box, subcell_size, 0.0, nc, 1, 1, split=1)
    table = neighbor_cell_table(cfg)
    pairs = set()
    for c in range(table.shape[0]):
        for c2 in table[c]:
            pairs.add((min(c, int(c2)), max(c, int(c2))))
    return nc, np.asarray(sorted(pairs), dtype=np.int64).reshape(-1, 2)

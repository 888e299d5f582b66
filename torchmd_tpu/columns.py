"""z-sorted column neighbor structure for the large-N nonbonded path.

Build-side companion of ops/pallas_column.py (see its docstring for the
kernel design). This module owns the static configuration, the jittable
(re)build that produces the slot layout + window table, and the
`ColumnKernel` class that duck-types `neighbors.CellKernel` so the
integrator's kernel-carrying scan, rebuild `lax.cond` and overflow
grow/retry machinery work unchanged.

Layout produced by `build_columns`:

  - `islot`  (ncol, C)  int32: atoms of each (x, y) column, z-sorted
    (N = padding). C is a multiple of IBLK.
  - `jslot`  (ncol, CE) int32: the same atoms plus z-ghost duplicates
    (entries within cutoff+skin of a z face appear again shifted by
    +-Lz), all z-sorted; `jzshift` carries the per-slot z shift.
  - `wstart` (ncol, 9, NB) int32: for every IBLK-wide i block and every
    3x3 neighbour column, the start of the contiguous extended-slot
    window of static width W that covers all partners within
    cutoff+skin in z (computed from a per-column cumulative z
    histogram; -1 marks all-padding blocks).
  - `iattr`/`jattr`: per-slot q/sigma/epsilon/id (+ exclusion-id rows on
    the i side), gathered once per rebuild.

Validity between rebuilds follows the standard skin/2 displacement
criterion, identical to the cell path; evaluation positions are anchored
to the build frame (neighbors.anchored_positions) so atoms that cross a
periodic face between rebuilds stay continuous with their slots.

The reference has no neighbor structure at all (all-vs-all,
torchmd/forces.py:348-357); this realizes the design its dead sketch
gestures at (torchmd/neighbourlist.py:4-48) in TPU-native form.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import FFParams, ForceTermConfig
from .neighbors import anchored_positions, build_exclusion_table


class ColumnConfig(NamedTuple):
    box: tuple          # concrete (lx, ly, lz)
    cutoff: float
    skin: float
    ncols: tuple        # (ncx, ncy)
    C: int              # main column capacity (multiple of IBLK)
    CE: int             # ghost-extended capacity (multiple of 128, >= W)
    W: int              # window width (multiple of 128)
    IBLK: int = 32      # i-block rows per window lookup
    nbins: int = 512    # z-histogram resolution for window starts
    nexcl: int = 0      # exclusion-list width (i-side attr rows)
    P: int = 1          # phase replicas of the j panels (1, 2, 4 or 8):
                        # replica p is the extended array shifted left by
                        # p * (128 // P) slots, so window starts are
                        # (128 // P)-slot granular instead of panel-aligned

    @property
    def rc(self):
        return self.cutoff + self.skin

    @property
    def stride(self):
        return 128 // self.P

    @property
    def NB(self):
        return self.C // self.IBLK

    @property
    def ncol(self):
        return self.ncols[0] * self.ncols[1]


def _round_up(n: int, m: int) -> int:
    return -(-int(n) // m) * m


def column_grid_feasible(box, cutoff, skin=2.0) -> bool:
    b = np.asarray(box, np.float64).reshape(-1)[:3]
    if not np.all(b > 0):
        return False
    rc = float(cutoff) + float(skin)
    return bool(b[0] // rc >= 3 and b[1] // rc >= 3 and b[2] >= 2 * rc)


def make_column_config(box, cutoff, skin=2.0, pos0=None, natoms=None,
                       nexcl=0, IBLK=32, nbins=512,
                       phases=(1,)) -> ColumnConfig:
    """Derive the static column configuration. `pos0` (recommended) sizes
    the capacities and window width from the real starting occupancies;
    without it a uniform-density estimate is used. The overflow
    grow/retry machinery covers later density fluctuations.

    phases: candidate P values (j-panel phase-replica counts) to
    consider; the (W, P) pair with the smallest window wins. Default
    (1,): on v5e the per-block dynamic phase index measures SLOWER than
    the whole-panel round-down it avoids (docs/PERF.md), so multi-phase
    is opt-in (TMD_COL_PHASES) for hardware where Mosaic lowers the
    two-level dynamic window select more cheaply."""
    box = tuple(float(b) for b in np.asarray(box).reshape(-1)[:3])
    if not column_grid_feasible(box, cutoff, skin):
        raise ValueError(
            f"Box {box} cannot host a 3x3 column grid with "
            f"rc={cutoff + skin}"
        )
    rc = float(cutoff) + float(skin)
    ncx = max(3, int(box[0] // rc))
    ncy = max(3, int(box[1] // rc))
    cfg = ColumnConfig(box, float(cutoff), float(skin), (ncx, ncy),
                       IBLK, 128, 128, IBLK, nbins, int(nexcl))
    if pos0 is not None:
        pos0 = np.asarray(pos0, np.float64).reshape(-1, 3)
        occ, occ_e, wneed = _occupancy_probe(pos0, cfg)
        C = _round_up(max(IBLK, occ * 1.15 + 8), IBLK)
        CE = _round_up(max(128, occ_e * 1.12 + 8), 128)
        # Window starts are (128 // P)-slot granular: the kernel keeps P
        # phase-shifted replicas of the j panels, so start round-down
        # slack is stride-1 slots instead of 127. Pick the smallest P
        # whose W matches the best achievable -- W sets the pair-tile
        # compute, P replicates j bandwidth and pays a per-block dynamic
        # phase index (measured net-negative on v5e, hence phases=(1,)
        # by default; docs/PERF.md).
        need = wneed * 1.15 + 8
        cand = [(_round_up(max(128, need + 128 // p - 1), 128), p)
                for p in phases]
        W, P = min(cand)
        cfg = cfg._replace(P=P)
    else:
        n = natoms or 1000
        dens = n / (box[0] * box[1] * box[2])
        col = dens * (box[0] / ncx) * (box[1] / ncy) * box[2]
        C = _round_up(max(IBLK, col * 1.2 + 4 * np.sqrt(max(col, 1.0))),
                      IBLK)
        CE = _round_up(C * (1.0 + 2 * rc / box[2]) + 8, 128)
        zfrac = (2 * rc + IBLK / max(col / box[2], 1e-9)) / (
            box[2] + 2 * rc
        )
        W = _round_up(
            max(128, CE * min(zfrac, 1.0) + 4 * np.sqrt(max(col, 1.0))
                + 127),
            128,
        )
    CE = max(CE, W)
    return cfg._replace(C=int(C), CE=int(CE), W=int(W))


def _occupancy_probe(pos0, cfg: ColumnConfig):
    """Host-side numpy probe of per-column occupancy, extended occupancy
    and worst-case window need for the starting configuration."""
    b = np.asarray(cfg.box)
    rc = cfg.rc
    ncx, ncy = cfg.ncols
    p = pos0 - b * np.floor(pos0 / b)
    cx = np.clip((p[:, 0] / b[0] * ncx).astype(int), 0, ncx - 1)
    cy = np.clip((p[:, 1] / b[1] * ncy).astype(int), 0, ncy - 1)
    col = cx * ncy + cy
    z = p[:, 2]
    occ = np.bincount(col, minlength=cfg.ncol).max() if len(col) else 1
    # extended entries
    ghost_hi = z < rc
    ghost_lo = z > b[2] - rc
    cole = np.concatenate([col, col[ghost_hi], col[ghost_lo]])
    ze = np.concatenate([z, z[ghost_hi] + b[2], z[ghost_lo] - b[2]])
    occ_e = np.bincount(cole, minlength=cfg.ncol).max() if len(cole) else 1
    # worst window need: per column, sort z; for IBLK-chunks find count
    # of extended entries within the BIN-QUANTIZED [zlo-rc, zhi+rc]
    # window in each neighbour column (the device build sorts z at
    # nbins granularity and rounds windows outward to bin edges, so the
    # probe must count the same bin-superset)
    wneed = 1
    ncol = cfg.ncol
    span = b[2] + 2 * rc
    binw = span / cfg.nbins
    zbin_e = np.clip(((ze + rc) / span * cfg.nbins).astype(int),
                     0, cfg.nbins - 1)
    bins_by_col = [np.sort(zbin_e[cole == c]) for c in range(ncol)]
    nbr = column_neighbor_table(cfg)
    for c in range(ncol):
        zc = np.sort(z[col == c])
        for s in range(0, len(zc), cfg.IBLK):
            chunk = zc[s:s + cfg.IBLK]
            lo, hi = chunk[0] - binw - rc, chunk[-1] + binw + rc
            lob = int(np.clip((lo + rc) / span * cfg.nbins, 0,
                              cfg.nbins - 1))
            hib = int(np.clip((hi + rc) / span * cfg.nbins, 0,
                              cfg.nbins - 1))
            for c2 in nbr[c]:
                arr = bins_by_col[c2]
                need = np.searchsorted(arr, hib, side="right") - \
                    np.searchsorted(arr, lob, side="left")
                wneed = max(wneed, int(need))
    return int(occ), int(occ_e), int(wneed)


def column_neighbor_table(cfg: ColumnConfig) -> np.ndarray:
    """(ncol, 9) static table of 3x3 neighbour column ids (periodic)."""
    ncx, ncy = cfg.ncols
    cx, cy = np.meshgrid(np.arange(ncx), np.arange(ncy), indexing="ij")
    cx, cy = cx.ravel()[:, None], cy.ravel()[:, None]
    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    nx = (cx + offs[None, :, 0]) % ncx
    ny = (cy + offs[None, :, 1]) % ncy
    return (nx * ncy + ny).astype(np.int32)


def column_shift_table(cfg: ColumnConfig) -> np.ndarray:
    """(ncol, 9, 2) f32 static x/y wrap UNIT counts (-1/0/+1) for wrapped
    neighbour columns; the eval path multiplies by the CURRENT box
    lengths (so in-scan box changes — the MTK barostat — stay exact)."""
    ncx, ncy = cfg.ncols
    cx, cy = np.meshgrid(np.arange(ncx), np.arange(ncy), indexing="ij")
    cx, cy = cx.ravel()[:, None], cy.ravel()[:, None]
    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    tx = cx + offs[None, :, 0]
    ty = cy + offs[None, :, 1]
    sx = np.where(tx < 0, -1.0, np.where(tx >= ncx, 1.0, 0.0))
    sy = np.where(ty < 0, -1.0, np.where(ty >= ncy, 1.0, 0.0))
    return np.stack([sx, sy], axis=-1).astype(np.float32)


class ColumnState(NamedTuple):
    islot: jnp.ndarray     # (ncol, C) int32, N = padding
    jslot: jnp.ndarray     # (ncol, CE) int32, N = padding
    jzshift: jnp.ndarray   # (ncol, CE) f32
    wstart: jnp.ndarray    # (ncol, 9, NB) int32, -1 = skip
    iattr: jnp.ndarray     # (ncol, 4 + nexcl, C) f32: q,sig,eps,id,excl..
    jattr: jnp.ndarray     # (ncol, 4, CE) f32: q,sig,eps,id
    ref_pos: jnp.ndarray   # (N, 3) build-time positions
    overflow: jnp.ndarray  # bool scalar (capacity or window overflow)


def build_columns(pos, cfg: ColumnConfig, ffp: FFParams, excl_table,
                  box=None) -> ColumnState:
    """Jittable (vmap-compatible) rebuild: sort, slot, window, attrs.

    Scatter-free design (round 5): XLA serializes TPU scatters, and the
    original rebuild spent most of its 43 ms in `.at[col, rank].set`
    slot scatters + the rank/histogram machinery feeding them
    (docs/PERF.md). Instead, each side is ONE stable `lax.sort` on a
    fused int32 key `col * nbins + zbin`; the sorted order is already
    grouped by column, so the padded (ncol, C/CE) slot tables come from
    gathering contiguous runs (destination-indexed — no scatter), and
    the per-block window starts come from `searchsorted` directly into
    the sorted keys (no histogram, no cumsum, no take_along_axis).
    z ordering inside a column is bin-granular (nbins over the extended
    span); windows quantize outward by one bin, which the occupancy
    probe's W sizing accounts for."""
    n = pos.shape[0]
    dtype = pos.dtype
    b = jnp.asarray(cfg.box if box is None else box, dtype).reshape(3)
    rc = cfg.rc
    ncx, ncy = cfg.ncols
    ncol = cfg.ncol
    C, CE, W, IBLK, NB = cfg.C, cfg.CE, cfg.W, cfg.IBLK, cfg.NB
    nbins = cfg.nbins
    span = b[2] + 2 * rc
    binw = span / nbins

    pos_w = pos - b * jnp.floor(pos / b)
    x, y, z = pos_w[:, 0], pos_w[:, 1], pos_w[:, 2]
    cx = jnp.clip((x / b[0] * ncx).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip((y / b[1] * ncy).astype(jnp.int32), 0, ncy - 1)
    col = cx * ncy + cy

    col_edges = jnp.arange(ncol + 1, dtype=jnp.int32) * nbins

    # ---- i side: one fused-key sort + contiguous-run gather ---------
    zbin_i = jnp.clip(((z + rc) / span * nbins).astype(jnp.int32),
                      0, nbins - 1)
    key_i = col * nbins + zbin_i
    iota_i = jnp.arange(n, dtype=jnp.int32)
    key_is, order_i, z_is = jax.lax.sort(
        (key_i, iota_i, z), num_keys=1
    )
    starts_i = jnp.searchsorted(key_is, col_edges).astype(jnp.int32)
    cnt_i = starts_i[1:] - starts_i[:-1]        # (ncol,)
    overflow_i = jnp.any(cnt_i > C)
    slotpos = starts_i[:-1, None] + jnp.arange(C, dtype=jnp.int32)
    valid_i = jnp.arange(C, dtype=jnp.int32)[None, :] < \
        jnp.minimum(cnt_i, C)[:, None]
    order_i_pad = jnp.concatenate(
        [order_i, jnp.full((1,), n, jnp.int32)]
    )
    islot = jnp.where(
        valid_i, order_i_pad[jnp.minimum(slotpos, n)], n
    ).astype(jnp.int32)                         # (ncol, C)

    # ---- j side: main + z-ghost duplicates, same design --------------
    ghost_hi = z < rc               # duplicated above the top face
    ghost_lo = z > b[2] - rc        # duplicated below z = 0
    colj = jnp.concatenate([
        col,
        jnp.where(ghost_hi, col, ncol),
        jnp.where(ghost_lo, col, ncol),
    ])
    zj = jnp.concatenate([z, z + b[2], z - b[2]])
    zbin_j = jnp.clip(((zj + rc) / span * nbins).astype(jnp.int32),
                      0, nbins - 1)
    key_j = colj * nbins + zbin_j
    iota_j = jnp.arange(3 * n, dtype=jnp.int32)
    key_js, order_j = jax.lax.sort((key_j, iota_j), num_keys=1)
    starts_j = jnp.searchsorted(key_js, col_edges).astype(jnp.int32)
    cnt_j = starts_j[1:] - starts_j[:-1]
    overflow_j = jnp.any(cnt_j > CE)
    slotposj = starts_j[:-1, None] + jnp.arange(CE, dtype=jnp.int32)
    valid_j = jnp.arange(CE, dtype=jnp.int32)[None, :] < \
        jnp.minimum(cnt_j, CE)[:, None]
    order_j_pad = jnp.concatenate(
        [order_j, jnp.full((1,), 3 * n, jnp.int32)]
    )
    g = jnp.where(valid_j, order_j_pad[jnp.minimum(slotposj, 3 * n)],
                  3 * n)                        # (ncol, CE) entry ids
    # entry id k < n is the atom itself, [n, 2n) the +Lz ghost copy,
    # [2n, 3n) the -Lz copy, 3n padding; ghost z shift stored as a UNIT
    # count (+-1/0) — the eval path multiplies by the CURRENT box Lz so
    # in-scan box changes (MTK barostat) stay exact
    jslot = jnp.where(g < 3 * n, g % n, n).astype(jnp.int32)
    jzshift = jnp.where(
        g < n, 0.0, jnp.where(g < 2 * n, 1.0,
                              jnp.where(g < 3 * n, -1.0, 0.0))
    ).astype(dtype)

    # ---- i-block z ranges + window starts via searchsorted ----------
    # blocks are contiguous IBLK runs of the sorted i side; z is
    # ascending within a column up to one bin of disorder, so the block
    # z range is [z(first) - binw, z(last) + binw]
    ends_i_cap = jnp.minimum(starts_i[:-1] + jnp.minimum(cnt_i, C),
                             starts_i[:-1] + C)
    blk0 = starts_i[:-1, None] + \
        jnp.arange(NB, dtype=jnp.int32)[None, :] * IBLK     # (ncol, NB)
    block_valid = blk0 < ends_i_cap[:, None]
    blk_last = jnp.clip(
        jnp.minimum(blk0 + IBLK, ends_i_cap[:, None]) - 1, 0, n - 1
    )
    big = jnp.asarray(np.finfo(np.float32).max / 4, dtype)
    z_is_pad = jnp.concatenate([z_is, jnp.full((1,), big, dtype)])
    zlo = z_is_pad[jnp.minimum(blk0, n)] - binw - rc
    zhi = z_is_pad[blk_last] + binw + rc
    lob = jnp.clip(((zlo + rc) / span * nbins).astype(jnp.int32),
                   0, nbins - 1)
    hib = jnp.clip(((zhi + rc) / span * nbins).astype(jnp.int32),
                   0, nbins - 1)
    nbr = jnp.asarray(column_neighbor_table(cfg))      # (ncol, 9)
    q_start = nbr[:, :, None] * nbins + lob[:, None, :]
    q_end = nbr[:, :, None] * nbins + hib[:, None, :] + 1
    start_g = jnp.searchsorted(key_js, q_start.reshape(-1)).reshape(
        ncol, 9, NB
    ).astype(jnp.int32)
    end_g = jnp.searchsorted(key_js, q_end.reshape(-1)).reshape(
        ncol, 9, NB
    ).astype(jnp.int32)
    col_base = starts_j[:-1][nbr]                      # (ncol, 9)
    start = start_g - col_base[:, :, None]
    end_need = end_g - col_base[:, :, None]
    # Windows are (128 // P)-slot granular: the kernel's j layout is
    # panel-major with P phase-shifted replicas, so a window select is a
    # free leading-dim (phase, panel) dynamic index. Starts round down
    # by at most stride-1 slots; W carries that slack, sized in
    # make_column_config / grow. wstart stores the start in STRIDE
    # units; the kernel decodes phase = mod(k, P), panel = k // P.
    S = cfg.stride
    startq = start // S
    overflow_w = jnp.any(
        block_valid[:, None, :] & ((end_need - startq * S) > W)
    )
    # CE, W are multiples of 128 and S divides 128, so this clamp is
    # slack-free (clamped windows still end exactly at CE >= end_need)
    startq = jnp.minimum(startq, (CE - W) // S)
    wstart = jnp.where(block_valid[:, None, :], startq, -1).astype(
        jnp.int32
    )

    # ---- per-slot attributes (rebuild-constant) ---------------------
    f32pad = lambda v: jnp.concatenate(
        [jnp.asarray(v, dtype), jnp.zeros((1,), dtype)]
    )
    q = f32pad(ffp.charges)
    if ffp.lj_params is not None:
        # pair_terms' LB contract: rows carry sigma/2 and sqrt(|eps|)
        sig = f32pad(0.5 * ffp.lj_params[:, 0][ffp.mapped_atom_types])
        eps = f32pad(jnp.sqrt(jnp.abs(
            ffp.lj_params[:, 1][ffp.mapped_atom_types]
        )))
    else:
        sig = f32pad(jnp.zeros(n))
        eps = f32pad(jnp.zeros(n))
    idf = jnp.concatenate(
        [jnp.arange(n, dtype=dtype), jnp.full((1,), float(n), dtype)]
    )

    # ONE wide gather per side: rows of a stacked (n+1, 4+nexcl) atom
    # attribute matrix. TPU gathers pay per ROW, not per element, so one
    # (4+nexcl)-wide row gather beats 4+nexcl separate scalar gathers of
    # the same slot table by ~that factor (rebuild was gather-bound at
    # 62.5k atoms, docs/PERF.md).
    attr = jnp.stack([q, sig, eps, idf], axis=1)        # (n+1, 4)
    if cfg.nexcl:
        excl_pad = jnp.concatenate(
            [jnp.asarray(excl_table, dtype),
             jnp.full((1, cfg.nexcl), float(n), dtype)]
        )
        attr = jnp.concatenate([attr, excl_pad], axis=1)
    iattr = jnp.swapaxes(attr[islot], 1, 2)     # (ncol, 4+nexcl, C)
    jattr = jnp.swapaxes(attr[jslot, :4], 1, 2)  # (ncol, 4, CE)

    return ColumnState(
        islot, jslot, jzshift, wstart, iattr, jattr, pos,
        overflow_i | overflow_j | overflow_w,
    )


def column_needs_rebuild(st: ColumnState, pos, cfg: ColumnConfig,
                         box=None):
    from .neighbors import displacement_trigger

    d = pos - st.ref_pos
    b = jnp.asarray(cfg.box if box is None else box, pos.dtype).reshape(3)
    d = d - b * jnp.round(d / b)
    return displacement_trigger(jnp.sum(d * d, axis=1), cfg.skin)


def column_energy_forces(ffp: FFParams, cfg: ForceTermConfig,
                         ccfg: ColumnConfig, st: ColumnState, pos, box,
                         shifts=None, interpret=False, with_virial=False):
    """Nonbonded energies + forces via the column pair kernel.

    `with_virial=True` additionally returns the per-axis pair virial
    (3,) — the MTK scaling virial -dE/ds_a of E(s*pos, s*box) for the
    kernel-covered pair terms."""
    from .ops.pallas_column import column_pair_call
    from .ops.pallas_nonbonded import make_kernel_cfg

    n = pos.shape[0]
    f32 = jnp.float32
    kcfg = make_kernel_cfg(cfg, False)  # wrap handled by shifts/ghosts
    boxv = jnp.asarray(box, f32)
    pos_e = anchored_positions(
        jnp.asarray(pos, f32), jnp.asarray(st.ref_pos, f32), boxv
    )
    pos_pad = jnp.concatenate([pos_e, jnp.zeros((1, 3), f32)])

    Pi = pos_pad[st.islot]                      # (ncol, C, 3)
    Pj = pos_pad[st.jslot]                      # (ncol, CE, 3)
    jz = Pj[..., 2] + st.jzshift.astype(f32) * boxv[2]

    i_data = jnp.concatenate(
        [Pi.transpose(0, 2, 1), st.iattr.astype(f32)], axis=1
    )                                           # (ncol, Ri, C)
    Ri = i_data.shape[1]
    i_data = i_data.reshape(
        i_data.shape[0], Ri, ccfg.NB, ccfg.IBLK
    ).transpose(0, 2, 1, 3)                     # (ncol, NB, Ri, IBLK)
    j_data = jnp.concatenate(
        [Pj[..., 0][:, None, :], Pj[..., 1][:, None, :],
         jz[:, None, :], st.jattr.astype(f32)], axis=1
    )                                           # (ncol, Rj, CE)
    Rj = j_data.shape[1]
    ncol = j_data.shape[0]
    P, S, CE = ccfg.P, ccfg.stride, ccfg.CE
    if P > 1:
        # phase replicas: replica p = the extended array shifted left by
        # p*S slots (tail padded with id = n so the kernel masks it)
        padw = (P - 1) * S
        pad = jnp.zeros((ncol, Rj, padw), f32).at[:, 6, :].set(float(n))
        jd_pad = jnp.concatenate([j_data, pad], axis=2)
        j_data = jnp.stack(
            [jd_pad[:, :, p * S:p * S + CE] for p in range(P)], axis=1
        )                                       # (ncol, P, Rj, CE)
        jslot_pad = jnp.concatenate(
            [st.jslot, jnp.full((ncol, padw), n, jnp.int32)], axis=1
        )
        jsl_rep = jnp.stack(
            [jslot_pad[:, p * S:p * S + CE] for p in range(P)], axis=1
        )                                       # (ncol, P, CE)
    else:
        j_data = j_data[:, None]
        jsl_rep = st.jslot[:, None]
    j_data = j_data.reshape(
        ncol, P, Rj, CE // 128, 128
    ).transpose(0, 1, 3, 2, 4)                  # (ncol, P, CE/128, Rj, 128)
    if shifts is None:
        shifts = jnp.asarray(column_shift_table(ccfg))
    # shift table carries wrap unit counts; scale by the CURRENT box so
    # in-scan box changes (MTK barostat) keep the ghost geometry exact
    shifts_abs = shifts.reshape(-1, 9, 2) * boxv[None, None, :2]

    res = column_pair_call(
        kcfg, ccfg.ncols[0], ccfg.ncols[1], i_data, j_data,
        st.wstart, shifts_abs, IBLK=ccfg.IBLK, W=ccfg.W, NB=ccfg.NB,
        nexcl=ccfg.nexcl, nfloat=n, P=P, interpret=interpret,
        with_virial=with_virial,
    )
    if with_virial:
        e_lj, e_el, f_out, jacc, vir_raw = res
    else:
        e_lj, e_el, f_out, jacc = res

    f_slots = f_out.transpose(0, 1, 3, 2).reshape(-1, 3)
    forces = jnp.zeros((n + 1, 3), f32).at[
        st.islot.reshape(-1)
    ].add(f_slots)
    # Newton: j-side forces of the directed half-stencil come back in
    # extended-slot-replica layout (each replica scatters with its own
    # shifted slot map; ghost duplicates fold onto the real atom id)
    j_rows = jacc.transpose(0, 1, 2, 4, 3).reshape(-1, 3)
    forces = forces.at[jsl_rep.reshape(-1)].add(j_rows)[:n]

    out = {}
    if kcfg["lj"]:
        out["lj"] = e_lj
    if kcfg["repulsion"]:
        out["repulsion"] = e_lj
    if kcfg["repulsioncg"]:
        out["repulsioncg"] = e_lj
    if kcfg["elec"]:
        out["electrostatics"] = e_el
    if with_virial:
        return out, forces, -0.5 * vir_raw
    return out, forces


def column_supported(cfg: ForceTermConfig, ffp: FFParams, box,
                     skin=2.0) -> bool:
    """Can the column kernel serve this system? Requires a feasible 3x3
    column grid, Lorentz-Berthelot LJ (no NBFIX tables) and the Pallas
    term set (one LJ-family term)."""
    from .ops.pallas_nonbonded import pallas_supported_terms

    return (
        cfg.cutoff is not None
        and box is not None
        and ffp.lj_ab is None
        and pallas_supported_terms(cfg)
        and column_grid_feasible(box, cfg.cutoff, skin)
    )


class ColumnKernel:
    """Large-N nonbonded kernel on the z-sorted column structure;
    duck-type compatible with `neighbors.CellKernel` (build / update /
    needs_rebuild / energy_forces / covers / with_box / check_overflow /
    grow) so the integrator's kernel-carrying scan works unchanged."""

    def __init__(self, ffp: FFParams, cfg: ForceTermConfig, parameters,
                 box, skin=2.0, exclusions=("bonds", "angles", "1-4"),
                 capacity=None, pos0=None, interpret=False):
        if cfg.cutoff is None:
            raise ValueError("Column lists require a cutoff")
        natoms = int(ffp.charges.shape[0])
        self.ffp = ffp
        self.cfg = cfg
        self.interpret = interpret
        self.excl_table = build_exclusion_table(
            parameters, natoms, 0, exclusions
        )
        import os as _os

        # IBLK trades i-block granularity against window z-span: smaller
        # blocks tighten the per-block window (less padded work) but pay
        # per-block overhead (window copy, mask rows, scalar fetch) and
        # under-fill sublanes. v5e measurements at 24k gas density
        # (docs/PERF.md): 16 -> 4.1 ms eval, 32 -> 3.2, 48 -> 2.9 (best),
        # 64/96 -> ~2.95 (window z-span growth cancels the block savings)
        iblk = int(_os.environ.get("TMD_COL_IBLK", "48"))
        phases = tuple(
            int(p) for p in
            _os.environ.get("TMD_COL_PHASES", "1").split(",")
        )
        self.ccfg = make_column_config(
            box, cfg.cutoff, skin=skin, pos0=pos0, natoms=natoms,
            nexcl=int(self.excl_table.shape[1]), IBLK=iblk,
            phases=phases,
        )
        self._shifts = jnp.asarray(column_shift_table(self.ccfg))

    # -- CellKernel duck-type ------------------------------------------
    @property
    def clcfg(self):
        return self.ccfg

    def build(self, pos, box=None) -> ColumnState:
        return build_columns(pos, self.ccfg, self.ffp, self.excl_table,
                             box)

    def needs_rebuild(self, st: ColumnState, pos, box=None):
        return column_needs_rebuild(st, pos, self.ccfg, box)

    def update(self, pos, st: ColumnState, box=None) -> ColumnState:
        return jax.lax.cond(
            column_needs_rebuild(st, pos, self.ccfg, box),
            lambda: build_columns(pos, self.ccfg, self.ffp,
                                  self.excl_table, box),
            lambda: st,
        )

    def covers(self, box) -> bool:
        """True while the concrete box still hosts rc-wide columns and a
        2*rc-tall z extent (binning follows the traced box)."""
        b = np.asarray(box, np.float64).reshape(-1, 3).min(axis=0)
        rc = self.ccfg.rc
        edges_ok = (
            b[0] / self.ccfg.ncols[0] >= rc * (1 - 1e-9)
            and b[1] / self.ccfg.ncols[1] >= rc * (1 - 1e-9)
        )
        return bool(edges_ok and b[2] >= 2 * rc * (1 - 1e-9))

    def with_box(self, box, pos0=None):
        import copy

        new = copy.copy(self)
        new.ccfg = make_column_config(
            box, self.cfg.cutoff, skin=self.ccfg.skin, pos0=pos0,
            natoms=int(self.ffp.charges.shape[0]),
            nexcl=self.ccfg.nexcl, IBLK=self.ccfg.IBLK,
            phases=(self.ccfg.P,) if self.ccfg.P > 1 else (1,),
        )
        new._shifts = jnp.asarray(column_shift_table(new.ccfg))
        return new

    def energy_forces(self, pos, box, st: ColumnState):
        return column_energy_forces(
            self.ffp, self.cfg, self.ccfg, st, pos, box,
            shifts=self._shifts, interpret=self.interpret,
        )

    def energy_forces_virial(self, pos, box, st: ColumnState):
        """(pot, forces, per-axis pair virial (3,)) for the MTK barostat
        (same convention as CellKernel.energy_forces_virial)."""
        return column_energy_forces(
            self.ffp, self.cfg, self.ccfg, st, pos, box,
            shifts=self._shifts, interpret=self.interpret,
            with_virial=True,
        )

    def check_overflow(self, st: ColumnState) -> bool:
        return bool(np.asarray(st.overflow))

    def grow(self) -> "ColumnKernel":
        import copy

        new = copy.copy(self)
        c = self.ccfg
        new.ccfg = c._replace(
            C=_round_up(c.C * 3 // 2, c.IBLK),
            CE=max(_round_up(c.CE * 3 // 2, 128), c.W + 128),
            W=c.W + 128,
        )
        new.ccfg = new.ccfg._replace(CE=max(new.ccfg.CE, new.ccfg.W))
        return new

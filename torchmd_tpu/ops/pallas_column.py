"""Pallas TPU kernel: z-sorted column nonbonded evaluation (large-N path).

The ghost-column cell kernel (ops/pallas_cell.py) pays the classic
27-stencil padding tax: every cell evaluates 27 * capacity^2 pair slots,
and at gas density only ~2% of them are real pairs (docs/PERF.md). This
kernel replaces the z cell dimension entirely with the standard
sorted-column design (the same idea GROMACS' cluster pair search is built
on), laid out for the TPU's (8, 128) vector registers:

  - the box is gridded in x, y only (column edge >= cutoff + skin); atoms
    are sorted by (column, z) into per-column slot arrays,
  - for PBC in z each column also carries a ghost-extended copy: entries
    within rc of a z face are duplicated once, shifted by +-Lz, and the
    whole extended array is z-sorted -- so every i atom's neighbourhood
    is one CONTIGUOUS slot range,
  - at (re)build time, each block of IBLK consecutive i slots gets a
    precomputed window PANEL index into each neighbour column's extended
    array, via a per-column cumulative z histogram.

Newton's third law halves the stencil: of the 3x3 column offsets only
the self offset (symmetric evaluation, 0.5 pair factor) and the 4
lexicographically-positive directed offsets run; directed pairs count
once (weight 2 on the 0.5 factor), i-side row sums go to the i block
and j-side sums accumulate into ONE resident extended-slot block that
is a constant output block for the whole sequential grid (the same
trick as the dense triangular kernel's column-force accumulator).

Layouts are chosen so no dynamic lane/sublane slicing ever happens:

  - j data is stored panel-major with P phase replicas,
    (ncol, P, CE/128, Rj, 128): replica p is the extended array shifted
    left by p*(128/P) slots, so a window is Wq consecutive PANELS of
    one replica, selected by dynamic indices on the two leading
    (untiled) dimensions -- free on TPU. Phases make window starts
    (128/P)-slot granular: W need not carry a whole panel of round-down
    slack (at 24k gas density W drops 384 -> 256 for P=2, a 1.5x cut in
    pair-tile compute for a 2x j-stream bandwidth cost that VMEM
    residency hides),
  - i data is block-major, (ncol, NB, Ri, IBLK); the pair tile is
    (Wq, IBLK, 128) whose last two dims are exact register tiles,
  - per-block windows and per-(column, offset) x/y wrap shifts ride as
    1-D scalar-prefetch SMEM arrays (1-D deliberately: multi-dim SMEM
    gets tile-padded ~13x).

Forces fold as scatter(islot, i rows) + scatter(jslot, extended-slot
accumulator) in XLA (ghost duplicates land on their real atom id).
Reference point: this realizes the neighbour-list design sketched
(dead) in torchmd/neighbourlist.py:4-48, in fixed-shape form.

Requires Lorentz-Berthelot LJ (NBFIX A/B tables fall back) and at least
a 3x3 column grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .pallas_nonbonded import make_kernel_cfg, pair_terms

# directed half-stencil: index into the 9-offset (dx+1)*3+(dy+1) tables.
# o9 = 4 is the self offset; 5..8 are the (0,1),(1,-1),(1,0),(1,1)
# directed offsets (each unordered column pair visited exactly once,
# periodic wrap included -- each offset traces disjoint rings).
_SELF_O9 = 4


def _kernel(w_ref, s_ref, i_ref, j_ref, f_ref, jacc_ref, elj_ref,
            eel_ref, *rest, cfg, IBLK, Wq, NB, nexcl, nfloat, ncol, P,
            virial=False):
    vir_ref = rest[0] if virial else None
    c = pl.program_id(0)
    o = pl.program_id(1)          # 0 = self, 1..4 = directed
    o9 = o + 4
    f32 = jnp.float32

    @pl.when(o == 0)
    def _init_f():
        f_ref[...] = jnp.zeros(f_ref.shape, f_ref.dtype)

    @pl.when(jnp.logical_and(c == 0, o == 0))
    def _init_glob():
        jacc_ref[...] = jnp.zeros(jacc_ref.shape, jacc_ref.dtype)
        elj_ref[0, 0] = jnp.zeros((), f32)
        eel_ref[0, 0] = jnp.zeros((), f32)
        if virial:
            vir_ref[0, 0] = jnp.zeros((), f32)
            vir_ref[0, 1] = jnp.zeros((), f32)
            vir_ref[0, 2] = jnp.zeros((), f32)

    co = c * 9 + o9
    sx = s_ref[co * 2]
    sy = s_ref[co * 2 + 1]
    # the j column this grid step evaluates against (periodic); o9 in
    # 4..8 decodes to (dx, dy) with the standard (dx+1)*3+(dy+1) layout
    dxo = o9 // 3 - 1
    dyo = jnp.mod(o9, 3) - 1
    ncx = cfg["_ncx"]
    ncy = cfg["_ncy"]
    cx = c // ncy
    cy = jnp.mod(c, ncy)
    cj = jnp.mod(cx + dxo, ncx) * ncy + jnp.mod(cy + dyo, ncy)

    for bi in range(NB):                       # static unroll
        # window start in stride (128 // P slot) units; decode into the
        # phase replica + panel start of the kernel's j layout
        stk = w_ref[co * NB + bi]
        ph = jnp.mod(stk, P)
        stq = stk // P

        @pl.when(stk >= 0)
        def _block(bi=bi, ph=ph, stq=stq):
            iw = i_ref[0, bi]                  # (Ri, IBLK)
            jw = j_ref[0, ph, pl.ds(stq, Wq)]  # (Wq, Rj, 128)

            def ri(r):
                return iw[r][None, :, None]    # (1, IBLK, 1)

            def rj(r):
                return jw[:, r, :][:, None, :]  # (Wq, 1, 128)

            dx = ri(0) - (rj(0) + sx)
            dy = ri(1) - (rj(1) + sy)
            dz = ri(2) - rj(2)
            d2 = dx * dx + dy * dy + dz * dz

            idi = ri(6)
            idj = rj(6)
            mask = (idi < nfloat) & (idj < nfloat) & (idi != idj)
            for e in range(nexcl):
                mask = mask & (ri(7 + e) != idj)

            si = sj = ei = ej = qi = qj = None
            if cfg["lj"] or cfg["repulsion"] or cfg["repulsioncg"]:
                si, sj = ri(4), rj(4)
                ei, ej = ri(5), rj(5)
            if cfg["elec"]:
                qi, qj = ri(3), rj(3)

            e_lj, e_el, g = pair_terms(cfg, d2, mask, si, sj, ei, ej,
                                       qi, qj)

            wt = jnp.where(o == 0, jnp.float32(1.0), jnp.float32(2.0))
            elj_ref[0, 0] = elj_ref[0, 0] + e_lj * wt
            eel_ref[0, 0] = eel_ref[0, 0] + e_el * wt
            if virial:
                # raw sum g * d_a^2, weighted like the energies (the
                # caller applies the -0.5 symmetric factor)
                vir_ref[0, 0] = vir_ref[0, 0] + jnp.sum(g * dx * dx) * wt
                vir_ref[0, 1] = vir_ref[0, 1] + jnp.sum(g * dy * dy) * wt
                vir_ref[0, 2] = vir_ref[0, 2] + jnp.sum(g * dz * dz) * wt

            # i-side forces as (IBLK, 128) LANE PARTIALS: summing only
            # the leading Wq panel axis is Wq-1 plain vector adds; the
            # old axis=(0, 2) form also reduced the 128 lanes and relaid
            # the (IBLK,) result lane-major every block visit (measured
            # 4-6x its arithmetic cost on the dense kernel roofline,
            # docs/PERF.md). The caller does the final lane reduction
            # once per slot in XLA.
            f_ref[0, bi, 0] = f_ref[0, bi, 0] - jnp.sum(g * dx, axis=0)
            f_ref[0, bi, 1] = f_ref[0, bi, 1] - jnp.sum(g * dy, axis=0)
            f_ref[0, bi, 2] = f_ref[0, bi, 2] - jnp.sum(g * dz, axis=0)

            @pl.when(o != 0)
            def _jacc():
                # force ON the j slots: +sum_i g . dv (accumulated in the
                # replica the window used; XLA scatters each replica with
                # its own shifted slot map)
                sl = pl.ds(stq, Wq)
                jacc_ref[cj, ph, sl, 0] = jacc_ref[cj, ph, sl, 0] + \
                    jnp.sum(g * dx, axis=1)
                jacc_ref[cj, ph, sl, 1] = jacc_ref[cj, ph, sl, 1] + \
                    jnp.sum(g * dy, axis=1)
                jacc_ref[cj, ph, sl, 2] = jacc_ref[cj, ph, sl, 2] + \
                    jnp.sum(g * dz, axis=1)


def column_pair_call(cfg, ncx, ncy, i_data, j_data, wstart, shifts,
                     *, IBLK, W, NB, nexcl, nfloat, P=1,
                     interpret=False, with_virial=False):
    """Run the column pair kernel.

    i_data:  (ncol, NB, Ri, IBLK) rows 0..6 = x,y,z,q,sig,eps,id;
             7.. = excl ids (block axis leading: untiled dynamic index)
    j_data:  (ncol, P, CE/128, Rj, 128) panel-major extended columns
             (z ghost-shifted); replica p is shifted left p*(128//P)
             slots so window starts are stride-granular
    wstart:  (ncol*9*NB,) int32 window starts in stride units (-1 =
             skip block)
    shifts:  (ncol*9*2,) f32 static x/y periodic position shifts
    Returns (e_lj, e_el scalars, f (ncol, NB, 3, IBLK),
             jacc (ncol, P, CE/128, 3, 128) extended-slot-replica j
             forces).
    """
    ncol = ncx * ncy
    Ri = i_data.shape[2]
    CEq = j_data.shape[2]
    Rj = j_data.shape[3]
    Wq = W // 128
    f32 = jnp.float32
    cfg = dict(cfg)
    cfg["_ncx"] = ncx
    cfg["_ncy"] = ncy

    def j_index(c, o, *prefetch):
        o9 = o + 4
        dx = o9 // 3 - 1
        dy = jnp.mod(o9, 3) - 1
        cx = c // ncy
        cy = jnp.mod(c, ncy)
        nx = jnp.mod(cx + dx, ncx)
        ny = jnp.mod(cy + dy, ncy)
        return (nx * ncy + ny, 0, 0, 0, 0)

    kern = functools.partial(
        _kernel, cfg=cfg, IBLK=IBLK, Wq=Wq, NB=NB, nexcl=nexcl,
        nfloat=float(nfloat), ncol=ncol, P=P, virial=with_virial,
    )
    out_specs = [
        pl.BlockSpec((1, NB, 3, IBLK, 128),
                     lambda c, o, *p: (c, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # resident extended-slot j-force accumulator: one constant
        # block for the whole sequential grid (safe to revisit)
        pl.BlockSpec((ncol, P, CEq, 3, 128),
                     lambda c, o, *p: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda c, o, *p: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda c, o, *p: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ncol, NB, 3, IBLK, 128), f32),
        jax.ShapeDtypeStruct((ncol, P, CEq, 3, 128), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
    ]
    if with_virial:
        out_specs.append(pl.BlockSpec((1, 3), lambda c, o, *p: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 3), f32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # wstart + shifts, whole-array SMEM
        grid=(ncol, 5),
        in_specs=[
            pl.BlockSpec((1, NB, Ri, IBLK),
                         lambda c, o, *p: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, CEq, Rj, 128), j_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=60 * ncol * 5 * NB * IBLK * W,
            bytes_accessed=ncol * 5 * (Ri * NB * IBLK
                                       + P * Rj * CEq * 128) * 4,
            transcendentals=ncol * 5 * NB * IBLK * W,
        ),
        interpret=interpret,
    )(wstart.reshape(-1), shifts.astype(f32).reshape(-1),
      i_data, j_data)
    if with_virial:
        f_out, jacc, e_lj, e_el, vir = outs
        return e_lj[0, 0], e_el[0, 0], f_out.sum(axis=-1), jacc, vir[0]
    f_out, jacc, e_lj, e_el = outs
    # deferred lane reduction of the i-force partials (once per slot)
    return e_lj[0, 0], e_el[0, 0], f_out.sum(axis=-1), jacc

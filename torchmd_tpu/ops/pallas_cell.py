"""Pallas TPU kernel: cell-list nonbonded energy/forces via ghost columns.

The XLA ghost-cell path (neighbors.cell_nonbonded_energy_forces) is
HBM-bound: every stencil offset materializes ~15 (ncells*cap, cap) blocks
in HBM (~26 ms at 24k atoms on v5e). This kernel keeps the pair blocks in
VMEM:

  - per-eval data prep (XLA, cheap): slot-layout attributes are packed as
    ROWS of per-(x, y) cell-column tiles — interior (nx*ny, R, nz, cap)
    and ghost-extended (X*Y, R, Z, cap) with ghost positions pre-shifted
    by +-box (no minimum-image wrap needed in the pair math). Rows
    0..6 = x, y, z, q, sigma, epsilon, atom-id; rows 8.. hold per-atom
    exclusion lists when the topology has exclusions.
  - grid = (interior columns, 27 stencil offsets): each step loads one
    interior column tile plus one ghost column tile (both ~tens of KB),
    slices the dz window in-kernel, evaluates the (nz, cap, cap) pair
    block with the SAME per-pair term math as the dense Pallas kernel
    (pallas_nonbonded.pair_terms), and accumulates i-side forces in the
    revisited output block. No HBM intermediates at all.

Requires split == 1 (the default 27-stencil) and Lorentz-Berthelot LJ
(NBFIX A/B tables fall back to the XLA path).
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

from .pallas_nonbonded import make_kernel_cfg, pair_terms, pallas_available


def pallas_cell_supported(cfg, clcfg, ffp) -> bool:
    from .pallas_nonbonded import pallas_supported_terms

    return (
        _HAS_PALLAS
        and clcfg.split == 1
        and ffp.lj_ab is None
        and pallas_supported_terms(cfg)
        and min(clcfg.ncells) >= 3
    )


def _kernel(i_ref, j_ref, f_ref, elj_ref, eel_ref, *rest, cfg, nz, cap,
            nexcl, nfloat, virial=False):
    vir_ref = rest[0] if virial else None
    c = pl.program_id(0)
    o = pl.program_id(1)
    f32 = jnp.float32

    dz0 = jnp.mod(o, 3)  # z offset into the Z = nz + 2 ghost column

    iw = i_ref[0]                                  # (R, nz, cap)
    jw = j_ref[0, :, pl.ds(dz0, nz), :]            # (R, nz, cap)

    def row_i(r):
        return iw[r][:, :, None]                   # (nz, cap, 1)

    def row_j(r):
        return jw[r][:, None, :]                   # (nz, 1, cap)

    dx = row_i(0) - row_j(0)
    dy = row_i(1) - row_j(1)
    dz = row_i(2) - row_j(2)
    d2 = dx * dx + dy * dy + dz * dz

    idi = row_i(6)
    idj = row_j(6)
    mask = (idi < nfloat) & (idj < nfloat) & (idi != idj)
    for e in range(nexcl):
        mask = mask & (row_i(8 + e) != idj)

    si = sj = ei = ej = qi = qj = None
    if cfg["lj"] or cfg["repulsion"] or cfg["repulsioncg"]:
        si, sj = row_i(4), row_j(4)
        ei, ej = row_i(5), row_j(5)
    if cfg["elec"]:
        qi, qj = row_i(3), row_j(3)

    e_lj, e_el, g = pair_terms(cfg, d2, mask, si, sj, ei, ej, qi, qj)

    fx = -jnp.sum(g * dx, axis=2)                  # (nz, cap)
    fy = -jnp.sum(g * dy, axis=2)
    fz = -jnp.sum(g * dz, axis=2)

    @pl.when(o == 0)
    def _init_f():
        f_ref[...] = jnp.zeros(f_ref.shape, f_ref.dtype)

    f_ref[0, 0] = f_ref[0, 0] + fx
    f_ref[0, 1] = f_ref[0, 1] + fy
    f_ref[0, 2] = f_ref[0, 2] + fz

    first = jnp.logical_and(c == 0, o == 0)

    if virial:
        # raw per-axis sum g * d_a^2; the caller applies the -0.5
        # symmetric factor (each pair is visited from both cells)
        vx = jnp.sum(g * dx * dx)
        vy = jnp.sum(g * dy * dy)
        vz = jnp.sum(g * dz * dz)

    @pl.when(first)
    def _init_e():
        elj_ref[0, 0] = e_lj
        eel_ref[0, 0] = e_el
        if virial:
            vir_ref[0, 0] = vx
            vir_ref[0, 1] = vy
            vir_ref[0, 2] = vz

    @pl.when(jnp.logical_not(first))
    def _acc_e():
        elj_ref[0, 0] = elj_ref[0, 0] + e_lj
        eel_ref[0, 0] = eel_ref[0, 0] + e_el
        if virial:
            vir_ref[0, 0] = vir_ref[0, 0] + vx
            vir_ref[0, 1] = vir_ref[0, 1] + vy
            vir_ref[0, 2] = vir_ref[0, 2] + vz


def pallas_cell_energy_forces(ffp, cfg, clcfg, cl, excl_table, pos, box,
                              interpret=False, with_virial=False):
    """Drop-in Pallas replacement for
    neighbors.cell_nonbonded_energy_forces (f32, split=1, no NBFIX).

    `with_virial=True` additionally returns the per-axis pair virial
    (3,) — same convention as nonbonded_block_energy_forces."""
    n = pos.shape[0]
    cap = clcfg.capacity
    ncx, ncy, ncz = clcfg.ncells
    ncells = ncx * ncy * ncz
    slots = cl.slots
    f32 = jnp.float32
    kcfg = make_kernel_cfg(cfg, True)

    boxv = jnp.asarray(box, f32)
    pos = jnp.asarray(pos, f32)
    # anchor to the build frame: wrapped build reference + minimum-image
    # displacement since the build (a plain wrap teleports atoms that
    # crossed a periodic face between rebuilds; see
    # neighbors.anchored_positions)
    from ..neighbors import anchored_positions

    pos_w = anchored_positions(pos, jnp.asarray(cl.ref_pos, f32), boxv)

    # ---- slot-layout attribute rows (XLA prep, one gather each) ----
    pos_pad = jnp.concatenate([pos_w, jnp.zeros((1, 3), f32)])
    P = pos_pad[slots]                              # (ncells, cap, 3)
    q_pad = jnp.concatenate([ffp.charges.astype(f32), jnp.zeros(1, f32)])
    Q = q_pad[slots]
    # rows carry sigma/2 and sqrt(|eps|) (pair_terms' LB contract)
    s_at = 0.5 * ffp.lj_params[:, 0].astype(f32)[ffp.mapped_atom_types]
    e_at = jnp.sqrt(jnp.abs(
        ffp.lj_params[:, 1].astype(f32)[ffp.mapped_atom_types]
    ))
    SG = jnp.concatenate([s_at, jnp.zeros(1, f32)])[slots]
    EP = jnp.concatenate([e_at, jnp.zeros(1, f32)])[slots]
    IDS = slots.astype(f32)                         # id as float rows

    e_width = excl_table.shape[1] if excl_table is not None else 0
    rows = [P[..., 0], P[..., 1], P[..., 2], Q, SG, EP, IDS,
            jnp.zeros_like(Q)]
    if e_width:
        excl_pad = jnp.concatenate(
            [excl_table, jnp.full((1, e_width), n, excl_table.dtype)]
        ).astype(f32)
        EX = excl_pad[slots]                        # (ncells, cap, E)
        rows += [EX[..., e] for e in range(e_width)]
    R = len(rows)

    stack = jnp.stack(rows, axis=0).reshape(R, ncx, ncy, ncz, cap)

    def ghost(a):
        return jnp.pad(a, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                       mode="wrap")

    ext = ghost(stack)
    X, Y, Z = ncx + 2, ncy + 2, ncz + 2

    def shift_vec(nc, blen):
        return jnp.concatenate([
            jnp.full((1,), -blen, f32), jnp.zeros((nc,), f32),
            jnp.full((1,), blen, f32),
        ])

    ext = ext.at[0].add(shift_vec(ncx, boxv[0])[:, None, None, None])
    ext = ext.at[1].add(shift_vec(ncy, boxv[1])[None, :, None, None])
    ext = ext.at[2].add(shift_vec(ncz, boxv[2])[None, None, :, None])

    i_data = stack.transpose(1, 2, 0, 3, 4).reshape(ncx * ncy, R, ncz, cap)
    j_data = ext.transpose(1, 2, 0, 3, 4).reshape(X * Y, R, Z, cap)

    def i_index(c, o):
        return (c, 0, 0, 0)

    def j_index(c, o):
        # offset o -> (dx, dy) in {-1, 0, 1}; ghost column of cell c
        dx = o // 9 - 1
        dy = (o // 3) % 3 - 1
        x = c // ncy
        y = jnp.mod(c, ncy)
        return ((x + 1 + dx) * Y + (y + 1 + dy), 0, 0, 0)

    kern = functools.partial(
        _kernel, cfg=kcfg, nz=ncz, cap=cap, nexcl=e_width, nfloat=float(n),
        virial=with_virial,
    )
    out_specs = [
        pl.BlockSpec((1, 3, ncz, cap), lambda c, o: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda c, o: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda c, o: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ncx * ncy, 3, ncz, cap), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
    ]
    if with_virial:
        out_specs.append(pl.BlockSpec((1, 3), lambda c, o: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 3), f32))
    outs = pl.pallas_call(
        kern,
        grid=(ncx * ncy, 27),
        in_specs=[
            pl.BlockSpec((1, R, ncz, cap), i_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Z, cap), j_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(i_data, j_data)
    if with_virial:
        f_out, e_lj, e_el, vir_raw = outs
    else:
        f_out, e_lj, e_el = outs

    # slot forces -> atoms (padding rows land in the n-th bin)
    f_slots = f_out.transpose(0, 2, 3, 1).reshape(ncells * cap, 3)
    forces = jnp.zeros((n + 1, 3), f32).at[
        slots.reshape(-1)
    ].add(f_slots)[:n]

    out = {}
    if kcfg["lj"]:
        out["lj"] = e_lj[0, 0]
    if kcfg["repulsion"]:
        out["repulsion"] = e_lj[0, 0]
    if kcfg["repulsioncg"]:
        out["repulsioncg"] = e_lj[0, 0]
    if kcfg["elec"]:
        out["electrostatics"] = e_el[0, 0]
    if with_virial:
        return out, forces, -0.5 * vir_raw[0]
    return out, forces

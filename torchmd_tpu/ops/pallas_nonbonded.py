"""Pallas TPU kernel: fused all-pairs LJ + electrostatics energy/forces.

The dense jnp path materializes O(N^2) intermediates in HBM (distance,
coefficient and mask matrices), so each MD step pays ~10 N^2 * 4 bytes of
HBM traffic. This kernel tiles the pair matrix into (TILE_I, TILE_J) VMEM
blocks: per grid step it reads two thin per-atom slices plus one int8 mask
tile, computes displacement/LJ/Coulomb(RFA)/switching in registers/VMEM,
and accumulates row forces and scalar energies in-place across the j grid
dimension (TPU grids execute sequentially, so revisiting the same output
block is safe). HBM traffic drops to the bit-mask (N^2 * 1 byte) plus
O(N) vectors.

Covers the nonbonded term set of the reference (forces.py:381-491): lj
(with cubic switching), electrostatics (plain or reaction-field),
repulsion (A/r^12) and repulsioncg (B/r^6), with exclusions and the cutoff
applied as masks. Newton's third law is exploited statistically by
evaluating the full (symmetric) matrix: energies carry a 0.5 factor and
row sums give complete per-atom forces with no scatter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

import os as _os

TILE_I = int(_os.environ.get("TMD_PALLAS_TILE_I", 512))
TILE_J = int(_os.environ.get("TMD_PALLAS_TILE_J", 512))


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _erfc_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erfc approximation
    (|error| < 1.5e-7 -- f32-accurate); Mosaic has no erf primitive."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def pair_terms(cfg, d2, mask, si, sj, ei, ej, qi, qj, A=None, B=None):
    """Shape-agnostic per-pair term math shared by the dense and cell-list
    Pallas kernels: given squared distances and a validity mask (any
    broadcast-compatible block shapes), returns (e_lj, e_el scalars with
    the 0.5 symmetric factor, g = (dE/dr)/r block).

    LJ coefficients come from Lorentz-Berthelot mixing of per-atom
    HALF-sigma and SQRT-epsilon rows (si/sj = sigma/2, ei/ej =
    sqrt(|eps|) -- precomputed once per topology so the hot loop saves
    a per-pair sqrt and abs) unless explicit per-pair A/B blocks are
    given (the NBFIX path: tables gathered via one-hot matmul)."""
    f32 = jnp.float32
    d2 = jnp.where(mask, d2, 1.0)
    rinv = jax.lax.rsqrt(d2)

    if cfg["cutoff"] is not None:
        mask = jnp.logical_and(mask, d2 <= cfg["cutoff"] * cfg["cutoff"])
    fmask = mask.astype(f32)

    e_lj = jnp.zeros((), f32)
    e_el = jnp.zeros((), f32)
    g = jnp.zeros_like(d2)  # (dE/dr)/r accumulated

    # r itself is only needed by the switching taper / Ewald erfc
    need_dist = (
        (cfg["switch"] is not None and cfg["cutoff"] is not None
         and cfg["lj"])
        or (cfg["elec"] and cfg["ewald_alpha"] is not None)
    )
    dist = d2 * rinv if need_dist else None

    if cfg["lj"] or cfg["repulsion"] or cfg["repulsioncg"]:
        if A is None:
            sig = si + sj                  # rows carry sigma/2
            eps = ei * ej                  # rows carry sqrt(|eps|)
            s2 = sig * sig
            s6 = s2 * s2 * s2
            B = 4.0 * eps * s6
            A = B * s6
        rinv2 = rinv * rinv
        rinv6 = rinv2 * rinv2 * rinv2
        rinv12 = rinv6 * rinv6
    if cfg["lj"]:
        pot = A * rinv12 - B * rinv6
        dEdr = (-12.0 * A * rinv12 + 6.0 * B * rinv6) * rinv
        if cfg["switch"] is not None and cfg["cutoff"] is not None:
            sd, co = cfg["switch"], cfg["cutoff"]
            t = (dist - sd) / (co - sd)
            sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
            dsw = t * t * (-30.0 + t * (60.0 - t * 30.0)) / (co - sd)
            in_sw = dist > sd
            dEdr = jnp.where(in_sw, dEdr * sw + pot * dsw, dEdr)
            pot = jnp.where(in_sw, pot * sw, pot)
        e_lj = e_lj + 0.5 * jnp.sum(pot * fmask)
        g = g + dEdr * rinv * fmask
    if cfg["repulsion"]:
        e_lj = e_lj + 0.5 * jnp.sum(A * rinv12 * fmask)
        g = g + (-12.0 * A * rinv12 * rinv * rinv) * fmask
    if cfg["repulsioncg"]:
        e_lj = e_lj + 0.5 * jnp.sum(B * rinv6 * fmask)
        g = g + (-6.0 * B * rinv6 * rinv * rinv) * fmask
    if cfg["elec"]:
        qq = cfg["elec_factor"] * qi * qj
        if cfg["ewald_alpha"] is not None:
            a = cfg["ewald_alpha"]
            x = a * dist
            erfc_t = _erfc_approx(x)
            pot = qq * erfc_t * rinv
            dEdr_r = -qq * rinv * rinv * (
                erfc_t * rinv
                + (2.0 * a / 1.7724538509055159) * jnp.exp(-x * x)
            )
        elif cfg["rfa"] and cfg["cutoff"] is not None:
            pot = qq * (rinv + cfg["krf"] * d2 - cfg["crf"])
            dEdr_r = qq * (2.0 * cfg["krf"] - rinv * rinv * rinv)
        else:
            pot = qq * rinv
            dEdr_r = -qq * rinv * rinv * rinv
        e_el = e_el + 0.5 * jnp.sum(pot * fmask)
        g = g + dEdr_r * fmask
    return e_lj, e_el, g


def make_kernel_cfg(cfg, pbc):
    """Static kernel-config dict from a ForceTermConfig (shared by the
    dense and cell-list Pallas kernels)."""
    from ..units import ELEC_FACTOR

    kcfg = {
        "cutoff": None if cfg.cutoff is None else float(cfg.cutoff),
        "switch": None if cfg.switch_dist is None else float(cfg.switch_dist),
        "rfa": bool(cfg.rfa),
        "lj": "lj" in cfg.terms,
        "elec": "electrostatics" in cfg.terms,
        "repulsion": "repulsion" in cfg.terms,
        "repulsioncg": "repulsioncg" in cfg.terms,
        "elec_factor": float(ELEC_FACTOR),
        "ewald_alpha": (
            None if cfg.ewald_alpha is None else float(cfg.ewald_alpha)
        ),
        "pbc": bool(pbc),
        "krf": 0.0,
        "crf": 0.0,
        "nbfix": False,
    }
    if kcfg["rfa"] and kcfg["cutoff"]:
        denom = 2.0 * cfg.solvent_dielectric + 1.0
        kcfg["krf"] = (1.0 / kcfg["cutoff"] ** 3) * (
            cfg.solvent_dielectric - 1.0
        ) / denom
        kcfg["crf"] = (1.0 / kcfg["cutoff"]) * (
            3.0 * cfg.solvent_dielectric
        ) / denom
    return kcfg


def _kernel(*refs, cfg):
    if cfg["nbfix"]:
        (xi_ref, yi_ref, zi_ref, qi_ref, si_ref, ei_ref,
         xj_ref, yj_ref, zj_ref, qj_ref, sj_ref, ej_ref,
         ar_ref, br_ref, oj_ref,
         mask_ref, box_ref,
         fx_ref, fy_ref, fz_ref, elj_ref, eel_ref) = refs
    else:
        (xi_ref, yi_ref, zi_ref, qi_ref, si_ref, ei_ref,
         xj_ref, yj_ref, zj_ref, qj_ref, sj_ref, ej_ref,
         mask_ref, box_ref,
         fx_ref, fy_ref, fz_ref, elj_ref, eel_ref) = refs
    j = pl.program_id(1)
    i = pl.program_id(0)

    xi = xi_ref[0, :][:, None]
    yi = yi_ref[0, :][:, None]
    zi = zi_ref[0, :][:, None]
    xj = xj_ref[0, :][None, :]
    yj = yj_ref[0, :][None, :]
    zj = zj_ref[0, :][None, :]

    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    if cfg["pbc"]:
        bx = box_ref[0, 0]
        by = box_ref[0, 1]
        bz = box_ref[0, 2]
        dx = dx - bx * jnp.round(dx / bx)
        dy = dy - by * jnp.round(dy / by)
        dz = dz - bz * jnp.round(dz / bz)

    mask = mask_ref[...] != 0
    d2 = dx * dx + dy * dy + dz * dz

    si = sj = ei = ej = qi = qj = A_t = B_t = None
    if cfg["nbfix"]:
        # per-pair A/B via one-hot matmul: ar rows are A[type_i] (exact
        # row gathers done once in XLA); oj columns select type_j on the
        # MXU. One-hot selection in f32 is exact.
        A_t = jnp.dot(ar_ref[...], oj_ref[...],
                      preferred_element_type=jnp.float32)
        B_t = jnp.dot(br_ref[...], oj_ref[...],
                      preferred_element_type=jnp.float32)
    elif cfg["lj"] or cfg["repulsion"] or cfg["repulsioncg"]:
        si = si_ref[0, :][:, None]
        sj = sj_ref[0, :][None, :]
        ei = ei_ref[0, :][:, None]
        ej = ej_ref[0, :][None, :]
    if cfg["elec"]:
        qi = qi_ref[0, :][:, None]
        qj = qj_ref[0, :][None, :]

    e_lj, e_el, g = pair_terms(cfg, d2, mask, si, sj, ei, ej, qi, qj,
                               A=A_t, B=B_t)

    fx = -jnp.sum(g * dx, axis=1)
    fy = -jnp.sum(g * dy, axis=1)
    fz = -jnp.sum(g * dz, axis=1)

    @pl.when(j == 0)
    def _init_rows():
        fx_ref[0, :] = fx
        fy_ref[0, :] = fy
        fz_ref[0, :] = fz

    @pl.when(j != 0)
    def _acc_rows():
        fx_ref[0, :] = fx_ref[0, :] + fx
        fy_ref[0, :] = fy_ref[0, :] + fy
        fz_ref[0, :] = fz_ref[0, :] + fz

    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _init_e():
        elj_ref[0, 0] = e_lj
        eel_ref[0, 0] = e_el

    @pl.when(jnp.logical_not(first))
    def _acc_e():
        elj_ref[0, 0] = elj_ref[0, 0] + e_lj
        eel_ref[0, 0] = eel_ref[0, 0] + e_el


def _kernel_tri(*refs, cfg, tile):
    """Triangular variant: Newton's third law halves the pair work.

    Only tiles with j >= i compute. Diagonal tiles keep the symmetric
    0.5-energy/row-sum treatment (both triangles are present in-tile);
    off-diagonal tiles count each pair once (weight 2 on the 0.5 factor),
    send row sums to the i force block and column sums (+g.dv = the force
    on j) to a full-length accumulator block that is one constant output
    block for the whole sequential grid (safe to revisit).

    Row forces accumulate as (tile, 128) LANE-GROUP PARTIALS, not fully
    reduced (1, tile) rows: a full lane-axis sum materializes a
    sublane-major (tile,) vector into a lane-major row every tile visit
    (log-step shuffles + a relayout), which the round-4 roofline measured
    at 4-6x its arithmetic cost (docs/PERF.md). Summing vreg-aligned
    128-lane column groups instead costs tile/128 - 1 plain vector adds
    per element row; the final 128-lane reduction happens once per atom
    in XLA after the call. Column (j-side) sums stay full in-kernel
    reductions — sublane-axis sums are cheap on the VPU."""
    if cfg["nbfix"]:
        (xi_ref, yi_ref, zi_ref, qi_ref, si_ref, ei_ref,
         xj_ref, yj_ref, zj_ref, qj_ref, sj_ref, ej_ref,
         ar_ref, br_ref, oj_ref,
         mask_ref, box_ref,
         fx_ref, fy_ref, fz_ref, fcx_ref, fcy_ref, fcz_ref,
         elj_ref, eel_ref) = refs
    else:
        (xi_ref, yi_ref, zi_ref, qi_ref, si_ref, ei_ref,
         xj_ref, yj_ref, zj_ref, qj_ref, sj_ref, ej_ref,
         mask_ref, box_ref,
         fx_ref, fy_ref, fz_ref, fcx_ref, fcy_ref, fcz_ref,
         elj_ref, eel_ref) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        fcx_ref[...] = jnp.zeros_like(fcx_ref)
        fcy_ref[...] = jnp.zeros_like(fcy_ref)
        fcz_ref[...] = jnp.zeros_like(fcz_ref)
        elj_ref[0, 0] = jnp.float32(0.0)
        eel_ref[0, 0] = jnp.float32(0.0)

    @pl.when(j >= i)
    def _compute():
        xi = xi_ref[0, :][:, None]
        yi = yi_ref[0, :][:, None]
        zi = zi_ref[0, :][:, None]
        xj = xj_ref[0, :][None, :]
        yj = yj_ref[0, :][None, :]
        zj = zj_ref[0, :][None, :]
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        if cfg["pbc"]:
            bx = box_ref[0, 0]
            by = box_ref[0, 1]
            bz = box_ref[0, 2]
            dx = dx - bx * jnp.round(dx / bx)
            dy = dy - by * jnp.round(dy / by)
            dz = dz - bz * jnp.round(dz / bz)
        mask = mask_ref[...] != 0
        d2 = dx * dx + dy * dy + dz * dz

        si = sj = ei = ej = qi = qj = A_t = B_t = None
        if cfg["nbfix"]:
            A_t = jnp.dot(ar_ref[...], oj_ref[...],
                          preferred_element_type=jnp.float32)
            B_t = jnp.dot(br_ref[...], oj_ref[...],
                          preferred_element_type=jnp.float32)
        elif cfg["lj"] or cfg["repulsion"] or cfg["repulsioncg"]:
            si = si_ref[0, :][:, None]
            sj = sj_ref[0, :][None, :]
            ei = ei_ref[0, :][:, None]
            ej = ej_ref[0, :][None, :]
        if cfg["elec"]:
            qi = qi_ref[0, :][:, None]
            qj = qj_ref[0, :][None, :]

        e_lj, e_el, g = pair_terms(cfg, d2, mask, si, sj, ei, ej, qi, qj,
                                   A=A_t, B=B_t)
        diag = i == j
        wt = jnp.where(diag, jnp.float32(1.0), jnp.float32(2.0))
        elj_ref[0, 0] = elj_ref[0, 0] + e_lj * wt
        eel_ref[0, 0] = eel_ref[0, 0] + e_el * wt

        px = g * dx
        py = g * dy
        pz = g * dz

        def _lgsum(p):
            # vreg-aligned 128-lane column-group partial sums (no
            # cross-lane shuffles, no relayout)
            acc = p[:, 0:128]
            for k in range(1, tile // 128):
                acc = acc + p[:, k * 128:(k + 1) * 128]
            return acc

        fxp = _lgsum(px)
        fyp = _lgsum(py)
        fzp = _lgsum(pz)

        @pl.when(diag)
        def _init_rows():
            fx_ref[...] = fxp
            fy_ref[...] = fyp
            fz_ref[...] = fzp

        @pl.when(jnp.logical_not(diag))
        def _acc():
            fx_ref[...] = fx_ref[...] + fxp
            fy_ref[...] = fy_ref[...] + fyp
            fz_ref[...] = fz_ref[...] + fzp
            # force ON the j atoms: +sum_i g . dv
            sl = pl.ds(j * tile, tile)
            fcx_ref[0, sl] = fcx_ref[0, sl] + jnp.sum(px, axis=0)
            fcy_ref[0, sl] = fcy_ref[0, sl] + jnp.sum(py, axis=0)
            fcz_ref[0, sl] = fcz_ref[0, sl] + jnp.sum(pz, axis=0)


class PallasNBData(NamedTuple):
    """Padded per-atom arrays + mask prepared once per topology."""

    x_pad: int
    q: jnp.ndarray       # (1, Np)
    sig: jnp.ndarray     # (1, Np)
    eps: jnp.ndarray     # (1, Np)
    mask: jnp.ndarray    # (Np, Np) int8
    natoms: int
    # NBFIX (pair-specific A/B tables): per-atom table ROWS (exact XLA
    # row gathers, step-invariant) + a one-hot type matrix so the kernel
    # selects type_j columns on the MXU. None for Lorentz-Berthelot.
    arow: jnp.ndarray = None    # (Np, Tp) A[type_i] rows
    brow: jnp.ndarray = None    # (Np, Tp)
    onehot: jnp.ndarray = None  # (Tp, Np) one-hot of type_j


def prepare_nb_data(ffp) -> PallasNBData:
    n = int(ffp.charges.shape[0])
    npad = _round_up(n, max(TILE_I, TILE_J))
    f32 = jnp.float32

    def pad1(v):
        v = jnp.asarray(v, f32)
        return jnp.pad(v, (0, npad - n))[None, :]

    arow = brow = onehot = None
    if ffp.lj_ab is not None:
        types = ffp.mapped_atom_types
        ntypes = int(ffp.lj_ab[0].shape[0])
        tpad = _round_up(max(ntypes, 128), 128)
        A = jnp.zeros((ntypes, tpad), f32).at[:, :ntypes].set(
            jnp.asarray(ffp.lj_ab[0], f32)
        )
        B = jnp.zeros((ntypes, tpad), f32).at[:, :ntypes].set(
            jnp.asarray(ffp.lj_ab[1], f32)
        )
        arow = jnp.zeros((npad, tpad), f32).at[:n].set(A[types])
        brow = jnp.zeros((npad, tpad), f32).at[:n].set(B[types])
        onehot = jnp.zeros((tpad, npad), f32).at[
            types, jnp.arange(n)
        ].set(1.0)
        sig = jnp.zeros(n)
        eps = jnp.zeros(n)
    elif ffp.lj_params is not None:
        # kernel rows carry sigma/2 and sqrt(|eps|): Lorentz-Berthelot
        # mixing in the hot loop becomes one add + one multiply
        sig = 0.5 * ffp.lj_params[:, 0][ffp.mapped_atom_types]
        eps = jnp.sqrt(jnp.abs(ffp.lj_params[:, 1][ffp.mapped_atom_types]))
    else:
        sig = jnp.zeros(n)
        eps = jnp.zeros(n)
    mask = jnp.asarray(ffp.nb_mask, jnp.int8)
    mask = jnp.pad(mask, ((0, npad - n), (0, npad - n)))
    return PallasNBData(
        x_pad=npad, q=pad1(ffp.charges), sig=pad1(sig), eps=pad1(eps),
        mask=mask, natoms=n, arow=arow, brow=brow, onehot=onehot,
    )


def pallas_supported_terms(cfg) -> bool:
    """The kernel accumulates LJ-family terms into one scalar, so exactly
    one of lj/repulsion/repulsioncg may be active at a time."""
    njfam = sum(t in cfg.terms for t in ("lj", "repulsion", "repulsioncg"))
    return njfam <= 1


def pallas_nonbonded_energy_forces(data: PallasNBData, cfg, pos, box,
                                   interpret=False):
    """pos: (natoms, 3) f32; box: (3,) f32 or None (no PBC: the minimum-
    image wrap is compiled out). Returns dict of term energies and forces
    (natoms, 3) f32."""
    npad, n = data.x_pad, data.natoms
    kcfg = make_kernel_cfg(cfg, box is not None)
    nbfix = data.arow is not None
    kcfg["nbfix"] = nbfix
    tpad = int(data.arow.shape[1]) if nbfix else 0

    pos = jnp.asarray(pos, jnp.float32)
    if box is None:
        box_in = jnp.ones((1, 3), jnp.float32)  # unused (pbc=False)
    else:
        box = jnp.asarray(box, jnp.float32)
        # per-axis disable for zero components via a huge safe box
        safe_box = jnp.where(box > 0, box, jnp.asarray(1e30, jnp.float32))
        box_in = safe_box[None, :]

    xp = jnp.pad(pos[:, 0], (0, npad - n))[None, :]
    yp = jnp.pad(pos[:, 1], (0, npad - n))[None, :]
    zp = jnp.pad(pos[:, 2], (0, npad - n))[None, :]

    ni = npad // TILE_I
    nj = npad // TILE_J

    def ispec(tile):
        return pl.BlockSpec((1, tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def jspec(tile):
        return pl.BlockSpec((1, tile), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    # NBFIX operands slot in between the j views and the mask tile
    ab_specs = []
    ab_args = ()
    if nbfix:
        ab_specs = [
            pl.BlockSpec((TILE_I, tpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, tpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpad, TILE_J), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        ab_args = (data.arow, data.brow, data.onehot)

    triangular = (
        TILE_I == TILE_J
        and TILE_I % 128 == 0
        and _os.environ.get("TMD_PALLAS_TRI", "1") != "0"
    )
    if triangular:
        grid_spec = pl.GridSpec(
            grid=(ni, nj),
            in_specs=[
                ispec(TILE_I), ispec(TILE_I), ispec(TILE_I),
                ispec(TILE_I), ispec(TILE_I), ispec(TILE_I),
                jspec(TILE_J), jspec(TILE_J), jspec(TILE_J),
                jspec(TILE_J), jspec(TILE_J), jspec(TILE_J),
                *ab_specs,
                pl.BlockSpec((TILE_I, TILE_J), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                # row-force lane-group partials: (TILE_I, 128) per i,
                # revisited across the j sweep (see _kernel_tri)
                pl.BlockSpec((TILE_I, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_I, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_I, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                # column-force accumulators: ONE constant full-length block
                pl.BlockSpec((1, npad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
        )
        flops_per_pair = 60
        fx, fy, fz, fcx, fcy, fcz, e_lj, e_el = pl.pallas_call(
            functools.partial(_kernel_tri, cfg=kcfg, tile=TILE_J),
            out_shape=[
                jax.ShapeDtypeStruct((npad, 128), jnp.float32),
                jax.ShapeDtypeStruct((npad, 128), jnp.float32),
                jax.ShapeDtypeStruct((npad, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, npad), jnp.float32),
                jax.ShapeDtypeStruct((1, npad), jnp.float32),
                jax.ShapeDtypeStruct((1, npad), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops_per_pair * npad * npad * 11 // 20,
                bytes_accessed=npad * npad + 12 * npad * 4,
                transcendentals=npad * npad * 11 // 20,
            ),
            interpret=interpret,
        )(
            xp, yp, zp, data.q, data.sig, data.eps,
            xp, yp, zp, data.q, data.sig, data.eps,
            *ab_args,
            data.mask, box_in,
        )
        # the deferred 128-lane reduction of the row partials (once per
        # atom, in XLA) — the kernel accumulates +sum_j g*dv, the row
        # force is its negative
        forces = jnp.stack(
            [
                fcx[0, :n] - jnp.sum(fx[:n], axis=1),
                fcy[0, :n] - jnp.sum(fy[:n], axis=1),
                fcz[0, :n] - jnp.sum(fz[:n], axis=1),
            ],
            axis=1,
        )
        out = {}
        if kcfg["lj"]:
            out["lj"] = e_lj[0, 0]
        if kcfg["repulsion"]:
            out["repulsion"] = e_lj[0, 0]
        if kcfg["repulsioncg"]:
            out["repulsioncg"] = e_lj[0, 0]
        if kcfg["elec"]:
            out["electrostatics"] = e_el[0, 0]
        return out, forces

    grid_spec = pl.GridSpec(
        grid=(ni, nj),
        in_specs=[
            ispec(TILE_I), ispec(TILE_I), ispec(TILE_I),
            ispec(TILE_I), ispec(TILE_I), ispec(TILE_I),
            jspec(TILE_J), jspec(TILE_J), jspec(TILE_J),
            jspec(TILE_J), jspec(TILE_J), jspec(TILE_J),
            *ab_specs,
            pl.BlockSpec((TILE_I, TILE_J), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_I), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_I), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_I), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )

    flops_per_pair = 60
    fx, fy, fz, e_lj, e_el = pl.pallas_call(
        functools.partial(_kernel, cfg=kcfg),
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * npad * npad,
            bytes_accessed=npad * npad + 12 * npad * 4,
            transcendentals=npad * npad,
        ),
        interpret=interpret,
    )(
        xp, yp, zp, data.q, data.sig, data.eps,
        xp, yp, zp, data.q, data.sig, data.eps,
        *ab_args,
        data.mask, box_in,
    )

    forces = jnp.stack([fx[0, :n], fy[0, :n], fz[0, :n]], axis=1)
    out = {}
    if kcfg["lj"]:
        out["lj"] = e_lj[0, 0]
    if kcfg["repulsion"]:
        out["repulsion"] = e_lj[0, 0]
    if kcfg["repulsioncg"]:
        out["repulsioncg"] = e_lj[0, 0]
    if kcfg["elec"]:
        out["electrostatics"] = e_el[0, 0]
    return out, forces

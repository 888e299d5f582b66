"""Pallas TPU kernels: fused bonded energies + forces.

Motivation (measured on v5e, thrombin 4,676 atoms / 113,910 contribution
rows): XLA's indexed ops dominate the bonded stage — the coordinate gather
costs ~0.5 ms, the contribution permute ~0.4 ms, and the segment-sum
scatter ~1.2 ms, while the actual physics is tens of microseconds. Each is
row-serialized on TPU. This module replaces all of them with one fused
kernel per term family (bond / angle / torsion / 1-4 / Urey-Bradley):

  - positions live VMEM-resident, folded to (nblk, 8, 128) blocks of 128
    atoms x 8 rows (rows 0..2 = x,y,z) so blocks are addressed by a
    dynamic leading index — no lane-dimension dynamic slicing;
  - terms are tiled (TILE per grid step) and sorted by atom index at plan
    build, so each tile's atoms span a few 128-atom blocks; the per-tile
    window [start, start+klen) is precomputed host-side and the kernel
    loops over just those blocks (jax.lax.fori_loop with a dynamic bound);
  - gathers and scatters are one-hot matmuls on the MXU against each
    128-atom block: gather P_a (8,T) += pos_blk (8,128) . onehot^T, and
    scatter F_blk (8,128) += C_a (8,T) . onehot — no XLA gather/scatter
    ops anywhere;
  - the physics (identical formulas to torchmd_tpu.bonded, which mirrors
    the reference analytic forces, torchmd/forces.py:494-605) runs on
    (1, TILE) component rows inside the kernel;
  - multi-term dihedral indirection is pre-expanded per assignment at plan
    build, so no segment-sum is needed.

Outputs: per-family force accumulators in the same folded layout (summed
and unfolded once per step) and per-family energies in SMEM scalars.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from ..units import ELEC_FACTOR

TILE = int(_os.environ.get("TMD_PALLAS_BONDED_TILE", 256))


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class _Family(NamedTuple):
    kind: str            # bond | ub | angle | torsion | nb14
    name: str            # energy dict key (e.g. "dihedrals")
    ntiles: int
    arity: int
    idx: jnp.ndarray     # (ntiles, arity, TILE) int32, -1 padded
    par: jnp.ndarray     # (ntiles, nparams, TILE) f32
    starts: jnp.ndarray  # (ntiles,) int32 window start (128-atom blocks)
    klens: jnp.ndarray   # (ntiles,) int32 window length (blocks)
    kmax: int            # max window length: static width for the
                         # flattened-window kernel (clamped to nblk)
    meta: tuple          # static options as sorted (key, value) pairs


class PallasBondedPlan(NamedTuple):
    natoms: int
    nblk: int
    families: tuple


def _per_assignment(table):
    """Per-assignment (idx, params): multi-term maps are expanded so each
    assignment owns its geometry row (no segment-sum indirection)."""
    params = np.asarray(table.params, np.float64)[np.asarray(table.map_param)]
    idx = np.asarray(table.idx)[np.asarray(table.map_term)]
    return idx, params


def build_pallas_bonded_plan(ffp, cfg, tile: int = TILE):
    """Tiled, window-annotated per-family plan (host-side, once per
    topology). Returns None when no bonded terms are active."""
    natoms = int(ffp.charges.shape[0])
    nblk = max(1, _round_up(natoms, 128) // 128)
    fams = []

    def add(kind, name, idx_np, par_np, meta):
        c = idx_np.shape[0]
        if c == 0:
            return
        arity = idx_np.shape[1]
        nparams = par_np.shape[1]
        # locality sort: tiles then span few 128-atom blocks
        order = np.argsort(idx_np.min(axis=1), kind="stable")
        idx_np = idx_np[order]
        par_np = par_np[order]
        nt = -(-c // tile)
        idxp = np.full((nt * tile, arity), -1, np.int32)
        idxp[:c] = idx_np
        parp = np.zeros((nt * tile, nparams), np.float32)
        parp[:c] = par_np
        rows = idxp.reshape(nt, tile, arity)
        lo = np.where(rows < 0, np.iinfo(np.int32).max, rows).min(axis=(1, 2))
        hi = np.where(rows < 0, -1, rows).max(axis=(1, 2))
        empty = hi < 0
        starts = np.where(empty, 0, np.minimum(lo, hi) // 128).astype(np.int32)
        klens = np.where(empty, 0, hi // 128 - starts + 1).astype(np.int32)
        # static window width for the flattened-window kernel: with the
        # locality sort a tile spans 1-3 blocks, so one compare + two
        # dot_generals replace the per-(block, arity) one-hot loop.
        # Clamp starts so [start, start+kmax) stays inside the fold.
        kmax = min(max(1, int(klens.max(initial=0))), nblk)
        starts = np.minimum(starts, max(0, nblk - kmax)).astype(np.int32)
        # the clamp can move a start down; re-derive klens so the loop
        # kernel's [start, start+klen) still reaches the tile's last block
        klens = np.where(empty, 0, hi // 128 - starts + 1).astype(np.int32)
        fams.append(_Family(
            kind=kind, name=name, ntiles=nt, arity=arity,
            idx=jnp.asarray(rows.transpose(0, 2, 1)),
            par=jnp.asarray(
                parp.reshape(nt, tile, nparams).transpose(0, 2, 1)
            ),
            starts=jnp.asarray(starts), klens=jnp.asarray(klens),
            kmax=kmax,
            meta=tuple(sorted(meta.items())),
        ))

    if "bonds" in cfg.terms and ffp.bonds is not None:
        idx, par = _per_assignment(ffp.bonds)
        add("bond", "bonds", idx, par[:, :2], dict(cutoff=cfg.cutoff))
    if "urey-bradley" in cfg.terms and ffp.urey_bradley is not None:
        idx, par = _per_assignment(ffp.urey_bradley)
        add("bond", "urey-bradley", idx, par[:, :2], dict(cutoff=None))
    if "angles" in cfg.terms and ffp.angles is not None:
        idx, par = _per_assignment(ffp.angles)
        add("angle", "angles", idx, par[:, :2], {})
    for term, field, amber in (
        ("dihedrals", "dihedrals", cfg.dihedrals_amber),
        ("impropers", "impropers", cfg.impropers_amber),
    ):
        tbl = getattr(ffp, field)
        if term in cfg.terms and tbl is not None:
            idx, par = _per_assignment(tbl)
            add("torsion", term, idx, par[:, :3], dict(amber=bool(amber)))
    if "1-4" in cfg.terms and ffp.nb14 is not None:
        idx, par = _per_assignment(ffp.nb14)
        q = np.asarray(ffp.charges, np.float64)
        nbpar = np.stack([
            par[:, 0] / par[:, 2],                                   # A/scnb
            par[:, 1] / par[:, 2],                                   # B/scnb
            ELEC_FACTOR * q[idx[:, 0]] * q[idx[:, 1]] / par[:, 3],   # qq/scee
        ], axis=1)
        add("nb14", "1-4", idx, nbpar, dict(
            want_lj="lj" in cfg.terms,
            want_elec="electrostatics" in cfg.terms,
        ))

    if not fams:
        return None
    return PallasBondedPlan(natoms=natoms, nblk=nblk, families=tuple(fams))


# ----------------------------------------------------------------------
# kernel


def _dot_lanes(a, b):
    """(8/1, L) . (T, L) contracting the lane dim -> (8/1, T) on the MXU."""
    # HIGHEST: the MXU's default bf16 passes would round the gathered
    # coordinates; with an exact 0/1 operand the 3-pass split is exact f32.
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _split3(x):
    """Dekker-style 3-term bf16 split: hi + mid + lo == x to < 1 f32 ulp
    (each residual subtraction is exact by Sterbenz; 3 x 8 mantissa bits
    cover f32's 24)."""
    bf, f32 = jnp.bfloat16, jnp.float32
    hi = x.astype(bf)
    r1 = x - hi.astype(f32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(f32)).astype(bf)
    return hi, mid, lo


def _dot_split3(a, b_bf16, dims):
    """f32 a (.) EXACT-bf16 b on the MXU in 3 single-pass bf16 matmuls.

    HIGHEST-precision f32 dots cost 6 MXU passes; when one operand is
    exactly bf16-representable (a 0/1 one-hot), splitting only the f32
    side gives the same f32 accuracy in 3 passes: each product term
    hi/mid/lo x {0,1} is exact, and the f32 accumulator adds them."""
    out = None
    for part in _split3(a):
        d = jax.lax.dot_general(
            part, b_bf16, dims, preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _atan_nonneg(x):
    """atan(x) for x >= 0, Cephes atanf rational reduction (f32-accurate,
    ~1 ulp); Mosaic has no atan/atan2 primitive."""
    big = x > 2.414213562373095        # tan(3*pi/8)
    mid = x > 0.4142135623730950       # tan(pi/8)
    x1 = jnp.where(
        big, -1.0 / jnp.maximum(x, 1e-30),
        jnp.where(mid, (x - 1.0) / (x + 1.0), x),
    )
    z = x1 * x1
    p = ((
        (8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1
    ) * z - 3.33329491539e-1) * z * x1 + x1
    return jnp.where(
        big, 1.5707963267948966 + p,
        jnp.where(mid, 0.7853981633974483 + p, p),
    )


def _atan2(y, x):
    """Branchless f32 atan2 matching jnp.arctan2 conventions."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    a = _atan_nonneg(ay / jnp.maximum(ax, 1e-30))
    a = jnp.where(x < 0, jnp.pi - a, a)
    a = jnp.where(
        x == 0, jnp.where(y != 0, 0.5 * jnp.pi, 0.0), a
    )
    return jnp.where(y < 0, -a, a)


def _physics(kind, meta, P, par, valid, box3):
    """Per-tile physics on (1, T) component rows.

    P: list per slot of (8, T) gathered coordinate blocks (rows 0..2 used).
    Returns (e_main, e_aux, contribs) where contribs[slot] = (fx, fy, fz),
    already masked by `valid` so padded columns scatter zeros.
    """
    m = dict(meta)
    f32 = jnp.float32
    vf = valid.astype(f32)

    def comps(a):
        return P[a][0:1, :], P[a][1:2, :], P[a][2:3, :]

    def wrap(d, b):
        if box3 is None:
            return d
        return d - b * jnp.round(d / b)

    bx = by = bz = None
    if box3 is not None:
        bx, by, bz = box3

    def delta(a, b):
        xa, ya, za = comps(a)
        xb, yb, zb = comps(b)
        return wrap(xa - xb, bx), wrap(ya - yb, by), wrap(za - zb, bz)

    def inv_norm(x, y, z):
        return jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-32))

    def cross(ax, ay, az, bx_, by_, bz_):
        return (ay * bz_ - az * by_, az * bx_ - ax * bz_, ax * by_ - ay * bx_)

    e_zero = jnp.zeros((), f32)

    if kind == "bond":
        k0, r0 = par[0:1, :], par[1:2, :]
        dx, dy, dz = delta(0, 1)
        rinv = inv_norm(dx, dy, dz)
        r = (dx * dx + dy * dy + dz * dz) * rinv
        x = r - r0
        e = k0 * x * x
        coeff = 2.0 * k0 * x * vf
        if m["cutoff"] is not None:
            keep = (r <= m["cutoff"]).astype(f32)
            e = e * keep
            coeff = coeff * keep
        c_r = coeff * rinv
        fx, fy, fz = c_r * dx, c_r * dy, c_r * dz
        return jnp.sum(e * vf), e_zero, [(-fx, -fy, -fz), (fx, fy, fz)]

    if kind == "angle":
        k0, t0 = par[0:1, :], par[1:2, :]
        x21, y21, z21 = delta(0, 1)
        x23, y23, z23 = delta(2, 1)
        dot = x21 * x23 + y21 * y23 + z21 * z23
        n21 = inv_norm(x21, y21, z21)
        n23 = inv_norm(x23, y23, z23)
        cos_t = jnp.clip(dot * n21 * n23, -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        theta = _atan2(jnp.maximum(sin_t, 1e-12), cos_t)
        dt_ = theta - t0
        e = k0 * dt_ * dt_
        coeff = jnp.where(
            sin_t != 0.0, -2.0 * k0 * dt_ / jnp.maximum(sin_t, 1e-30), 0.0
        ) * vf
        a21 = coeff * n21 * n21
        a23 = coeff * n23 * n23
        ab = coeff * n21 * n23
        f0x = a21 * cos_t * x21 - ab * x23
        f0y = a21 * cos_t * y21 - ab * y23
        f0z = a21 * cos_t * z21 - ab * z23
        f2x = a23 * cos_t * x23 - ab * x21
        f2y = a23 * cos_t * y23 - ab * y21
        f2z = a23 * cos_t * z23 - ab * z21
        return (
            jnp.sum(e * vf), e_zero,
            [(f0x, f0y, f0z),
             (-(f0x + f2x), -(f0y + f2y), -(f0z + f2z)),
             (f2x, f2y, f2z)],
        )

    if kind == "torsion":
        k0, phi0, per = par[0:1, :], par[1:2, :], par[2:3, :]
        x12, y12, z12 = delta(0, 1)
        x23, y23, z23 = delta(1, 2)
        x34, y34, z34 = delta(2, 3)
        ax, ay, az = cross(x12, y12, z12, x23, y23, z23)     # crossA
        bx_, by_, bz_ = cross(x23, y23, z23, x34, y34, z34)  # crossB
        cx, cy, cz = cross(x23, y23, z23, ax, ay, az)        # crossC
        inA = inv_norm(ax, ay, az)
        inB = inv_norm(bx_, by_, bz_)
        inC = inv_norm(cx, cy, cz)
        cos_phi = (ax * bx_ + ay * by_ + az * bz_) * inA * inB
        sin_phi = (cx * bx_ + cy * by_ + cz * bz_) * inC * inB
        phi = -_atan2(sin_phi, cos_phi)
        if m["amber"]:
            diff = per * phi - phi0
            e = k0 * (1.0 + jnp.cos(diff))
            coeff = -per * k0 * jnp.sin(diff)
        else:
            diff = phi - phi0
            diff = diff - 2.0 * jnp.pi * jnp.round(diff / (2.0 * jnp.pi))
            e = k0 * diff * diff
            coeff = 2.0 * k0 * diff
        coeff = coeff * vf
        inD = inv_norm(x23, y23, z23)
        normD = (x23 * x23 + y23 * y23 + z23 * z23) * inD
        in2D = inD * inD
        ff0 = -coeff * normD * inA * inA
        ff1 = (x12 * x23 + y12 * y23 + z12 * z23) * in2D
        ff2 = (x34 * x23 + y34 * y23 + z34 * z23) * in2D
        ff3 = coeff * normD * inB * inB
        f0x, f0y, f0z = ff0 * ax, ff0 * ay, ff0 * az
        f3x, f3y, f3z = ff3 * bx_, ff3 * by_, ff3 * bz_
        sx = ff1 * f0x - ff2 * f3x
        sy = ff1 * f0y - ff2 * f3y
        sz = ff1 * f0z - ff2 * f3z
        return (
            jnp.sum(e * vf), e_zero,
            [(-f0x, -f0y, -f0z),
             (f0x + sx, f0y + sy, f0z + sz),
             (f3x - sx, f3y - sy, f3z - sz),
             (-f3x, -f3y, -f3z)],
        )

    if kind == "nb14":
        aa, bb, qq = par[0:1, :], par[1:2, :], par[2:3, :]
        dx, dy, dz = delta(0, 1)
        # zero rinv on padded columns: r=0 would overflow rinv^12 to inf
        # and 0*inf would poison the masked sums with NaN
        rinv = inv_norm(dx, dy, dz) * vf
        rinv2 = rinv * rinv
        coeff = jnp.zeros_like(vf)
        e_lj = jnp.zeros((), f32)
        e_el = jnp.zeros((), f32)
        if m["want_lj"]:
            rinv6 = rinv2 * rinv2 * rinv2
            rinv12 = rinv6 * rinv6
            e_lj = jnp.sum((aa * rinv12 - bb * rinv6) * vf)
            coeff = coeff + (-12.0 * aa * rinv12 + 6.0 * bb * rinv6) * rinv2
        if m["want_elec"]:
            p_e = qq * rinv
            e_el = jnp.sum(p_e * vf)
            coeff = coeff - p_e * rinv2
        coeff = coeff * vf
        fx, fy, fz = coeff * dx, coeff * dy, coeff * dz
        return e_lj, e_el, [(-fx, -fy, -fz), (fx, fy, fz)]

    raise ValueError(f"unknown bonded family kind {kind}")


def _fam_kernel(starts_ref, klens_ref, idx_ref, par_ref, pos_ref, box_ref,
                f_ref, e_ref, *, kind, meta, arity, tile, pbc):
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        f_ref[...] = jnp.zeros(f_ref.shape, f_ref.dtype)
        e_ref[0, 0] = jnp.zeros((), e_ref.dtype)  # SMEM: scalar stores only
        e_ref[0, 1] = jnp.zeros((), e_ref.dtype)

    idx = idx_ref[0]                       # (arity, T) int32
    valid = idx[0:1, :] >= 0               # (1, T)
    start = starts_ref[i]
    klen = klens_ref[i]

    lane0 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)

    def gather_body(j, acc):
        b = start + j
        blk = pos_ref[b]                   # (8, 128)
        lane = lane0 + b * 128
        out = []
        for a in range(arity):
            oh = (idx[a][:, None] == lane).astype(f32)   # (T, 128)
            out.append(acc[a] + _dot_lanes(blk, oh))     # (8, T)
        return tuple(out)

    P = jax.lax.fori_loop(
        0, klen, gather_body,
        tuple(jnp.zeros((8, tile), f32) for _ in range(arity)),
    )

    box3 = None
    if pbc:
        box3 = (box_ref[0, 0], box_ref[0, 1], box_ref[0, 2])
    e_main, e_aux, contribs = _physics(kind, meta, P, par_ref[0], valid, box3)

    # (8, T) contribution blocks: rows 0..2 = fx, fy, fz
    zeros5 = jnp.zeros((5, tile), f32)
    C = [
        jnp.concatenate([fx, fy, fz, zeros5], axis=0)
        for (fx, fy, fz) in contribs
    ]

    def scatter_body(j, _):
        b = start + j
        lane = lane0 + b * 128
        delta = jnp.zeros((8, 128), f32)
        for a in range(arity):
            oh = (idx[a][:, None] == lane).astype(f32)   # (T, 128)
            delta = delta + jnp.dot(
                C[a], oh, preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # (8, 128)
        f_ref[b] = f_ref[b] + delta
        return 0

    jax.lax.fori_loop(0, klen, scatter_body, 0)

    e_ref[0, 0] = e_ref[0, 0] + e_main
    if kind == "nb14":
        e_ref[0, 1] = e_ref[0, 1] + e_aux


def _fam_kernel_window(starts_ref, idx_ref, par_ref, pos_ref, box_ref,
                       f_ref, e_ref, *, kind, meta, arity, tile, pbc,
                       kmax):
    """Flattened static-width window variant of `_fam_kernel`.

    The locality sort bounds every tile's atoms to `kmax` consecutive
    128-atom blocks, so the gather/scatter becomes ONE (W, arity*T)
    one-hot compare and TWO dot_generals against the (8, W) window
    (W = kmax*128) -- replacing klen*arity small matmuls + compares per
    tile. Measured 0.489 -> see docs/PERF.md (round 5) on thrombin."""
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        f_ref[...] = jnp.zeros(f_ref.shape, f_ref.dtype)
        e_ref[0, 0] = jnp.zeros((), e_ref.dtype)
        e_ref[0, 1] = jnp.zeros((), e_ref.dtype)

    idx = idx_ref[0]                       # (arity, T) int32
    valid = idx[0:1, :] >= 0               # (1, T)
    start = starts_ref[i]

    W = kmax * 128
    blk_w = jnp.concatenate(
        [pos_ref[start + k] for k in range(kmax)], axis=1
    )                                      # (8, W)
    # one-hot over the whole window, both slots in one compare:
    # ohT[w, a*T + t] = (window lane w == global atom idx[a, t])
    lane_w = (jax.lax.broadcasted_iota(jnp.int32, (W, arity * tile), 0)
              + start * 128)
    idx_all = idx.reshape(1, arity * tile)
    ohT = (lane_w == idx_all).astype(jnp.bfloat16)  # (W, arity*T), exact

    P_all = _dot_split3(
        blk_w, ohT, (((1,), (0,)), ((), ())),
    )                                      # (8, arity*T)
    P = [P_all[:, a * tile:(a + 1) * tile] for a in range(arity)]

    box3 = None
    if pbc:
        box3 = (box_ref[0, 0], box_ref[0, 1], box_ref[0, 2])
    e_main, e_aux, contribs = _physics(kind, meta, P, par_ref[0], valid,
                                       box3)

    zeros5 = jnp.zeros((5, tile), f32)
    C_all = jnp.concatenate(
        [jnp.concatenate([fx, fy, fz, zeros5], axis=0)
         for (fx, fy, fz) in contribs],
        axis=1,
    )                                      # (8, arity*T)

    delta = _dot_split3(
        C_all, ohT, (((1,), (1,)), ((), ())),
    )                                      # (8, W)
    for k in range(kmax):
        f_ref[start + k] = (f_ref[start + k]
                            + delta[:, k * 128:(k + 1) * 128])

    e_ref[0, 0] = e_ref[0, 0] + e_main
    if kind == "nb14":
        e_ref[0, 1] = e_ref[0, 1] + e_aux


# window kernel cutoff: beyond this many blocks the (W, arity*T) one-hot
# stops fitting comfortably in VMEM and the block loop wins
_WINDOW_KMAX = int(_os.environ.get("TMD_PALLAS_BONDED_WINDOW_KMAX", 8))


def fold_positions(pos, nblk):
    """(natoms, 3) -> (nblk, 8, 128) with rows 0..2 = x,y,z per block."""
    n = pos.shape[0]
    npad = nblk * 128
    posT = jnp.zeros((8, npad), jnp.float32)
    posT = jax.lax.dynamic_update_slice(
        posT, jnp.asarray(pos, jnp.float32).T, (0, 0)
    )
    return posT.reshape(8, nblk, 128).transpose(1, 0, 2)


def unfold_forces(folded, natoms):
    """(nblk, 8, 128) -> (natoms, 3)."""
    nblk = folded.shape[0]
    flat = folded.transpose(1, 0, 2).reshape(8, nblk * 128)
    return flat[:3, :natoms].T


def _run_family(fam: _Family, folded, box_in, nblk, pbc, interpret):
    tile = fam.idx.shape[2]
    window = fam.kmax <= _WINDOW_KMAX
    if window:
        kern = functools.partial(
            _fam_kernel_window, kind=fam.kind, meta=fam.meta,
            arity=fam.arity, tile=tile, pbc=pbc, kmax=fam.kmax,
        )
    else:
        kern = functools.partial(
            _fam_kernel, kind=fam.kind, meta=fam.meta, arity=fam.arity,
            tile=tile, pbc=pbc,
        )
    nparams = fam.par.shape[1]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),    # klens (loop form only)
        pl.BlockSpec((1, fam.arity, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nparams, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),    # folded positions
        pl.BlockSpec((1, 3), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),    # box
    ]
    args = [fam.starts, fam.klens, fam.idx, fam.par, folded, box_in]
    if window:
        del in_specs[1], args[1]
    f_out, e_out = pl.pallas_call(
        kern,
        grid=(fam.ntiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nblk, 8, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return f_out, e_out


def pallas_bonded_energy_forces(plan: PallasBondedPlan, pos, box,
                                interpret=False):
    """pos: (natoms, 3) f32; box: (3,) f32 diagonal or None. Returns
    (per-term potential dict, forces (natoms, 3) f32), numerically matching
    torchmd_tpu.bonded.bonded_energy_forces in f32."""
    pbc = box is not None
    if pbc:
        box = jnp.asarray(box, jnp.float32)
        safe = jnp.where(box > 0, box, jnp.asarray(1e30, jnp.float32))
        box_in = safe.reshape(1, 3)
    else:
        box_in = jnp.ones((1, 3), jnp.float32)

    folded = fold_positions(pos, plan.nblk)
    f_total = None
    pot: dict = {}
    for fam in plan.families:
        f_out, e_out = _run_family(fam, folded, box_in, plan.nblk, pbc,
                                   interpret)
        f_total = f_out if f_total is None else f_total + f_out
        if fam.kind == "nb14":
            m = dict(fam.meta)
            if m["want_lj"]:
                pot["lj"] = pot.get("lj", 0.0) + e_out[0, 0]
            if m["want_elec"]:
                pot["electrostatics"] = (
                    pot.get("electrostatics", 0.0) + e_out[0, 1]
                )
        else:
            pot[fam.name] = pot.get(fam.name, 0.0) + e_out[0, 0]
    return pot, unfold_forces(f_total, plan.natoms)

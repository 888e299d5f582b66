"""Fused Pallas TPU kernels for the PME mesh <-> particle contractions.

The MXU matmul formulation of B-spline spreading/gathering
(`ewald.PmeRecip._spread_matmul` / `energy_forces`) is scatter-free but
materializes (chunk, Kx*Ky)-shaped intermediates in HBM — the force
gather alone moves ~8 GB/step at 62.5k atoms / 80^3 mesh (measured
18.3 ms, docs/PERF.md round-5 sub-ledger). These kernels fuse the
per-atom outer products and the xy reductions around the z-contraction
matmul so every (atoms, K^2) object lives only in VMEM:

- `pme_gather_forces`: F_i = -(dRx (x) Ry (x) Rzq  : phi,
                               Rx (x) dRy (x) Rzq  : phi,
                               Rx (x) Ry  (x) dRzq : phi)
  per atom block: one MXU dot H2 = [Rzq; dRzq] @ phi_g^T over the
  x-group's (G*Kyp, Kz) phi panel, then per-x-column VPU lane
  reductions against the y tap rows. No HBM intermediate.
- `pme_spread`: mesh[x,y,z] = sum_i Rx[i,x] Ry[i,y] (q Rz)[i,z] with
  the (I, G*Kyp) outer-product panel built in VMEM per atom block and
  contracted over atoms on the MXU into a VMEM-resident mesh panel.

Layout: y is padded to the 128-lane boundary (Kyp) so x-column panels
of the flattened (Kx*Kyp, Kz) mesh/phi are lane-aligned static slices;
x is padded to a multiple of the x-group size G. Padding rows/planes
are zero so they contribute nothing.

Precision: f32 operands are split hi/lo into bf16 and contracted in 3
single-pass MXU matmuls (hi.hi + hi.lo + lo.hi), ~1e-5 relative — the
same accuracy class as the order-4 spline truncation and far inside
f32 MD force noise. TMD_PME_PALLAS_PREC=highest switches the dots to
6-pass HIGHEST for validation. Equivalence vs the XLA einsum path is
asserted in tests/test_pallas_pme.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised on TPU images
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------
# precision: split-bf16 MXU dots
# ---------------------------------------------------------------------

def _split2(x):
    """2-term bf16 split: hi + lo covers 16 of f32's 24 mantissa bits."""
    bf, f32 = jnp.bfloat16, jnp.float32
    hi = x.astype(bf)
    lo = (x - hi.astype(f32)).astype(bf)
    return hi, lo


def _dot_any(a, b, dims, prec):
    """f32 (.) f32 on the MXU: 'split2' = 3 single-pass bf16 matmuls
    (drop lo.lo, ~2^-16 relative), 'highest' = the 6-pass exact path."""
    if prec == "highest":
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    ah, al = _split2(a)
    bh, bl = _split2(b)
    out = None
    for x, y in ((ah, bh), (ah, bl), (al, bh)):
        d = jax.lax.dot_general(
            x, y, (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _prec_env():
    p = _os.environ.get("TMD_PME_PALLAS_PREC", "split2")
    if p not in ("split2", "highest"):
        raise ValueError(
            f"TMD_PME_PALLAS_PREC={p!r} (want split2 | highest)")
    return p


# ---------------------------------------------------------------------
# force gather
# ---------------------------------------------------------------------

def _dot_seg(a, S_bf16, prec):
    """f32 a (.) EXACT-bf16 0/1 segment matrix: 3 single-pass bf16
    matmuls (split only the f32 side; each partial product is exact)."""
    if prec == "highest":
        return jax.lax.dot_general(
            a, S_bf16.astype(jnp.float32), ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    bf, f32 = jnp.bfloat16, jnp.float32
    hi = a.astype(bf)
    r1 = a - hi.astype(f32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(f32)).astype(bf)
    out = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(
            part, S_bf16, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        out = d if out is None else out + d
    return out


def _gather_kernel(rxg_ref, drxg_ref, ry_ref, dry_ref, rzq_ref, drzq_ref,
                   phi_ref, out_ref, *, I, G, Kyp, prec):
    xg = pl.program_id(1)

    @pl.when(xg == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    z2 = jnp.concatenate([rzq_ref[...], drzq_ref[...]], axis=0)  # (2I,Kz)
    # H2 = z2 @ phi_panel: (2I, G*Kyp); rows [:I] = H, [I:] = Hd.
    # phi arrives z-major (Kz, Kxp*Kyp) so the dot is a plain (M,K)(K,N)
    # contraction — no per-invocation operand relayout
    h2 = _dot_any(z2, phi_ref[...], ((1,), (0,)), prec)
    H = h2[:I]
    Hd = h2[I:]
    # y reductions ride the MXU: lane-axis VPU sums of (I, Kyp) blocks
    # are the measured bottleneck (the round-4 roofline's relayout tax,
    # docs/PERF.md); a 0/1 segment matrix S[(g*Kyp+y), g'] = [g == g']
    # turns all G of them into one (I, G*Kyp) @ (G*Kyp, G) dot
    ryG = jnp.concatenate([ry_ref[...]] * G, axis=1)    # (I, G*Kyp)
    dryG = jnp.concatenate([dry_ref[...]] * G, axis=1)
    GK = G * Kyp
    seg = jax.lax.broadcasted_iota(jnp.int32, (GK, G), 0) // Kyp
    col = jax.lax.broadcasted_iota(jnp.int32, (GK, G), 1)
    S = (seg == col).astype(jnp.bfloat16)
    s_all = _dot_seg(H * ryG, S, prec)      # (I, G)  sum_y Ry H
    t_all = _dot_seg(H * dryG, S, prec)     # (I, G)  sum_y dRy H
    sd_all = _dot_seg(Hd * ryG, S, prec)    # (I, G)  sum_y Ry Hd
    # x rows come pre-grouped (nxg, Np, G) so the block's last dim
    # equals the array dim (Mosaic block-shape rule); drop the lead 1
    rxg = rxg_ref[0]
    drxg = drxg_ref[0]
    fx = jnp.sum(drxg * s_all, axis=1, keepdims=True)   # (I, 1)
    fy = jnp.sum(rxg * t_all, axis=1, keepdims=True)
    fz = jnp.sum(rxg * sd_all, axis=1, keepdims=True)
    pad = jnp.zeros((I, 5), jnp.float32)
    out_ref[...] = out_ref[...] - jnp.concatenate(
        [fx, fy, fz, pad], axis=1)


def pme_gather_forces(Rx, Ry, Rzq, dRx, dRy, dRzq, phi, *,
                      block_i=None, group_x=16, interpret=False):
    """Reciprocal-space PME forces from the convolved potential grid.

    F_i = -(sum_xyz dRx Ry Rzq phi, ..., sum_xyz Rx Ry dRzq phi) — the
    exact analytic-gather contraction of `PmeRecip.energy_forces`
    (ewald.py), fused so the per-atom (Kx*Ky)-sized intermediates never
    leave VMEM. Inputs: per-axis dense tap rows (N, K*) and their
    derivatives (q already folded into Rzq/dRzq), phi (Kx, Ky, Kz).
    Returns (N, 3) f32 forces.
    """
    prec = _prec_env()
    f32 = jnp.float32
    N, Kx = Rx.shape
    Ky = Ry.shape[1]
    Kz = Rzq.shape[1]
    I = int(block_i or _os.environ.get("TMD_PME_BLOCK_I", 128))
    G = int(group_x)
    Kyp = _round_up(Ky, 128)
    Kxp = _round_up(Kx, G)
    Np = _round_up(N, I)

    def pad2(a, rows, cols):
        return jnp.pad(a.astype(f32),
                       ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    nxg = Kxp // G
    # pre-group x rows (nxg, Np, G): Mosaic requires block last dims
    # divisible by (8, 128) or equal to the array dims — a (I, G=16)
    # block of an (Np, Kxp) array violates that, a (1, I, G) block of
    # this layout doesn't
    Rxp = pad2(Rx, Np, Kxp).reshape(Np, nxg, G).transpose(1, 0, 2)
    dRxp = pad2(dRx, Np, Kxp).reshape(Np, nxg, G).transpose(1, 0, 2)
    Ryp = pad2(Ry, Np, Kyp)
    dRyp = pad2(dRy, Np, Kyp)
    Rzp = pad2(Rzq, Np, Kz)
    dRzp = pad2(dRzq, Np, Kz)
    phip = jnp.pad(phi.astype(f32),
                   ((0, Kxp - Kx), (0, Kyp - Ky), (0, 0)))
    phip = phip.reshape(Kxp * Kyp, Kz).T          # z-major (Kz, Kxp*Kyp)

    grid = (Np // I, nxg)
    kern = functools.partial(
        _gather_kernel, I=I, G=G, Kyp=Kyp, prec=prec)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, I, G), lambda b, x: (x, b, 0),
                         memory_space=pltpu.VMEM),          # rx group
            pl.BlockSpec((1, I, G), lambda b, x: (x, b, 0),
                         memory_space=pltpu.VMEM),          # drx group
            pl.BlockSpec((I, Kyp), lambda b, x: (b, 0),
                         memory_space=pltpu.VMEM),          # ry
            pl.BlockSpec((I, Kyp), lambda b, x: (b, 0),
                         memory_space=pltpu.VMEM),          # dry
            pl.BlockSpec((I, Kz), lambda b, x: (b, 0),
                         memory_space=pltpu.VMEM),          # rzq
            pl.BlockSpec((I, Kz), lambda b, x: (b, 0),
                         memory_space=pltpu.VMEM),          # drzq
            pl.BlockSpec((Kz, G * Kyp), lambda b, x: (0, x),
                         memory_space=pltpu.VMEM),          # phi panel
        ],
        out_specs=pl.BlockSpec((I, 8), lambda b, x: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 8), f32),
        interpret=interpret,
    )(Rxp, dRxp, Ryp, dRyp, Rzp, dRzp, phip)
    return out[:N, :3]


# ---------------------------------------------------------------------
# charge spreading
# ---------------------------------------------------------------------

def _spread_kernel(rxg_ref, ry_ref, rzqT_ref, mesh_ref, *, I, G, Kyp, prec):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        mesh_ref[...] = jnp.zeros_like(mesh_ref)

    rxg = rxg_ref[0]
    ry = ry_ref[...]
    # outer-product panel p2[i, g*Kyp + y] = rx[i, xg*G+g] * ry[i, y]
    p2 = jnp.concatenate(
        [rxg[:, g:g + 1] * ry for g in range(G)], axis=1)  # (I, G*Kyp)
    # mesh panel (z-major) += rzq^T @ p2 over atoms: (Kz, G*Kyp); the
    # z rows arrive pre-transposed (Kz, Np) so the dot is plain
    # (M,K)(K,N) — no per-invocation operand relayout
    mesh_ref[...] = mesh_ref[...] + _dot_any(
        rzqT_ref[...], p2, ((1,), (0,)), prec)


def pme_spread(Rx, Ry, Rzq, kmax, *, block_i=None, group_x=16,
               interpret=False):
    """B-spline charge spreading mesh[x,y,z] = sum_i Rx Ry (q Rz) with
    the atom-chunk outer products VMEM-resident (the XLA einsum path
    materializes them in HBM). Returns the (Kx, Ky, Kz) f32 mesh."""
    prec = _prec_env()
    f32 = jnp.float32
    N, Kx = Rx.shape
    Ky = Ry.shape[1]
    Kz = Rzq.shape[1]
    I = int(block_i or _os.environ.get("TMD_PME_BLOCK_I", 128))
    G = int(group_x)
    Kyp = _round_up(Ky, 128)
    Kxp = _round_up(Kx, G)
    Np = _round_up(N, I)

    def pad2(a, rows, cols):
        return jnp.pad(a.astype(f32),
                       ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    nxg = Kxp // G
    Rxp = pad2(Rx, Np, Kxp).reshape(Np, nxg, G).transpose(1, 0, 2)
    Ryp = pad2(Ry, Np, Kyp)
    RzpT = pad2(Rzq, Np, Kz).T                    # (Kz, Np)

    grid = (nxg, Np // I)
    kern = functools.partial(_spread_kernel, I=I, G=G, Kyp=Kyp, prec=prec)
    mesh = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, I, G), lambda x, b: (x, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I, Kyp), lambda x, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kz, I), lambda x, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Kz, G * Kyp), lambda x, b: (0, x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kz, Kxp * Kyp), f32),
        interpret=interpret,
    )(Rxp, Ryp, RzpT)
    mesh = mesh.reshape(Kz, Kxp, Kyp).transpose(1, 2, 0)[:Kx, :Ky, :]
    return mesh

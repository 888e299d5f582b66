"""Fused Pallas TPU kernels for the PME mesh <-> particle contractions.

The MXU matmul formulation of B-spline spreading/gathering
(`ewald.PmeRecip._spread_matmul` / `energy_forces`) is scatter-free but
materializes (chunk, Kx*Ky)-shaped intermediates in HBM — the force
gather alone moves ~8 GB/step at 62.5k atoms / 80^3 mesh (measured
18.3 ms, docs/PERF.md round-5 sub-ledger). These kernels contract the
(z, y) axes JOINTLY: each atom block builds one VMEM-resident panel

    Q[i, z*Kyp + y] = (q*Rz)[i, z] * Ry[i, y]

and contracts it against a z,y-major mesh/derivative-grid matrix in a
single MXU dot. Nothing (atoms, K^2)-shaped ever touches HBM, and —
unlike the panel-per-x-group design measured first (docs/PERF.md) —
there is no per-x segment reduction: the matmul's own contraction does
the y sum at full tile utilization.

Forces use ik (spectral) differentiation: the convolved potential's
three gradient grids come from the Fourier side (i*k_a multiplications
+ three extra irfftns), so the gather needs only the PLAIN tap rows —
no spline-derivative rows, and one Q panel serves all three force
components:

    F_a[i] = - sum_x Rx[i, x] * (Q @ dphi_a)[i, x]

ik forces agree with the analytic spline-derivative forces (the XLA
path, kept for CPU/f64/validation) to the spline truncation order
(~1e-4 relative at order 4); they are the standard PME force variant
used by e.g. LAMMPS. Equivalence and a cross-formulation check live in
tests/test_pallas_pme.py.

Precision: f32 operands are split hi/lo into bf16 and contracted in 3
single-pass MXU matmuls (hi.hi + hi.lo + lo.hi, ~1e-5 relative — the
same class as the spline truncation). TMD_PME_PALLAS_PREC=highest
switches to 6-pass HIGHEST dots for validation.
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

def _dot_any(a, b, dims, prec):
    """f32 (.) f32 on the MXU: 'split2' = 3 single-pass bf16 matmuls
    (hi.hi + hi.lo + lo.hi, drop lo.lo: ~2^-16 relative), 'highest' =
    the 6-pass exact path."""
    if prec == "highest":
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    bf, f32 = jnp.bfloat16, jnp.float32
    ah = a.astype(bf)
    al = (a - ah.astype(f32)).astype(bf)
    bh = b.astype(bf)
    bl = (b - bh.astype(f32)).astype(bf)
    out = None
    for x, y in ((ah, bh), (ah, bl), (al, bh)):
        d = jax.lax.dot_general(
            x, y, (dims, ((), ())),
            preferred_element_type=f32,
        )
        out = d if out is None else out + d
    return out


def _prec_env():
    p = _os.environ.get("TMD_PME_PALLAS_PREC", "split2")
    if p not in ("split2", "highest"):
        raise ValueError(
            f"TMD_PME_PALLAS_PREC={p!r} (want split2 | highest)")
    return p


def _build_q(rzc, ry, ZC):
    """Q chunk (I, ZC*Kyp): Q[i, j*Kyp + y] = rzc[i, j] * ry[i, y],
    built piecewise along lanes so no sublane->lane relayout occurs."""
    return jnp.concatenate(
        [rzc[:, j:j + 1] * ry for j in range(ZC)], axis=1)


# ---------------------------------------------------------------------
# ik force gather
# ---------------------------------------------------------------------

def _gather_kernel(rzc_ref, ry_ref, phi_ref, t_ref, *, I, ZC, Kyp, prec):
    zc = pl.program_id(1)

    @pl.when(zc == 0)
    def _init():
        t_ref[...] = jnp.zeros_like(t_ref)

    Q = _build_q(rzc_ref[0], ry_ref[...], ZC)       # (I, ZC*Kyp)
    t_ref[...] = t_ref[...] + _dot_any(
        Q, phi_ref[...], ((1,), (0,)), prec)        # (I, P)


def pme_gather_ik(Rx, Ry, Rzq, dgrids, *, block_i=None, zchunk=8,
                  interpret=False):
    """Reciprocal-space PME forces by ik differentiation.

    F_a[i] = - sum_xyz Rx[i,x] Ry[i,y] (q Rz)[i,z] dphi_a[x,y,z] with
    dgrids = (dphi_x, dphi_y, dphi_z) the spectral-derivative grids of
    the convolved potential (built in ewald.PmeRecip.energy_forces).
    Returns (N, 3) f32 forces. One fused Q-panel dot per atom block and
    z-chunk; the three component grids pack the matmul's output lanes.
    """
    prec = _prec_env()
    f32 = jnp.float32
    N, Kx = Rx.shape
    Ky = Ry.shape[1]
    Kz = Rzq.shape[1]
    I = int(block_i or _os.environ.get("TMD_PME_BLOCK_I", 256))
    ZC = int(zchunk)
    Kyp = _round_up(Ky, 128)
    Kzp = _round_up(Kz, ZC)
    P = _round_up(3 * Kx, 128)
    Np = _round_up(N, I)

    def pad2(a, rows, cols):
        return jnp.pad(a.astype(f32),
                       ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    nzc = Kzp // ZC
    Ryp = pad2(Ry, Np, Kyp)
    # z rows pre-chunked (nzc, Np, ZC) so blocks obey the Mosaic
    # last-two-dims rule (divisible by (8, 128) or equal to array dims)
    Rzc = pad2(Rzq, Np, Kzp).reshape(Np, nzc, ZC).transpose(1, 0, 2)
    # grid matrix (Kzp*Kyp, P): rows z-major (z*Kyp + y), columns pack
    # the three components tightly (a*Kx + x)
    dg = jnp.stack([g.astype(f32) for g in dgrids], 0)  # (3, Kx, Ky, Kz)
    dg = jnp.pad(dg, ((0, 0), (0, 0), (0, Kyp - Ky), (0, Kzp - Kz)))
    dg = dg.transpose(3, 2, 0, 1).reshape(Kzp * Kyp, 3 * Kx)
    phiM = jnp.pad(dg, ((0, 0), (0, P - 3 * Kx)))

    kern = functools.partial(
        _gather_kernel, I=I, ZC=ZC, Kyp=Kyp, prec=prec)
    t = pl.pallas_call(
        kern,
        grid=(Np // I, nzc),
        in_specs=[
            pl.BlockSpec((1, I, ZC), lambda b, z: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I, Kyp), lambda b, z: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ZC * Kyp, P), lambda b, z: (z, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((I, P), lambda b, z: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, P), f32),
        interpret=interpret,
    )(Rzc, Ryp, phiM)
    t3 = t[:N, :3 * Kx].reshape(N, 3, Kx)
    return -jnp.einsum("nax,nx->na", t3, Rx.astype(f32))


# ---------------------------------------------------------------------
# charge spreading
# ---------------------------------------------------------------------

def _spread_kernel(rxT_ref, rzc_ref, ry_ref, mesh_ref, *, I, ZC, Kyp,
                   prec):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        mesh_ref[...] = jnp.zeros_like(mesh_ref)

    Q = _build_q(rzc_ref[0], ry_ref[...], ZC)       # (I, ZC*Kyp)
    # meshT chunk (Kxp, ZC*Kyp) += Rx^T . Q over atoms; Rx arrives
    # pre-transposed (Kxp, Np) so the dot is plain (M,K)(K,N)
    mesh_ref[...] = mesh_ref[...] + _dot_any(
        rxT_ref[...], Q, ((1,), (0,)), prec)


def pme_spread(Rx, Ry, Rzq, kmax, *, block_i=None, zchunk=8,
               interpret=False):
    """B-spline charge spreading mesh[x,y,z] = sum_i Rx Ry (q Rz) with
    the atom-block outer-product panels VMEM-resident (the XLA einsum
    path materializes them in HBM). Returns the (Kx, Ky, Kz) f32 mesh."""
    prec = _prec_env()
    f32 = jnp.float32
    N, Kx = Rx.shape
    Ky = Ry.shape[1]
    Kz = Rzq.shape[1]
    I = int(block_i or _os.environ.get("TMD_PME_BLOCK_I", 256))
    ZC = int(zchunk)
    Kyp = _round_up(Ky, 128)
    Kzp = _round_up(Kz, ZC)
    Kxp = _round_up(Kx, 8)
    Np = _round_up(N, I)

    def pad2(a, rows, cols):
        return jnp.pad(a.astype(f32),
                       ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    nzc = Kzp // ZC
    RxT = pad2(Rx, Np, Kxp).T                       # (Kxp, Np)
    Ryp = pad2(Ry, Np, Kyp)
    Rzc = pad2(Rzq, Np, Kzp).reshape(Np, nzc, ZC).transpose(1, 0, 2)

    kern = functools.partial(
        _spread_kernel, I=I, ZC=ZC, Kyp=Kyp, prec=prec)
    meshT = pl.pallas_call(
        kern,
        grid=(nzc, Np // I),
        in_specs=[
            pl.BlockSpec((Kxp, I), lambda z, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I, ZC), lambda z, b: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I, Kyp), lambda z, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Kxp, ZC * Kyp), lambda z, b: (0, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kxp, Kzp * Kyp), f32),
        interpret=interpret,
    )(RxT, Rzc, Ryp)
    mesh = meshT.reshape(Kxp, Kzp, Kyp).transpose(0, 2, 1)
    return mesh[:Kx, :Ky, :Kz]

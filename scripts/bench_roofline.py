"""Per-stage roofline of the dense pair kernel (VERDICT round-3 item 2).

Runs a family of Pallas micro-kernels with the SAME grid/block geometry
as the production `_kernel` (full-square (1, TILE) row layout, int8 mask
tile), each adding one stage of the real computation:

  load      mask tile + i/j row loads, constant energy   (overhead floor)
  d2        + displacement + squared distance + masked reduction
  rsqrt     + rsqrt(d2)
  math      + full LJ(switch)+RFA per-pair scalar math (energy only)
  g         + the g = (dE/dr)/r block (no force reductions)
  forces    + the 6 cross-lane force reductions (== production kernel)
  mxred     like `forces` but row/col force reductions restructured as
            2 MXU matmuls g @ Rj / g^T @ Ri plus 2 scalar g-sums
            (valid without PBC: sum_j g*dx = xi*rowsum(g) - g@xj)

Timing methodology (the axon tunnel adds ~35 ms of dispatch/fetch
overhead per sync, swamping ~1 ms kernels): each stage runs inside one
jitted `lax.scan` whose carry chains the energy output back into the
inputs, at two chain lengths K1 < K2; per-invocation time is the SLOPE
(t2 - t1) / (K2 - K1), cancelling all constant dispatch/fetch cost.
The per-stage DELTAS are the published cost breakdown (docs/PERF.md).
Elemental VPU throughputs (fma / rsqrt / exp / div dependent chains)
use the same slope method for the op-mix model.

Usage: python scripts/bench_roofline.py [--n 4676] [--tile 512]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CUTOFF, SWITCH = 7.3, 6.0
KRF, CRF = 0.0005, 0.2  # representative RFA constants


def stage_kernel(xi_ref, yi_ref, zi_ref, qi_ref, si_ref, ei_ref,
                 xj_ref, yj_ref, zj_ref, qj_ref, sj_ref, ej_ref,
                 mask_ref,
                 fx_ref, fy_ref, fz_ref, e_ref, *, stage, tile):
    i = pl.program_id(0)
    j = pl.program_id(1)
    first = jnp.logical_and(i == 0, j == 0)

    # the (0, i) force blocks are revisited across the j sweep: zero them
    # on the first j visit, not only at grid (0, 0)
    @pl.when(j == 0)
    def _init_f():
        fx_ref[...] = jnp.zeros_like(fx_ref)
        fy_ref[...] = jnp.zeros_like(fy_ref)
        fz_ref[...] = jnp.zeros_like(fz_ref)

    @pl.when(first)
    def _init_e():
        e_ref[0, 0] = jnp.float32(0.0)

    mask = mask_ref[...] != 0
    fmask = mask.astype(jnp.float32)
    if stage == "load":
        e_ref[0, 0] = e_ref[0, 0] + jnp.sum(fmask)
        return

    xi = xi_ref[0, :][:, None]
    yi = yi_ref[0, :][:, None]
    zi = zi_ref[0, :][:, None]
    xj = xj_ref[0, :][None, :]
    yj = yj_ref[0, :][None, :]
    zj = zj_ref[0, :][None, :]
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(mask, d2, 1.0)
    if stage == "d2":
        e_ref[0, 0] = e_ref[0, 0] + jnp.sum(d2 * fmask)
        return

    rinv = jax.lax.rsqrt(d2)
    if stage == "rsqrt":
        e_ref[0, 0] = e_ref[0, 0] + jnp.sum(rinv * fmask)
        return

    # full LJ + switch + RFA per-pair math (the production op mix)
    cut2 = jnp.float32(CUTOFF * CUTOFF)
    fmask = jnp.logical_and(mask, d2 <= cut2).astype(jnp.float32)
    dist = d2 * rinv
    si = si_ref[0, :][:, None]
    sj = sj_ref[0, :][None, :]
    ei = ei_ref[0, :][:, None]
    ej = ej_ref[0, :][None, :]
    qi = qi_ref[0, :][:, None]
    qj = qj_ref[0, :][None, :]
    sig = si + sj
    eps = ei * ej
    s2 = sig * sig
    s6 = s2 * s2 * s2
    B = 4.0 * eps * s6
    A = B * s6
    rinv2 = rinv * rinv
    rinv6 = rinv2 * rinv2 * rinv2
    rinv12 = rinv6 * rinv6
    pot = A * rinv12 - B * rinv6
    dEdr = (-12.0 * A * rinv12 + 6.0 * B * rinv6) * rinv
    t = (dist - SWITCH) / (CUTOFF - SWITCH)
    sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
    dsw = t * t * (-30.0 + t * (60.0 - t * 30.0)) / (CUTOFF - SWITCH)
    in_sw = dist > SWITCH
    dEdr = jnp.where(in_sw, dEdr * sw + pot * dsw, dEdr)
    pot = jnp.where(in_sw, pot * sw, pot)
    qq = jnp.float32(332.0637) * qi * qj
    pot_el = qq * (rinv + KRF * d2 - CRF)
    dEdr_el = qq * (2.0 * KRF - rinv * rinv * rinv)
    e = 0.5 * jnp.sum((pot + pot_el) * fmask)
    if stage == "math":
        e_ref[0, 0] = e_ref[0, 0] + e
        return

    g = (dEdr * rinv + dEdr_el) * fmask
    if stage == "g":
        # consume g without the force reductions (one scalar sum)
        e_ref[0, 0] = e_ref[0, 0] + e + jnp.sum(g)
        return

    e_ref[0, 0] = e_ref[0, 0] + e
    if stage == "forces":
        fx = -jnp.sum(g * dx, axis=1)
        fy = -jnp.sum(g * dy, axis=1)
        fz = -jnp.sum(g * dz, axis=1)
        fx_ref[0, :] = fx_ref[0, :] + fx
        fy_ref[0, :] = fy_ref[0, :] + fy
        fz_ref[0, :] = fz_ref[0, :] + fz
        return

    if stage == "mxred":
        # sum_j g*dx = xi * rowsum(g) - g @ xj  (no PBC identity):
        # 1 lane reduction + one (T,T)@(T,3) matmul instead of 3 lane
        # reductions of elementwise products; same for y/z.
        srow = jnp.sum(g, axis=1)                       # (T,)
        Rj = jnp.concatenate(
            [xj_ref[...], yj_ref[...], zj_ref[...]], axis=0
        ).T                                             # (T, 3)
        gr = jnp.dot(g, Rj, preferred_element_type=jnp.float32)
        fx_ref[0, :] = fx_ref[0, :] - (xi[:, 0] * srow - gr[:, 0])
        fy_ref[0, :] = fy_ref[0, :] - (yi[:, 0] * srow - gr[:, 1])
        fz_ref[0, :] = fz_ref[0, :] - (zi[:, 0] * srow - gr[:, 2])
        return
    raise ValueError(stage)


def build_call(stage, n, tile):
    npad = -(-n // tile) * tile
    rs = np.random.RandomState(0)
    pos = rs.rand(n, 3).astype(np.float32) * 60.0
    xp = jnp.pad(jnp.asarray(pos[:, 0]), (0, npad - n))[None, :]
    yp = jnp.pad(jnp.asarray(pos[:, 1]), (0, npad - n))[None, :]
    zp = jnp.pad(jnp.asarray(pos[:, 2]), (0, npad - n))[None, :]
    q = jnp.pad(jnp.asarray(rs.randn(n).astype(np.float32) * 0.3),
                (0, npad - n))[None, :]
    sg = jnp.pad(jnp.asarray(1.5 + rs.rand(n).astype(np.float32)),
                 (0, npad - n))[None, :]
    ep = jnp.pad(jnp.asarray(0.3 * rs.rand(n).astype(np.float32)),
                 (0, npad - n))[None, :]
    mask = np.ones((npad, npad), np.int8)
    mask[n:, :] = 0
    mask[:, n:] = 0
    np.fill_diagonal(mask, 0)
    mask = jnp.asarray(mask)

    ni = npad // tile

    def ispec():
        return pl.BlockSpec((1, tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def jspec():
        return pl.BlockSpec((1, tile), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(ni, ni),
        in_specs=[ispec()] * 6 + [jspec()] * 6 + [
            pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )

    call = pl.pallas_call(
        functools.partial(stage_kernel, stage=stage, tile=tile),
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
    )
    args = (xp, yp, zp, q, sg, ep, xp, yp, zp, q, sg, ep, mask)
    return call, args


def timed_chain(fn, rounds=4):
    """Time a jitted zero-arg fn with one scalar fetch sync."""
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def run_stage(stage, n, tile, k1=8, k2=48):
    call, args = build_call(stage, n, tile)
    (xp, *rest) = args

    def make(K):
        @jax.jit
        def go():
            def body(carry, _):
                # chain the energy scalar back into xi so the scan body
                # cannot be hoisted as loop-invariant; 1e-37 keeps the
                # perturbation below f32 resolution of the inputs
                e = carry
                xi_in = xp + e * jnp.float32(1e-37)
                out = call(xi_in, *rest)
                return out[3], out

            e0 = jnp.zeros((1, 1), jnp.float32)
            eK, outs = jax.lax.scan(body, e0, None, length=K)
            # return the LAST iteration's outputs (index -1 of stacked)
            return eK, jax.tree_util.tree_map(lambda o: o[-1], outs)

        return go

    t1 = timed_chain(make(k1))
    t2 = timed_chain(make(k2))
    per = (t2 - t1) / (k2 - k1)
    _, out = make(k1)()
    return per, out


def elemental_throughputs():
    """Dependent-chain throughputs of the ops in the pair mix (slope
    method over two scan lengths to cancel dispatch/fetch overhead)."""
    UNROLL = 64
    x = jnp.full((1024, 512), 0.4999, jnp.float32)
    K1, K2 = 2000, 12000

    def chain(opn, K):
        def body(c, _):
            for _ in range(UNROLL):
                if opn == "fma":
                    c = c * c + 0.25
                elif opn == "rsqrt":
                    c = jax.lax.rsqrt(c + 1.0)
                elif opn == "exp":
                    c = jnp.exp(-c) + 0.1
                elif opn == "div":
                    c = 1.0 / (c + 1.0)
            return c, None

        return jax.jit(
            lambda v: jax.lax.scan(body, v, None, length=K)[0])

    out = {}
    for opn in ("fma", "rsqrt", "exp", "div"):
        ts = []
        for K in (K1, K2):
            f = chain(opn, K)
            float(f(x)[0, 0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(x)[0, 0])
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        per_iter = (ts[1] - ts[0]) / (K2 - K1)
        out[opn] = UNROLL * x.size / per_iter / 1e12  # Tops/s
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4676)
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    stages = ["load", "d2", "rsqrt", "math", "g", "forces", "mxred"]
    res = {}
    f_ref = None
    for st in stages:
        t, out = run_stage(st, args.n, args.tile)
        res[st] = t
        print(json.dumps({"stage": st, "ms": round(t * 1e3, 3)}),
              flush=True)
        if st == "forces":
            f_ref = [np.asarray(o) for o in out[:3]]
        if st == "mxred" and f_ref is not None:
            err = max(
                float(np.max(np.abs(np.asarray(out[k]) - f_ref[k])))
                / max(1.0, float(np.max(np.abs(f_ref[k]))))
                for k in range(3)
            )
            print(json.dumps({"mxred_vs_forces_rel_err": err}),
                  flush=True)

    deltas = {
        "overhead_floor": res["load"],
        "displacement_d2": res["d2"] - res["load"],
        "rsqrt": res["rsqrt"] - res["d2"],
        "pair_math": res["math"] - res["rsqrt"],
        "g_block": res["g"] - res["math"],
        "force_reductions": res["forces"] - res["g"],
        "force_reductions_mxu": res["mxred"] - res["g"],
    }
    print(json.dumps({"deltas_ms": {k: round(v * 1e3, 3)
                                    for k, v in deltas.items()}}),
          flush=True)
    print(json.dumps({"elemental_tops": {
        k: round(v, 2) for k, v in elemental_throughputs().items()
    }}), flush=True)


if __name__ == "__main__":
    main()

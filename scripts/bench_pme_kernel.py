"""Microbenchmark: fused Pallas PME kernels vs the XLA einsum path.

Synthetic rows at production scale (default 62,500 atoms, 80^3 mesh,
order 4) — no molecule build, no neighbor kernel — for fast iteration
on the kernels alone. Slope-timed inside a jitted lax.scan like
bench_waterbox_anatomy.py. Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--natoms", type=int, default=62500)
    ap.add_argument("--kmesh", type=int, nargs=3, default=[80, 80, 80])
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from torchmd_tpu.ewald import PmeRecip
    from torchmd_tpu.ops import pallas_pme as ppme

    N = args.natoms
    Kx, Ky, Kz = args.kmesh
    rng = np.random.default_rng(0)
    box = np.array([77.6, 77.6, 77.6], np.float32)
    pos0 = (rng.random((N, 3)) * box).astype(np.float32)
    q = (rng.random(N) - 0.5).astype(np.float32)
    rec = PmeRecip(q, box, cutoff=8.5, order=args.order,
                   dtype=jnp.float32)
    rec.cfg = rec.cfg._replace(kmax=(Kx, Ky, Kz))
    rec._b2 = tuple(
        jnp.asarray(rec._spline_b2(K), jnp.float64).astype(jnp.float32)
        for K in (Kx, Ky, Kz))
    boxj = jnp.asarray(box)
    pos0 = jnp.asarray(pos0)
    phi0 = jnp.asarray(
        (rng.random((Kx, Ky, Kz)) - 0.5).astype(np.float32))

    def slope_time(body_fn, k1=4, k2=20, rounds=3):
        def make(K):
            @jax.jit
            def go():
                def body(carry, _):
                    p = pos0 + carry * jnp.float32(1e-37)
                    out = body_fn(p)
                    e = jax.tree_util.tree_leaves(out)[0]
                    e = jnp.sum(e) if e.ndim else e
                    return e.astype(jnp.float32), e
                _, es = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=K)
                return es[-1]
            return go

        def timed(K):
            fn = make(K)
            out = fn()
            float(np.asarray(out).ravel()[0])
            best = float("inf")
            for _ in range(rounds):
                t0 = time.perf_counter()
                out = fn()
                float(np.asarray(out).ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(k2) - timed(k1)) / (k2 - k1)

    want = args.stages.split(",") if args.stages != "all" else None

    def report(name, fn):
        if want is not None and not any(
                w.strip() and w.strip() in name for w in want):
            return
        try:
            per = slope_time(fn)
        except Exception as e:
            print(f"# stage {name!r} skipped: {e!r}"[:300], flush=True)
            return
        print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
              flush=True)

    def rows_of(p):
        (Rx, Ry, Rz), _ = rec._tap_rows_d(p, boxj)
        qj = rec.charges
        return Rx, Ry, Rz * qj[:, None]

    report("tap rows", lambda p: sum(jnp.sum(r) for r in rows_of(p)))

    dgrids = (phi0, phi0 * 0.5, phi0 * 0.25)

    def g_pallas(p):
        Rx, Ry, Rzq = rows_of(p)
        return jnp.sum(ppme.pme_gather_ik(Rx, Ry, Rzq, dgrids))

    report("gather pallas", g_pallas)

    def s_pallas(p):
        Rx, Ry, Rzq = rows_of(p)
        return jnp.sum(ppme.pme_spread(Rx, Ry, Rzq, (Kx, Ky, Kz)))

    report("spread pallas", s_pallas)

    def ef(p, mode):
        os.environ["TMD_PME_GATHER"] = mode
        try:
            e, f = rec.energy_forces(p, boxj)
        finally:
            os.environ.pop("TMD_PME_GATHER", None)
        return e + jnp.sum(f)

    report("energy_forces pallas", lambda p: ef(p, "pallas"))
    report("energy_forces xla", lambda p: ef(p, "xla"))

    report("spread xla (_spread)",
           lambda p: jnp.sum(rec._spread(p, boxj, rec.charges)))


if __name__ == "__main__":
    main()

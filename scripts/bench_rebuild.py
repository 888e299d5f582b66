"""Microbench of the column-structure rebuild at production scale.

Times `build_columns` end-to-end on the real TPU at the 62.5k-atom
TIP4P geometry, then each sub-stage in isolation (sorts, slot scatter,
histogram/windows, attribute gathers) so the optimization target is
measured, not guessed (docs/PERF.md round-5: the rebuild was 43.1 ms
= ~1/3 of the flagship step amortized).

Usage: python scripts/bench_rebuild.py [--n 25] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--device", default=None)
    args = ap.parse_args()
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp

    from torchmd_tpu import columns as C

    # synthetic TIP4P-like geometry: n^3 waters x 4 sites, liquid density
    n = args.n
    SP = 3.104
    L = n * SP
    rs = np.random.RandomState(0)
    base = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3) * SP + 0.8
    offs = np.array([[0, 0, 0], [0.75, 0.5, 0], [-0.75, 0.5, 0],
                     [0, 0.15, 0]])
    pos = (base[:, None, :] + offs[None] + rs.randn(len(base), 1, 3) * 0.3
           ).reshape(-1, 3).astype(np.float32)
    N = len(pos)
    print(f"# {N} atoms, box {L:.1f}")

    from torchmd_tpu.potentials import FFParams

    q = np.zeros(N, np.float32)
    mat = np.zeros(N, np.int32)
    lj = np.ones((1, 2), np.float32)
    ffp = FFParams(charges=jnp.asarray(q), masses=None,
                   mapped_atom_types=jnp.asarray(mat),
                   lj_params=jnp.asarray(lj), bonds=None, angles=None,
                   dihedrals=None, impropers=None, nb14=None,
                   nb_mask=None)
    nexcl = 3
    excl = np.full((N, nexcl), N, np.float32)
    cfg = C.make_column_config((L, L, L), 8.5, skin=2.0, pos0=pos,
                               natoms=N, nexcl=nexcl, IBLK=48)
    print(f"# cfg ncols={cfg.ncols} C={cfg.C} CE={cfg.CE} W={cfg.W}")
    posj = jnp.asarray(pos)
    ex = jnp.asarray(excl)

    build = jax.jit(lambda p: C.build_columns(p, cfg, ffp, ex))
    ms = timeit(build, posj, reps=args.reps)
    print(json.dumps({"stage": "build_full", "ms": round(ms, 2)}))

    # --- sub-stages ---------------------------------------------------
    b = np.asarray(cfg.box, np.float32)
    rc = cfg.rc

    def keys(p):
        pw = p - b * jnp.floor(p / b)
        x, y, z = pw[:, 0], pw[:, 1], pw[:, 2]
        cx = jnp.clip((x / b[0] * cfg.ncols[0]).astype(jnp.int32), 0,
                      cfg.ncols[0] - 1)
        cy = jnp.clip((y / b[1] * cfg.ncols[1]).astype(jnp.int32), 0,
                      cfg.ncols[1] - 1)
        col = cx * cfg.ncols[1] + cy
        return col, z

    def s_lexsort_i(p):
        col, z = keys(p)
        return jnp.lexsort((z, col))

    def s_lexsort_j(p):
        col, z = keys(p)
        ghost_hi = z < rc
        ghost_lo = z > b[2] - rc
        colj = jnp.concatenate([col, jnp.where(ghost_hi, col, cfg.ncol),
                                jnp.where(ghost_lo, col, cfg.ncol)])
        zj = jnp.concatenate([z, z + b[2], z - b[2]])
        return jnp.lexsort((zj, colj))

    def s_argsort_fused_i(p):
        col, z = keys(p)
        span = b[2]
        zbin = jnp.clip((z / span * cfg.nbins).astype(jnp.int32), 0,
                        cfg.nbins - 1)
        return jnp.argsort(col * cfg.nbins + zbin)

    def s_argsort_fused_j(p):
        col, z = keys(p)
        ghost_hi = z < rc
        ghost_lo = z > b[2] - rc
        colj = jnp.concatenate([col, jnp.where(ghost_hi, col, cfg.ncol),
                                jnp.where(ghost_lo, col, cfg.ncol)])
        zj = jnp.concatenate([z, z + b[2], z - b[2]])
        span = b[2] + 2 * rc
        zbin = jnp.clip(((zj + rc) / span * cfg.nbins).astype(jnp.int32),
                        0, cfg.nbins - 1)
        return jnp.argsort(colj * cfg.nbins + zbin)

    def s_sortnum_i(p):
        col, z = keys(p)
        span = b[2]
        zbin = jnp.clip((z / span * cfg.nbins).astype(jnp.int32), 0,
                        cfg.nbins - 1)
        return jnp.sort(col * cfg.nbins + zbin)

    def s_attr_gathers(p):
        # mimic the two wide row gathers with a fixed slot table
        order = jnp.argsort(jnp.sum(p, axis=1))  # arbitrary permutation
        islot = order[jnp.arange(cfg.ncol * cfg.C) % N].reshape(
            cfg.ncol, cfg.C
        )
        attr = jnp.concatenate(
            [jnp.stack([p[:, 0], p[:, 1], p[:, 2],
                        jnp.arange(N, dtype=jnp.float32)], axis=1),
             ex], axis=1)
        ia = jnp.swapaxes(attr[islot], 1, 2)
        return ia

    for name, fn in [("lexsort_i", s_lexsort_i),
                     ("lexsort_j", s_lexsort_j),
                     ("argsort_fused_i", s_argsort_fused_i),
                     ("argsort_fused_j", s_argsort_fused_j),
                     ("sort_values_only_i", s_sortnum_i),
                     ("attr_gather_i_side", s_attr_gathers)]:
        ms = timeit(jax.jit(fn), posj, reps=args.reps)
        print(json.dumps({"stage": name, "ms": round(ms, 2)}))

    # trigger cost (per step, not per rebuild)
    st = build(posj)
    jax.block_until_ready(st)
    trig = jax.jit(lambda p: C.column_needs_rebuild(st, p, cfg))
    ms = timeit(trig, posj, reps=args.reps)
    print(json.dumps({"stage": "trigger_top2", "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()

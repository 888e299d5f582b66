"""Per-family anatomy of the Pallas fused bonded stage (thrombin).

The round-5 full-step ledger (scripts/bench_step_anatomy.py) showed the
bonded stage at 0.55 ms — LARGER than the 10.9 M-pair nonbonded kernel
(0.33 ms) and ~65% of the 0.855 ms step. This script slope-times each
term family's kernel alone, plus the fold/unfold framing, to find where
those microseconds of physics turn into half a millisecond.

Usage: python scripts/bench_bonded_anatomy.py [--tile 256] [--k1 4 --k2 20]
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

import numpy as np

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")


def slope_time(make, k1, k2, rounds=3):
    import jax

    def timed(K):
        fn = make(K)
        out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(
                jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=20)
    args = ap.parse_args()
    if args.tile:
        os.environ["TMD_PALLAS_BONDED_TILE"] = str(args.tile)

    import jax
    import jax.numpy as jnp

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.ops.pallas_bonded import (
        _run_family,
        build_pallas_bonded_plan,
        fold_positions,
        unfold_forces,
    )
    from torchmd_tpu.parameters import Parameters

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    forces = Forces(par, terms=TERMS, precision="single", cutoff=7.3,
                    rfa=True)
    plan = build_pallas_bonded_plan(forces.ffparams, forces.config)
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    n = mol.numAtoms
    box_in = jnp.ones((1, 3), jnp.float32)

    rows = 0
    for fam in plan.families:
        rows += fam.idx.shape[0] * fam.idx.shape[2]
    print(f"# natoms={n} nblk={plan.nblk} families="
          f"{[(f.kind, f.ntiles, f.idx.shape) for f in plan.families]}",
          flush=True)
    for fam in plan.families:
        kl = np.asarray(fam.klens)
        print(f"# {fam.name}: kmax={fam.kmax} "
              f"klen mean={kl.mean():.1f} max={kl.max()} "
              f"(window kernel iff kmax <= TMD_PALLAS_BONDED_WINDOW_KMAX)",
              flush=True)

    def scan_over(body_fn):
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
        return make

    def report(name, body_fn):
        per = slope_time(scan_over(body_fn), args.k1, args.k2)
        print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
              flush=True)

    report("fold_positions only",
           lambda p: jnp.sum(fold_positions(p, plan.nblk)))

    for fam in plan.families:
        def one(p, fam=fam):
            folded = fold_positions(p, plan.nblk)
            f_out, e_out = _run_family(fam, folded, box_in, plan.nblk,
                                       False, False)
            return jnp.sum(f_out) + e_out[0, 0]

        report(f"family {fam.kind}/{fam.name} "
               f"(ntiles={fam.ntiles}, arity={fam.arity})", one)

    def full(p):
        from torchmd_tpu.ops.pallas_bonded import (
            pallas_bonded_energy_forces,
        )
        pot, frc = pallas_bonded_energy_forces(plan, p, None)
        return jnp.sum(frc)

    report("full pallas_bonded_energy_forces", full)
    report("full bonded_ef_one (Forces)",
           lambda p: forces.bonded_ef_one(p, box_in[0])[1])


if __name__ == "__main__":
    main()

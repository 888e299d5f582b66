"""Slope-timed production pair kernel: triangular vs full-square.

Times `pallas_nonbonded_energy_forces` on the real thrombin system
(4,676 atoms, AMBER LJ+RFA, cutoff 7.3 A) with the same
dispatch-overhead-free methodology as bench_roofline.py: the kernel
runs inside a jitted lax.scan chained through its own energy output at
two lengths; per-invocation time is the slope. Also times the fused
bonded kernel stage and the complete integrator step for the published
step anatomy (docs/PERF.md).

Usage: python scripts/bench_pair_production.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
CUTOFF, RFA = 7.3, True


def slope_time(make, k1=8, k2=48, rounds=4):
    import jax

    def timed(K):
        fn = make(K)
        out = fn()
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
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
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.ops.pallas_nonbonded import (
        prepare_nb_data, pallas_nonbonded_energy_forces)

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    forces = Forces(par, terms=TERMS, precision="single",
                    cutoff=CUTOFF, rfa=RFA)
    cfg = forces.config
    data = prepare_nb_data(forces.ffparams)
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    results = {}
    f_ref = None
    for tri in ("1", "0"):
        os.environ["TMD_PALLAS_TRI"] = tri

        def make(K):
            @jax.jit
            def go():
                def body(carry, _):
                    p = pos0 + carry * jnp.float32(1e-37)
                    pot, frc = pallas_nonbonded_energy_forces(
                        data, cfg, p, None)
                    e = sum(pot.values())
                    return e, (e, frc)

                e0 = jnp.zeros((), jnp.float32)
                _, (es, fs) = jax.lax.scan(body, e0, None, length=K)
                return es[-1], fs[-1]

            return go

        per = slope_time(make)
        e, f = make(1)()
        e, f = float(e), np.asarray(f)
        if f_ref is None:
            f_ref = f
            ferr = 0.0
        else:
            ferr = float(np.max(np.abs(f - f_ref))) / float(
                np.max(np.abs(f_ref)))
        name = "triangular" if tri == "1" else "full-square"
        results[name] = per
        print(json.dumps({"kernel": name, "ms": round(per * 1e3, 3),
                          "energy": round(e, 2),
                          "f_rel_vs_other": round(ferr, 6)}),
              flush=True)
    os.environ["TMD_PALLAS_TRI"] = "1"

    # bonded stage (everything except the pair kernel) via ef_one minus
    # pair: time full ef_one with the same slope method
    def make_full(K):
        @jax.jit
        def go():
            def body(carry, _):
                p = pos0 + carry * jnp.float32(1e-37)
                pot, frc = forces.ef_one(p, None)
                e = sum(jax.tree_util.tree_leaves(pot))
                return e, (e, frc)

            e0 = jnp.zeros((), jnp.float32)
            _, (es, fs) = jax.lax.scan(body, e0, None, length=K)
            return es[-1], fs[-1]

        return go

    per_full = slope_time(make_full)
    print(json.dumps({"stage": "full ef_one (pair+bonded)",
                      "ms": round(per_full * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()

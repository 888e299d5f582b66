"""Slope-timed anatomy of the full thrombin MD step (docs/PERF.md).

Times the production headline configuration (bench.py: thrombin 4,676
atoms, full AMBER, cutoff 7.3 A + RFA, 4 fs, Langevin 300 K, f32) at the
STEP level, isolating the integrator-side costs that the pair/bonded
kernel rooflines (bench_roofline.py, bench_pair_production.py) cannot
see:

  step          full Langevin VV step (the bench configuration)
  step_nve      gamma=0, no thermostat -> the PRNG + noise-kick delta
  prng          jax.random.split + normal((N,3)) alone in a scan
  prng_rbg      the same draw with the TPU hardware RNG (rbg keys)

Methodology: every number is a slope over two jitted lax.scan lengths
(t(K2) - t(K1)) / (K2 - K1), cancelling the ~35 ms axon-tunnel
dispatch/fetch constant (see bench_roofline.py).

Usage: python scripts/bench_step_anatomy.py [--k1 100] [--k2 400]
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
CUTOFF, RFA, TIMESTEP, TEMP = 7.3, True, 4.0, 300.0


def build(gamma):
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    forces = Forces(par, terms=TERMS, precision="single", cutoff=CUTOFF,
                    rfa=RFA)
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, TEMP, 1, seed=1))
    return Integrator(system, forces, TIMESTEP, gamma=gamma, T=TEMP,
                      seed=1)


def time_integ(integ, k, rounds=3):
    integ.step(niter=k)  # compile + warm at this shape
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        integ.step(niter=k)
        best = min(best, time.perf_counter() - t0)
    return best


def slope_integ(integ, k1, k2):
    t1 = time_integ(integ, k1)
    t2 = time_integ(integ, k2)
    return (t2 - t1) / (k2 - k1)


def slope_prng(n, impl, k1, k2):
    import jax
    import jax.numpy as jnp

    if impl == "threefry":
        key0 = jax.random.PRNGKey(1)
    else:
        key0 = jax.random.key(1, impl=impl)

    def make(K):
        @jax.jit
        def go(key):
            def body(c, _):
                key, s = c
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, (n, 3), dtype=jnp.float32)
                return (key, s + noise[0, 0]), None

            (key, s), _ = jax.lax.scan(body, (key, jnp.float32(0)), None,
                                       length=K)
            return s

        return go

    out = {}
    for K in (k1, k2):
        f = make(K)
        float(f(key0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(key0))
            best = min(best, time.perf_counter() - t0)
        out[K] = best
    return (out[k2] - out[k1]) / (k2 - k1)


def slope_stage(fn, pos0, box0, k1, k2):
    """Slope-time a jitted scan of one force stage. Positions evolve by
    a tiny force-proportional drift each iteration so the chain stays
    data-dependent (XLA cannot hoist or CSE the evaluation)."""
    import jax
    import jax.numpy as jnp

    pos0 = jnp.asarray(pos0)
    box0 = jnp.asarray(box0)

    def make(K):
        @jax.jit
        def go(pos):
            def body(p, _):
                _pot, frc = fn(p, box0)
                return p + 1e-7 * frc, None

            p, _ = jax.lax.scan(body, pos, None, length=K)
            return p

        return go

    out = {}
    for K in (k1, k2):
        f = make(K)
        np.asarray(f(pos0)).sum()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(pos0)).sum()
            best = min(best, time.perf_counter() - t0)
        out[K] = best
    return (out[k2] - out[k1]) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=100)
    ap.add_argument("--k2", type=int, default=400)
    ap.add_argument("--stages", default=None,
                    help="comma list to restrict (step, nve, forces, nb, "
                         "bonded, prng)")
    args = ap.parse_args()
    want = set(args.stages.split(",")) if args.stages else None

    def on(name):
        return want is None or name in want

    # ---- force-stage ledger (the full-step roofline: VERDICT r4 item 3)
    if on("forces") or on("nb") or on("bonded"):
        integ = build(0.1)
        forces = integ.forces
        pos0 = np.asarray(integ.systems.pos)[0]
        box0 = np.asarray(integ.systems.box_diag)[0]
        for name, fn in (("forces total (nb+bonded+wrap)", forces.ef_one),
                         ("nonbonded stage (tri pair kernel)",
                          forces.nb_ef_one),
                         ("bonded stage (Pallas fused)",
                          forces.bonded_ef_one)):
            key = {"forces total (nb+bonded+wrap)": "forces",
                   "nonbonded stage (tri pair kernel)": "nb",
                   "bonded stage (Pallas fused)": "bonded"}[name]
            if not on(key):
                continue
            per = slope_stage(fn, pos0, box0, args.k1, args.k2)
            print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
                  flush=True)

    if not on("step"):
        return

    per_step = slope_integ(build(0.1), args.k1, args.k2)
    print(json.dumps({"stage": "step (Langevin)",
                      "ms": round(per_step * 1e3, 3),
                      "steps_per_s": round(1.0 / per_step, 1)}),
          flush=True)

    per_nve = slope_integ(build(0.0), args.k1, args.k2)
    print(json.dumps({"stage": "step (NVE, gamma=0)",
                      "ms": round(per_nve * 1e3, 3),
                      "langevin_delta_ms": round((per_step - per_nve) * 1e3,
                                                 3)}), flush=True)

    n = 4676
    for impl in ("threefry", "rbg"):
        try:
            per = slope_prng(n, impl, 200, 800)
        except Exception as e:  # rbg may be unsupported on a backend
            print(json.dumps({"stage": f"prng {impl}", "error": str(e)}),
                  flush=True)
            continue
        print(json.dumps({"stage": f"prng {impl} normal({n},3)",
                          "ms": round(per * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()

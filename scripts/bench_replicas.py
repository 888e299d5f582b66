"""Replica-scaling sweep on the thrombin benchmark (VERDICT round-3 item 6).

Measures aggregate replica-steps/s for R in {1, 2, 4, 8, 16} vmap'd
replicas of the thrombin-ligand system (same configuration as bench.py)
to resolve the round-3 PERF.md contradiction ("chip saturates at ~750
aggregate" vs "R=1 leaves ~30% idle" while R=1 alone measures ~750).

Prints one JSON line per R:
  {"replicas": R, "steps_per_s": per-chain, "aggregate": R*per-chain}

Usage: python scripts/bench_replicas.py [--rs 1,2,4,8,16] [--steps 100]
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

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
CUTOFF, RFA, TIMESTEP, TEMP, GAMMA = 7.3, True, 4.0, 300.0, 0.1


def run_one(R, niter, rounds):
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
    forces = Forces(par, terms=TERMS, precision="single",
                    cutoff=CUTOFF, rfa=RFA)
    system = System(mol.numAtoms, R, "single")
    system.set_positions(mol.coords)  # broadcast to all replicas
    system.set_velocities(maxwell_boltzmann(par.masses, TEMP, R, seed=1))
    integ = Integrator(system, forces, TIMESTEP, gamma=GAMMA, T=TEMP,
                       seed=1)
    integ.step(niter=niter)  # compile + warmup
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        integ.step(niter=niter)
        best = max(best, niter / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rs", default="1,2,4,8,16")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    for R in [int(r) for r in args.rs.split(",")]:
        sps = run_one(R, args.steps, args.rounds)
        print(json.dumps({"replicas": R,
                          "steps_per_s": round(sps, 1),
                          "aggregate_replica_steps_per_s":
                              round(sps * R, 1)}), flush=True)


if __name__ == "__main__":
    main()

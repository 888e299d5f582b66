"""GB/OBC implicit-solvent throughput on thrombin (VERDICT item 4).

Times the GBSA thrombin configuration (4,676 atoms, full AMBER +
OBC-II + ACE, 2 fs, Langevin 300 K, f32) on the real TPU twice:

  analytic  GBSA.energy_forces_fn — the multi-pass dE/dB formulation
            (O(N) cross-pass state, no reverse-mode residuals)
  ad        reverse-mode value_and_grad through the Born chain
            (the round-3 measured configuration, ~11.4 steps/s)

and asserts force parity between the two paths before timing.
Prints one JSON line per mode.

Usage: python scripts/bench_gb.py [--steps 50] [--modes analytic,ad]
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

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
CUTOFF, RFA, TIMESTEP, TEMP, GAMMA = 9.0, False, 2.0, 300.0, 0.1


def build(mode):
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.gb import make_gbsa
    from torchmd_tpu.external import JaxExternal

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    gb = make_gbsa(par, mol, cutoff=None)
    if mode == "analytic":
        ext = JaxExternal(gb.energy_fn,
                          energy_forces_fn=gb.energy_forces_fn)
    else:
        ext = JaxExternal(gb.energy_fn)
    forces = Forces(par, terms=TERMS, external=ext, precision="single",
                    cutoff=CUTOFF, rfa=RFA)
    return mol, par, forces


def parity_check():
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.gb import make_gbsa

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    gb = make_gbsa(par, mol, cutoff=None)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    e_a, f_a = jax.jit(gb.energy_forces_fn)(pos, None)
    e_g, g = jax.jit(jax.value_and_grad(lambda p: gb.energy_fn(p, None)))(
        pos)
    f_g = -g
    e_err = abs(float(e_a) - float(e_g)) / max(1.0, abs(float(e_g)))
    f_scale = float(jnp.max(jnp.abs(f_g)))
    f_err = float(jnp.max(jnp.abs(f_a - f_g))) / f_scale
    print(json.dumps({"parity": {"e_rel": e_err, "f_rel": f_err}}),
          flush=True)
    assert e_err < 1e-5, e_err
    assert f_err < 1e-3, f_err


def run_mode(mode, niter, rounds):
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol, par, forces = build(mode)
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, TEMP, 1, seed=1))
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--modes", default="analytic,ad")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    if not args.skip_parity:
        parity_check()
    for mode in args.modes.split(","):
        sps = run_mode(mode, args.steps, args.rounds)
        print(json.dumps({
            "mode": mode, "steps_per_s": round(sps, 2),
            "ns_per_day": round(sps * TIMESTEP * 1e-6 * 86400, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Quick kernel-path shootout on the headline thrombin system.

Times the integrator scan (steps/s) for each requested kernel path on the
current default device. Usage:
    python scripts/bench_kernels.py [kernel ...]   # default: auto verlet
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]


def run(kernel, niter=100, rounds=3):
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
    forces = Forces(par, terms=TERMS, precision="single", cutoff=7.3,
                    rfa=True, kernel=kernel)
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=1))
    integ = Integrator(system, forces, 4.0, gamma=0.1, T=300.0, seed=1)
    t0 = time.perf_counter()
    integ.step(niter=niter)  # compile + warmup
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        ek, ep, T = integ.step(niter=niter)
        dt = time.perf_counter() - t0
        best = max(best, niter / dt)
    extra = ""
    if getattr(integ, "_use_verlet", False):
        extra = f" cap={integ._cell_kernel.vcfg.capacity}"
    print(f"{kernel:8s}: {best:8.1f} steps/s  "
          f"(compile+warm {compile_s:.1f}s, Epot {ep[0]:.2f}{extra})",
          flush=True)
    return best


if __name__ == "__main__":
    kernels = sys.argv[1:] or ["auto", "verlet"]
    for k in kernels:
        run(k)

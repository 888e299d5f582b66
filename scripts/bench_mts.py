"""r-RESPA payoff at 24k atoms on the column kernel (VERDICT item 5).

Flexible SPC/Fw water (stiff intramolecular bonds/angles = the inner
RESPA stage), 8,000 molecules = 24,000 atoms at liquid density, cutoff
8.5 A + RFA, on the auto-selected large-N neighbor kernel. Compares
simulated time per wall-clock second at equal inner-step stability:

  mts=1  dt = dt_inner      (every force every 0.5 fs)
  mts=4  dt = 4 x dt_inner  (nonbonded impulse every 2 fs outer step)

and reports the ns/day gain plus NVE total-energy drift for both, so
the speedup is tied to a bounded-drift trajectory, not a blow-up.

Usage: python scripts/bench_mts.py [--n 20] [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

SPACING = 3.104  # A; 29.9 A^3/water = 0.997 g/cm^3

# SPC/Fw (Wu, Tepper & Voth 2006): flexible SPC reparameterization
SPCFW_TOP = """
[ defaults ]
  1      2         yes       0.5     0.8333

[ atomtypes ]
  OW   8     15.99940 -0.82   A     3.16557e-01  6.50629e-01
  HW   1     1.00800   0.41   A     0.0          0.0

[ moleculetype ]
  SOL  2

[ atoms ]
  1  OW   1     SOL     OW   1    -0.82  15.9994
  2  HW   1     SOL     HW1  1     0.41   1.008
  3  HW   1     SOL     HW2  1     0.41   1.008

[ bonds ]
  1 2 1 0.1012 443153.38
  1 3 1 0.1012 443153.38

[ angles ]
  2 1 3 1 113.24 317.5656

[ system ]
SPC/Fw water

[ molecules ]
SOL 2
"""


def build_box(n, cutoff):
    from test_gromacs import write

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters

    nw = n ** 3
    with tempfile.TemporaryDirectory() as td:
        top = write(os.path.join(td, "spcfw.top"),
                    SPCFW_TOP.replace("SOL 2", f"SOL {nw}"))
        mol = Molecule(top)
        ff = ForceField.create(mol, top)
    grid = np.stack(
        np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    rs = np.random.RandomState(0)
    w = np.array([
        [0.000, 0.000, 0.000],
        [1.012, 0.000, 0.000],
        [-0.399, 0.930, 0.000],
    ])
    pts = [w + g * SPACING + 0.8 + rs.randn(3) * 0.05 for g in grid]
    mol.coords = np.concatenate(pts).astype(np.float64)[:, :, None]
    L = n * SPACING
    mol.box = np.full((3, 1), L)
    terms = ["bonds", "angles", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="single")
    return mol, par, terms


def run_mode(mol, par, terms, mts, dt_outer, cutoff, niter, rounds,
             temp):
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    forces = Forces(par, terms=terms, precision="single", cutoff=cutoff,
                    rfa=True)
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    system.set_box(mol.box)
    system.set_velocities(
        maxwell_boltzmann(par.masses, temp, 1, seed=1))
    integ = Integrator(system, forces, dt_outer, gamma=None, T=None,
                       seed=1, mts=mts)
    ek0, ep0, _ = integ.step(niter=niter)  # compile + melt + warmup
    best = 0.0
    ek1 = ep1 = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        ek1, ep1, _ = integ.step(niter=niter)
        best = max(best, niter / (time.perf_counter() - t0))
    # drift across the timed window (NVE): kcal/mol per atom per ns
    e_start = float(ek0[0] + ep0[0])
    e_end = float(ek1[0] + ep1[0])
    span_ns = rounds * niter * dt_outer * 1e-6
    drift = (e_end - e_start) / mol.numAtoms / span_ns
    return best, drift


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20,
                    help="waters per edge (atoms = 3 n^3)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cutoff", type=float, default=8.5)
    ap.add_argument("--dt-inner", type=float, default=0.5)
    ap.add_argument("--mts", type=int, default=4)
    ap.add_argument("--temp", type=float, default=300.0)
    args = ap.parse_args()

    mol, par, terms = build_box(args.n, args.cutoff)
    natoms = mol.numAtoms
    out = {}
    for mts in (1, args.mts):
        dt_outer = args.dt_inner * mts
        sps, drift = run_mode(mol, par, terms, mts, dt_outer,
                              args.cutoff, args.steps, args.rounds,
                              args.temp)
        nsday = sps * dt_outer * 1e-6 * 86400
        out[mts] = nsday
        print(json.dumps({
            "mts": mts, "atoms": natoms, "dt_outer_fs": dt_outer,
            "steps_per_s": round(sps, 2), "ns_per_day": round(nsday, 3),
            "nve_drift_kcal_mol_atom_ns": round(drift, 4),
        }), flush=True)
    print(json.dumps({
        "ns_per_day_gain": round(out[args.mts] / out[1], 2)
    }), flush=True)


if __name__ == "__main__":
    main()

"""Production-scale TIP4P/2005 water box on the TPU fast path.

Builds an n^3-water TIP4P lattice at liquid density through the GROMACS
topology reader (vsites + SETTLE + PME above TMD_PME_N), and drives the
column-kernel MD scan end to end on the real TPU: NVT (NHC) and true
NPT (MTK barostat). This is the round-4 "run a real 50-100k-atom
solvated system on the large-N path" deliverable (VERDICT.md item 1);
correctness anchors are the downsampled f64 parity tests
tests/test_gromacs.py::test_tip4p_production_config_*.

Default: n=25 -> 15,625 waters = 62,500 atoms, box 77.6 A, cutoff
8.5 A, PME, 2 fs, SETTLE. Prints one JSON line per phase:
  {"phase": "nvt", "atoms": 62500, "steps_per_s": ..., "ns_per_day":
   ..., ...}

Usage:  python scripts/bench_waterbox.py [--n 25] [--steps 400]
        [--phases nvt,npt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

SPACING = 3.104  # A: 29.9 A^3/water = 0.997 g/cm^3


def build_box(n):
    from test_gromacs import TIP4P2005_TOP, tip4p_water, write

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters

    nw = n ** 3
    with tempfile.TemporaryDirectory() as td:
        top = write(os.path.join(td, "tip4p.top"),
                    TIP4P2005_TOP.replace("SOL 2", f"SOL {nw}"))
        mol = Molecule(top)
        ff = ForceField.create(mol, top)
    grid = np.stack(
        np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    rs = np.random.RandomState(0)
    pts = []
    for g in grid:
        # random orientation jitter via small rotations is overkill for a
        # throughput bench; jitter the origin so the lattice melts fast
        pts.append(tip4p_water(g * SPACING + 0.8 + rs.randn(3) * 0.05))
    mol.coords = np.concatenate(pts).astype(np.float64)[:, :, None]
    L = n * SPACING
    mol.box = np.full((3, 1), L)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="single")
    return mol, par, terms, L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25,
                    help="waters per box edge (atoms = 4 n^3)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--equil", type=int, default=0,
                    help="equilibration steps before timing (the "
                         "lattice-melt hot start is a rebuild-cadence "
                         "worst case; pass ~4000 for the 300 K "
                         "steady-state production number)")
    ap.add_argument("--cutoff", type=float, default=8.5)
    ap.add_argument("--timestep", type=float, default=2.0)
    ap.add_argument("--phases", default="nvt,npt",
                    help="comma list of nvt, npt, nve (nve reports "
                         "total-energy drift for r-RESPA validation)")
    ap.add_argument("--mts-recip", type=int, default=None,
                    help="three-tier r-RESPA: PME reciprocal impulse "
                         "every R outer steps (nvt/nve phases)")
    ap.add_argument("--replicas", type=int, default=1,
                    help="vmap'd replicas through the column kernel "
                         "(VERDICT round-4 item 6: ensemble scaling on "
                         "the large-N path)")
    ap.add_argument("--device", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax

    from torchmd_tpu.barostat import MTKBarostat
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    t0 = time.time()
    mol, par, terms, L = build_box(args.n)
    natoms = mol.numAtoms
    print(f"# built {natoms} atoms ({args.n}^3 waters), box {L:.1f} A "
          f"in {time.time() - t0:.1f}s", flush=True)

    R = int(args.replicas)
    recip = args.mts_recip
    # mts_recip demands niter % R_recip == 0 per chunk
    rr = int(recip) if recip else 1

    def rnd(k):
        return max(rr, (k // rr) * rr)

    for phase in args.phases.split(","):
        forces = Forces(par, terms=terms, precision="single",
                        cutoff=args.cutoff, elec="ewald")
        syst = System(natoms, R, "single")
        syst.set_positions(np.repeat(mol.coords, R, axis=2)
                           if R > 1 else mol.coords)
        syst.set_box(np.repeat(mol.box, R, axis=1)
                     if R > 1 else mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, R, seed=3)
        )
        kw = dict(constraints="settle", seed=3)
        if phase != "nve":
            kw.update(thermostat="nhc", T=300.0)
        if phase == "npt":
            kw["barostat"] = MTKBarostat(1.0, 300.0, tau_fs=2000.0)
        elif recip:
            kw["mts_recip"] = recip
        integ = Integrator(syst, forces, timestep=args.timestep, **kw)
        kern = getattr(integ, "_cell_kernel", None)
        kname = type(kern).__name__ if kern is not None else "dense"
        t0 = time.time()
        integ.step(niter=rnd(args.warmup))   # compile + warmup
        t_compile = time.time() - t0
        done_eq = 0
        while done_eq < args.equil:
            ek, ep, T = integ.step(
                niter=rnd(min(500, args.equil - done_eq)))
            done_eq += 500
            print(f"# equil {done_eq}/{args.equil}: "
                  f"T={float(np.asarray(T).reshape(-1)[0]):.1f}",
                  flush=True)
        ek, ep, T = integ.step(niter=rnd(10))  # settle caches
        e0 = float(np.asarray(ek).reshape(-1)[0]
                   + np.asarray(ep).reshape(-1)[0])
        t0 = time.time()
        done = 0
        while done < args.steps:
            chunk = rnd(min(100, args.steps - done))
            ek, ep, T = integ.step(niter=chunk)
            done += chunk
        dt_wall = time.time() - t0
        sps = done / dt_wall
        box_now = np.asarray(syst.box_diag)[0]
        out = {
            "phase": phase,
            "atoms": int(natoms),
            "kernel": kname,
            "cutoff": args.cutoff,
            "timestep_fs": args.timestep,
            "steps_per_s": round(sps, 2),
            "ns_per_day": round(sps * args.timestep * 86400 / 1e6, 2),
            "epot": float(np.asarray(ep).reshape(-1)[0]),
            "T": float(np.asarray(T).reshape(-1)[0]),
            "box_x": float(box_now[0]),
            "compile_s": round(t_compile, 1),
        }
        if recip and phase != "npt":
            out["mts_recip"] = int(recip)
        if R > 1:
            out["replicas"] = R
            out["aggregate_steps_per_s"] = round(sps * R, 2)
        if phase == "nve":
            e1 = float(np.asarray(ek).reshape(-1)[0]
                       + np.asarray(ep).reshape(-1)[0])
            sim_ns = done * args.timestep / 1e6
            out["drift_kcal_per_atom_ns"] = round(
                (e1 - e0) / natoms / sim_ns, 4)
        assert np.isfinite(out["epot"]), out
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

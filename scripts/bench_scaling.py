"""MD throughput across the bundled systems (argon -> thrombin), the
BASELINE.md axis. Prints one JSON line per system.

Usage: python scripts/bench_scaling.py [--niter 100]
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
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def bench_system(name, make, niter, rounds=3):
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    mol, forces, par, conf = make()
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    if conf.get("box") is not None:
        system.set_box(conf["box"])
    system.set_velocities(
        maxwell_boltzmann(par.masses, conf.get("T", 300.0), 1, seed=1)
    )
    integ = Integrator(
        system, forces, conf.get("timestep", 2.0),
        gamma=0.1, T=conf.get("T", 300.0), seed=1,
    )
    integ.step(niter=niter)  # compile at the timed shape
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        integ.step(niter=niter)
        best = max(best, niter / (time.perf_counter() - t0))
    import jax

    print(json.dumps({
        "system": name,
        "natoms": mol.numAtoms,
        "steps_per_sec": round(best, 2),
        "kernel": "pallas" if forces.use_pallas else forces.kernel,
        "device": jax.devices()[0].device_kind,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=100)
    args = ap.parse_args()

    from common import ALL_TERMS, load_system
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces

    def argon():
        mol = Molecule(os.path.join(REPO, "tests/systems/argon/argon_start.pdb"))
        ff = ForceField.create(
            mol, os.path.join(REPO, "tests/systems/argon/argon_forcefield.yaml")
        )
        par = Parameters(ff, mol, ["lj"], precision="single")
        forces = Forces(par, terms=["lj"], precision="single", cutoff=9.0)
        return mol, forces, par, {"box": np.array([77.395] * 3), "T": 120.0,
                                  "timestep": 5.0}

    def data_system(folder, **conf):
        def make():
            mol, ff, nbconf = load_system(os.path.join(REPO, "tests/data", folder))
            nbconf.update(conf.get("nb", {}))
            par = Parameters(ff, mol, ALL_TERMS, precision="single")
            forces = Forces(par, terms=ALL_TERMS, precision="single", **nbconf)
            box = mol.box[:, 0] if not np.all(mol.box == 0) else None
            return mol, forces, par, {"box": box, **conf.get("run", {})}
        return make

    bench_system("argon-lj (100)", argon, args.niter)
    bench_system(
        "waterbox (293)",
        data_system("waterbox", run={"timestep": 1.0}), args.niter,
    )
    bench_system(
        "alanine-dipeptide (688)",
        data_system("prod_alanine_dipeptide_amber",
                    nb=dict(cutoff=9.0, switch_dist=7.5, rfa=True),
                    run={"timestep": 1.0}),
        args.niter,
    )
    bench_system(
        "thrombin-ligand (4676)",
        data_system("thrombin-ligand-amber",
                    nb=dict(cutoff=7.3, rfa=True),
                    run={"timestep": 4.0}),
        args.niter,
    )

    def lj_gas(natoms=24_000, density=0.0213):
        """Synthetic argon-density LJ gas on the cell-list path (the
        large-N axis the reference's dead neighbourlist sketch aimed at)."""
        from torchmd_tpu.forcefields.ff_yaml import YamlForcefield

        L = float((natoms / density) ** (1.0 / 3.0))
        rs = np.random.RandomState(0)
        mol = Molecule()
        mol.numAtoms = natoms
        mol.atomtype = np.array(["AR"] * natoms, dtype=object)
        mol.charge = np.zeros(natoms)
        mol.masses = np.full(natoms, 39.948)
        mol.bonds = np.zeros((0, 2), dtype=np.int64)
        # jittered lattice start (avoids overlapping hot start)
        m = int(np.ceil(natoms ** (1 / 3)))
        grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                        axis=-1).reshape(-1, 3)[:natoms]
        coords = (grid + 0.5) * (L / m) + rs.randn(natoms, 3) * 0.1
        mol.coords = coords[:, :, None]
        mol.box = np.full((3, 1), L)
        ffd = {"atomtypes": ["AR"],
               "lj": {"AR": {"sigma": 3.405, "epsilon": 0.238}},
               "electrostatics": {"AR": {"charge": 0.0}},
               "masses": {"AR": 39.948}}
        ff = YamlForcefield(mol, ffd)
        par = Parameters(ff, mol, ["lj"], precision="single")
        forces = Forces(par, terms=["lj"], precision="single", cutoff=9.0)
        return mol, forces, par, {"box": np.full(3, L), "T": 120.0,
                                  "timestep": 5.0}

    bench_system("lj-gas cell path (24000)", lj_gas, args.niter)


if __name__ == "__main__":
    main()

"""Generate tests/goldens/oracle_goldens.json from the independent
numpy oracle engine (tests/oracle_engine.py): per-term energies for all
bundled data folders plus central-difference forces for a seeded sample
of atoms. Run from the repo root; deterministic, checked in as data
(the role OpenMM goldens play in the reference's harness)."""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from glob import glob

import numpy as np

from common import ALL_TERMS, load_system
from torchmd_tpu.parameters import Parameters
import oracle_engine as oe

N_FORCE_ATOMS = 6


def main():
    out = {}
    data = os.path.join(REPO, "tests", "data")
    for folder in sorted(glob(os.path.join(data, "*", ""))):
        name = os.path.basename(os.path.abspath(folder))
        mol, ff, nbconf = load_system(folder)
        par = Parameters(ff, mol, ALL_TERMS, precision="double")
        pos = mol.coords[:, :, 0]
        box = mol.box[:, 0] if not np.all(mol.box == 0) else None
        terms = oe.total_per_term(par, pos, box, **nbconf)
        rs = np.random.RandomState(1234)
        atoms = sorted(
            rs.choice(mol.numAtoms, size=min(N_FORCE_ATOMS, mol.numAtoms),
                      replace=False).tolist()
        )
        frc = oe.fd_forces(par, pos, box, atoms, **nbconf)
        out[name] = {
            "nbconf": {k: (None if v is None else float(v))
                       if not isinstance(v, bool) else v
                       for k, v in nbconf.items()},
            "natoms": int(mol.numAtoms),
            "terms": {k: float(v) for k, v in terms.items()},
            "fd_forces": frc,
        }
        print(f"{name}: total={terms['total']:.6f}", flush=True)
    dst = os.path.join(REPO, "tests", "goldens")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "oracle_goldens.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(dst, "oracle_goldens.json"))


def main_v2():
    """v2 families (round 4): Ewald direct-sum, GB/OBC loops, vsite FD
    spreading — written to oracle_goldens_v2.json."""
    import tempfile

    from common import (
        oracle_v2_ewald_case,
        oracle_v2_gb_case,
        oracle_v2_vsite_arrays,
        oracle_v2_vsite_case,
    )

    data = os.path.join(REPO, "tests", "data")
    out = {}

    for name in ("sodiumperiodic", "2watersperiodic",
                 "prod_alanine_dipeptide_amber"):
        mol, par, pos, box, alpha, kmax, pairs, cutoff = (
            oracle_v2_ewald_case(name, data)
        )
        e = oe.ewald_electrostatics(
            np.asarray(par.charges, np.float64), pos, box, alpha, kmax,
            excl_pairs=pairs,
        )
        out["ewald_" + name] = {
            "natoms": int(mol.numAtoms),
            "cutoff": cutoff,
            "alpha": alpha,
            "kmax": list(kmax),
            "electrostatics": float(e),
        }
        print(f"ewald_{name}: {e:.8f}", flush=True)

    gb, pos = oracle_v2_gb_case(data)
    q = np.asarray(gb.charges, np.float64)
    radii = np.asarray(gb.radii, np.float64)
    screen = np.asarray(gb.screen, np.float64)
    e = oe.gb_obc_energy(q, radii, screen, pos, sa=True)
    rs = np.random.RandomState(77)
    atoms = sorted(rs.choice(len(q), size=5, replace=False).tolist())
    frc = oe.gb_fd_forces(q, radii, screen, pos, atoms, sa=True)
    out["gb_ligand-amber"] = {
        "natoms": int(len(q)),
        "energy": float(e),
        "fd_forces": frc,
    }
    print(f"gb_ligand-amber: {e:.8f}", flush=True)

    with tempfile.TemporaryDirectory() as td:
        par, forces, pos, box = oracle_v2_vsite_case(td)
        q, sig, eps, keep, sites, hosts, vparams = (
            oracle_v2_vsite_arrays(par, forces)
        )
        pos_snap = oe.tip4p_reconstruct(pos, sites, hosts, vparams)
        e = oe.vsite_nonbonded_energy(
            q, sig, eps, pos_snap, box, keep, 3.0, switch_dist=2.5,
            rfa=True,
        )
        rs = np.random.RandomState(55)
        host_atoms = sorted(
            rs.choice([a for a in range(len(q)) if a not in sites],
                      size=5, replace=False).tolist()
        )
        frc = oe.vsite_fd_forces(
            q, sig, eps, pos, box, keep, 3.0, sites, hosts, vparams,
            host_atoms, switch_dist=2.5, rfa=True,
        )
        out["vsites_tip4p"] = {
            "natoms": int(len(q)),
            "energy": float(e),
            "fd_forces": frc,
        }
        print(f"vsites_tip4p: {e:.8f}", flush=True)

    dst = os.path.join(REPO, "tests", "goldens")
    with open(os.path.join(dst, "oracle_goldens_v2.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(dst, "oracle_goldens_v2.json"))


if __name__ == "__main__":
    if "--v2-only" not in sys.argv:
        main()
    main_v2()

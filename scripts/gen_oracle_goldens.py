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


if __name__ == "__main__":
    main()

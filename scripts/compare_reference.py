"""Per-term energy/force comparison harness.

The analog of the reference's scripts/run_omm_compare.py: evaluates one of
the bundled test systems with this framework and with every available
oracle (upstream TorchMD if importable, OpenMM if installed), printing
per-term energy differences and max-abs force differences.

Usage:
  python scripts/compare_reference.py tests/data/prod_alanine_dipeptide_amber
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# validation harness: f64 on CPU (like the reference's own test setup)
import jax

jax.config.update("jax_platforms", os.environ.get("TMD_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]


def evaluate_mine(folder):
    from common import load_system
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces

    mol, ff, nbconf = load_system(folder)
    par = Parameters(ff, mol, TERMS, precision="double")
    forces = Forces(par, terms=TERMS, precision="double", **nbconf)
    pos = mol.coords[:, :, 0][None]
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], mol.box[:, 0])
    ene = forces.compute(pos, box, returnDetails=True)[0]
    return mol, ff, nbconf, ene, np.asarray(forces.last_forces)[0]


def evaluate_reference(folder, mol, ff, nbconf):
    sys.path.insert(0, "/root/reference")
    import torch

    torch.set_default_dtype(torch.float64)
    from torchmd.parameters import Parameters as RefParameters
    from torchmd.forces import Forces as RefForces

    par = RefParameters(ff, mol, TERMS, precision=torch.double, device="cpu")
    forces = RefForces(par, terms=TERMS, cutoff=nbconf["cutoff"],
                       switch_dist=nbconf["switch_dist"], rfa=nbconf["rfa"])
    pos = torch.tensor(mol.coords[:, :, 0][None]).requires_grad_(True)
    box = torch.zeros(1, 3, 3, dtype=torch.double)
    for k in range(3):
        box[0, k, k] = float(mol.box[k, 0])
    frc = torch.zeros(1, mol.numAtoms, 3, dtype=torch.double)
    ene = forces.compute(pos, box, frc, returnDetails=True,
                         explicit_forces=False)[0]
    return {k: float(v) for k, v in ene.items()}, frc[0].detach().numpy()


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "prod_alanine_dipeptide_amber"
    )
    mol, ff, nbconf, mine, my_forces = evaluate_mine(folder)
    print(f"== {folder}  ({mol.numAtoms} atoms, nbconf={nbconf})")
    print(f"{'term':16s} {'torchmd-tpu':>16s}")
    for k, v in sorted(mine.items()):
        print(f"{k:16s} {v:16.6f}")
    print(f"{'TOTAL':16s} {sum(mine.values()):16.6f}")

    try:
        ref_ene, ref_forces = evaluate_reference(folder, mol, ff, nbconf)
        print("\nvs upstream TorchMD (torch CPU, f64):")
        for k in sorted(ref_ene):
            d = mine.get(k, 0.0) - ref_ene[k]
            print(f"{k:16s} diff {d: .3e}")
        print(f"force max|diff| {np.abs(my_forces - ref_forces).max():.3e}")
    except Exception as e:
        print(f"\n(reference unavailable: {type(e).__name__}: {e})")


if __name__ == "__main__":
    main()

"""Cross-engine parity: this framework vs the upstream TorchMD implementation.

For every bundled test system we build the topology and force field with OUR
readers, then evaluate per-term energies and forces twice:
  1. with our JAX engine (f64, CPU),
  2. with the reference torch engine, driven through its own Parameters
     assembly using the same Molecule/ForceField objects (the reference's
     getter API is duck-typed by ours).
This is the same oracle pattern as the reference's OpenMM comparison
(tests/test_torchmd.py:196-251), with upstream TorchMD as the second engine.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

FOLDERS = sorted(glob(os.path.join(DATA_DIR, "*", "")))
IDS = [os.path.basename(os.path.abspath(f)) for f in FOLDERS]

ETOL = 1e-7  # same engine-precision comparison, f64: much tighter than
FTOL = 1e-6  # the reference-vs-OpenMM tolerances (1e-4 .. 1e-1)


@pytest.mark.parametrize("folder", FOLDERS, ids=IDS)
def test_energy_force_parity(folder, refmod):
    import torch

    mol, ff, nbconf = load_system(folder)

    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces

    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)

    pos = mol.coords[:, :, 0][None]
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], mol.box[:, 0])

    mine = forces.compute(pos, box, returnDetails=True)[0]
    my_forces = np.asarray(forces.last_forces)[0]

    RefParameters = refmod["parameters"].Parameters
    RefForces = refmod["forces"].Forces
    rpar = RefParameters(ff, mol, ALL_TERMS, precision=torch.double, device="cpu")
    rforces = RefForces(
        rpar,
        terms=ALL_TERMS,
        cutoff=nbconf["cutoff"],
        switch_dist=nbconf["switch_dist"],
        rfa=nbconf["rfa"],
    )
    rpos = torch.tensor(pos, dtype=torch.double).requires_grad_(True)
    rbox = torch.tensor(box, dtype=torch.double)
    rfrc = torch.zeros(1, mol.numAtoms, 3, dtype=torch.double)
    # Use the reference's autograd force path (explicit_forces=False): it
    # differentiates the energy exactly, like ours. (The reference's
    # analytic path mis-scales the LJ switching-region force by 1/r,
    # forces.py:409-412, and force agreement is only printed, never
    # asserted, in its own OpenMM harness.)
    ref = rforces.compute(
        rpos, rbox, rfrc, returnDetails=True, explicit_forces=False
    )[0]
    ref = {k: float(v) for k, v in ref.items()}

    scale = max(1.0, max(abs(v) for v in ref.values()))
    for term, rv in ref.items():
        mv = mine.get(term, 0.0)
        assert abs(mv - rv) <= ETOL * scale, (
            f"{term}: mine={mv} ref={rv} (scale {scale})"
        )

    ref_forces = rfrc[0].numpy()
    fscale = max(1.0, np.abs(ref_forces).max())
    assert np.abs(my_forces - ref_forces).max() <= FTOL * fscale


def test_parameter_assembly_parity(refmod):
    """The assembled parameter tensors themselves must match the reference
    assembly (same dedup, ordering and values) on a torsion-rich system."""
    import torch

    folder = os.path.join(DATA_DIR, "benzamidine")
    mol, ff, _ = load_system(folder)

    from torchmd_tpu.parameters import Parameters

    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    rpar = refmod["parameters"].Parameters(
        ff, mol, ALL_TERMS, precision=torch.double, device="cpu"
    )

    pairs = [
        (par.bond_params, rpar.bond_params),
        (par.angle_params, rpar.angle_params),
        (par.dihedral_params, rpar.dihedral_params),
        (par.improper_params, rpar.improper_params),
        (par.nonbonded_14_params, rpar.nonbonded_14_params),
    ]
    for minep, refp in pairs:
        for key in ("idx", "map", "params"):
            np.testing.assert_allclose(
                np.asarray(minep[key], dtype=np.float64),
                refp[key].cpu().numpy().astype(np.float64),
                rtol=1e-12, atol=1e-12,
            )
    np.testing.assert_allclose(par.charges, rpar.charges.numpy(), atol=1e-12)
    ref_masses = rpar.masses.numpy().reshape(-1, 1)
    if np.any(ref_masses != 0):
        np.testing.assert_allclose(par.masses, ref_masses, atol=1e-12)
    else:
        # documented improvement: zero-mass topologies (this PSF) fall back
        # to force-field masses instead of breaking dynamics
        assert np.all(par.masses > 0)

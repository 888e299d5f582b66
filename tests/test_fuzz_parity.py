"""Randomized-topology parity fuzzing vs the upstream engine.

Random molecules (random bond graphs, angles/dihedrals/impropers, random
YAML force-field parameters, random charges) catch assembly/physics edge
cases the curated test systems miss. Both engines consume the identical
Molecule + YamlForcefield objects; energies/forces must agree in f64.
"""

from __future__ import annotations

import numpy as np
import pytest

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.forces import Forces

ALL_TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
             "electrostatics", "lj"]


def _random_molecule(seed, natoms=24, ntypes=4):
    rs = np.random.RandomState(seed)
    types = [f"T{i}" for i in range(ntypes)]
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(rs.choice(types, natoms), dtype=object)
    mol.charge = np.round(rs.randn(natoms) * 0.3, 3)
    mol.masses = np.round(rs.rand(natoms) * 20 + 5, 3)

    # random chain + a few extra branches: guarantees angles/dihedrals
    bonds = [[i, i + 1] for i in range(natoms - 1)]
    for _ in range(natoms // 4):
        a = rs.randint(0, natoms - 6)
        b = a + rs.randint(3, 6)
        if [a, b] not in bonds:
            bonds.append([a, b])
    mol.bonds = np.asarray(bonds)

    # angles/dihedrals from the chain (as a PSF would list them)
    angles = [[i, i + 1, i + 2] for i in range(natoms - 2)]
    dihedrals = [[i, i + 1, i + 2, i + 3] for i in range(natoms - 3)]
    mol.angles = np.asarray(angles)
    mol.dihedrals = np.asarray(dihedrals)
    # impropers: center must be bonded to the other three -> use chain
    # centers with a branch where available
    impropers = []
    for a, b in bonds[natoms - 1:]:
        c = a + 1  # chain neighbor of a
        if b < natoms - 1:
            impropers.append([a - 1, c, a, b] if a > 0 else [c, b, a, a + 2])
    mol.impropers = (
        np.asarray(impropers[:3]) if impropers else np.zeros((0, 4), np.int64)
    )

    # geometry: jittered helix, no overlapping atoms
    tt = np.arange(natoms) * 0.9
    pos = np.stack([
        2.5 * np.cos(tt), 2.5 * np.sin(tt), 0.8 * tt
    ], axis=1) + rs.randn(natoms, 3) * 0.15
    mol.coords = pos[:, :, None]

    # random force field over all type combinations
    def key(ts):
        return "(" + ", ".join(ts) + ")"

    ff = {"atomtypes": types, "bonds": {}, "angles": {}, "dihedrals": {},
          "impropers": {}, "lj": {}, "electrostatics": {}, "masses": {}}
    for t in types:
        ff["lj"][t] = {
            "sigma": round(2.5 + rs.rand(), 3),
            "epsilon": round(0.05 + 0.3 * rs.rand(), 4),
            "sigma14": round(2.3 + rs.rand(), 3),
            "epsilon14": round(0.04 + 0.2 * rs.rand(), 4),
        }
        ff["electrostatics"][t] = {"charge": 0.0}
        ff["masses"][t] = 12.0
    import itertools

    for pair in itertools.product(types, repeat=2):
        ff["bonds"][key(pair)] = {
            "k0": round(150 + 200 * rs.rand(), 2),
            "req": round(1.2 + 0.5 * rs.rand(), 3),
        }
    for trip in itertools.product(types, repeat=3):
        ff["angles"][key(trip)] = {
            "k0": round(30 + 50 * rs.rand(), 2),
            "theta0": round(95 + 30 * rs.rand(), 2),
        }
    for quad in itertools.product(types, repeat=4):
        nterms = rs.randint(1, 4)
        ff["dihedrals"][key(quad)] = {
            "terms": [
                {
                    "phi_k": round(0.2 + 2 * rs.rand(), 3),
                    "phase": float(rs.choice([0.0, 180.0])),
                    "per": int(rs.randint(1, 4)),
                }
                for _ in range(nterms)
            ],
            "scnb": 2.0,
            "scee": 1.2,
        }
        ff["impropers"][key(quad)] = {
            "phi_k": round(1 + 5 * rs.rand(), 3),
            "phase": 180.0,
            "per": 2,
        }
    return mol, ff


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_topology_parity(seed, refmod):
    import torch

    mol, ffdict = _random_molecule(seed)
    ff = YamlForcefield(mol, ffdict)

    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double")
    pos = mol.coords[:, :, 0][None]
    mine = forces.compute(pos, None, returnDetails=True)[0]
    my_f = np.asarray(forces.last_forces)[0]

    rpar = refmod["parameters"].Parameters(
        ff, mol, ALL_TERMS, precision=torch.double, device="cpu"
    )
    rforces = refmod["forces"].Forces(rpar, terms=ALL_TERMS)
    rpos = torch.tensor(pos, dtype=torch.double).requires_grad_(True)
    rbox = torch.zeros(1, 3, 3, dtype=torch.double)
    rfrc = torch.zeros(1, mol.numAtoms, 3, dtype=torch.double)
    ref = rforces.compute(rpos, rbox, rfrc, returnDetails=True,
                          explicit_forces=False)[0]

    scale = max(1.0, max(abs(float(v)) for v in ref.values()))
    for term, rv in ref.items():
        assert abs(mine.get(term, 0.0) - float(rv)) <= 1e-7 * scale, (
            seed, term, mine.get(term), float(rv)
        )
    fscale = max(1.0, np.abs(rfrc[0].numpy()).max())
    assert np.abs(my_f - rfrc[0].numpy()).max() <= 1e-6 * fscale


@pytest.mark.parametrize("seed", [0, 2])
def test_random_topology_parity_pbc(seed, refmod):
    """Same fuzz with a periodic box + cutoff + RFA + switching."""
    import torch

    mol, ffdict = _random_molecule(seed, natoms=20)
    ff = YamlForcefield(mol, ffdict)
    box = np.array([14.0, 15.0, 13.0])
    cutoff, switch = 6.0, 4.5

    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double",
                    cutoff=cutoff, switch_dist=switch, rfa=True)
    pos = mol.coords[:, :, 0][None]
    boxm = np.zeros((1, 3, 3))
    np.fill_diagonal(boxm[0], box)
    mine = forces.compute(pos, boxm, returnDetails=True)[0]
    my_f = np.asarray(forces.last_forces)[0]

    rpar = refmod["parameters"].Parameters(
        ff, mol, ALL_TERMS, precision=torch.double, device="cpu"
    )
    rforces = refmod["forces"].Forces(
        rpar, terms=ALL_TERMS, cutoff=cutoff, switch_dist=switch, rfa=True
    )
    rpos = torch.tensor(pos, dtype=torch.double).requires_grad_(True)
    rbox = torch.tensor(boxm, dtype=torch.double)
    rfrc = torch.zeros(1, mol.numAtoms, 3, dtype=torch.double)
    ref = rforces.compute(rpos, rbox, rfrc, returnDetails=True,
                          explicit_forces=False)[0]
    scale = max(1.0, max(abs(float(v)) for v in ref.values()))
    for term, rv in ref.items():
        assert abs(mine.get(term, 0.0) - float(rv)) <= 1e-7 * scale, (
            seed, term, mine.get(term), float(rv)
        )
    fscale = max(1.0, np.abs(rfrc[0].numpy()).max())
    assert np.abs(my_f - rfrc[0].numpy()).max() <= 1e-6 * fscale

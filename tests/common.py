"""Shared helpers for loading the bundled test systems."""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField

ALL_TERMS = [
    "bonds", "angles", "dihedrals", "impropers", "1-4", "electrostatics", "lj",
]


def load_system(folder: str):
    """Load topology+coords+box and build the force field for one
    tests/data/<name> folder, reproducing the file-priority and PBC logic of
    the reference harness (tests/test_torchmd.py:330-373)."""
    prmtop = glob(os.path.join(folder, "*.prmtop"))
    psf = glob(os.path.join(folder, "*.psf"))
    pdb = glob(os.path.join(folder, "*.pdb"))
    xtc = glob(os.path.join(folder, "*.xtc"))
    xsc = glob(os.path.join(folder, "*.xsc"))
    coor = glob(os.path.join(folder, "*.coor"))
    prm = glob(os.path.join(folder, "*.prm"))
    rtf = glob(os.path.join(folder, "*.rtf"))

    if psf:
        mol = Molecule(psf[0])
    elif prmtop:
        mol = Molecule(prmtop[0])
    else:
        raise RuntimeError(f"No topology in {folder}")

    if xtc:
        mol.read(sorted(xtc))
    elif coor:
        mol.read(coor[0])
    elif pdb:
        mol.read(pdb[0])
    if xsc:
        mol.read(xsc[0])

    if psf:
        ff = ForceField.create(mol, prm + rtf)
    else:
        ff = ForceField.create(mol, prmtop[0])

    testname = os.path.basename(os.path.abspath(folder))
    rfa = False
    cutoff = None
    switch_dist = None
    if not np.all(mol.box == 0):
        cutoff = float(np.min(mol.box)) / 2 - 0.01
        switch_dist = 6.0
        rfa = True
        if testname == "prod_alanine_dipeptide_amber":
            cutoff = 9.0
            switch_dist = 7.5

    if mol.nframes > 1:
        mol.dropFrames(keep=0)

    return mol, ff, dict(cutoff=cutoff, switch_dist=switch_dist, rfa=rfa)

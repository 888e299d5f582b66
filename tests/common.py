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


# ----------------------------------------------------------------------
# Oracle v2 case builders (shared by scripts/gen_oracle_goldens.py and
# tests/test_oracle.py so generator and assertion construct identical
# systems). Parameters/exclusions are assembly-layer DATA (documented
# shared scope, oracle_engine.py header); the evaluation math is what
# the v2 goldens independently pin.
# ----------------------------------------------------------------------

def oracle_v2_ewald_case(name, data_dir):
    """(par, pos, box, alpha, kmax, excl_pairs, cutoff) for an Ewald
    parity case on one bundled periodic data folder."""
    from torchmd_tpu.ewald import choose_parameters
    from torchmd_tpu.parameters import Parameters

    mol, ff, nbconf = load_system(os.path.join(data_dir, name))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    pos = mol.coords[:, :, 0]
    box = mol.box[:, 0].astype(float)
    cutoff = float(nbconf["cutoff"])
    ecfg = choose_parameters(box, cutoff)
    excl = np.asarray(par.get_exclusions(
        types=("bonds", "angles", "1-4"), fullarray=True
    ), bool)
    iu, ju = np.triu_indices(mol.numAtoms, k=1)
    pairs = [(int(i), int(j)) for i, j in zip(iu, ju) if excl[i, j]]
    return (mol, par, pos, box, float(ecfg.alpha),
            tuple(int(k) for k in ecfg.kmax), pairs, cutoff)


def oracle_v2_gb_case(data_dir):
    """(gb, pos): the GB/OBC term on the ligand-amber system (prmtop
    RADII/SCREEN when present, else element defaults)."""
    from torchmd_tpu.gb import make_gbsa
    from torchmd_tpu.parameters import Parameters

    mol, ff, _nb = load_system(os.path.join(data_dir, "ligand-amber"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    gb = make_gbsa(par, mol, sa=True)
    return gb, mol.coords[:, :, 0]


def oracle_v2_vsite_case(tmpdir):
    """(par, forces, pos, box): an 8-water TIP4P box (vsites + SETTLE
    topology) with RFA + switching at near-liquid spacing."""
    import pathlib

    from test_gromacs import TIP4P2005_TOP, tip4p_water, write

    from torchmd_tpu.forces import Forces
    from torchmd_tpu.parameters import Parameters

    top = write(pathlib.Path(tmpdir) / "tip4p8.top",
                TIP4P2005_TOP.replace("SOL 2", "SOL 8"))
    mol = Molecule(top)
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 3.1
                                       + 0.8))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 6.2)
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="double", cutoff=3.0, switch_dist=2.5,
                    rfa=True)
    pos = mol.coords[:, :, 0]
    box = np.full(3, 6.2)
    return par, forces, pos, box


def oracle_v2_vsite_arrays(par, forces):
    """Per-atom (q, sig, eps, keep_mask, sites, hosts, vparams) pulled
    from the assembled parameters (data, not math)."""
    ffp = forces.ffparams
    t = np.asarray(par.mapped_atom_types)
    prm = np.asarray(par.nonbonded_params["params"], np.float64)
    q = np.asarray(par.charges, np.float64)
    sig = prm[:, 0][t]
    eps = prm[:, 1][t]
    keep = np.asarray(ffp.nb_mask, bool)
    (g,) = par.vsites
    assert tuple(g.kind) == (3, 1)
    sites = np.asarray(g.sites).tolist()
    hosts = [tuple(h[:3]) for h in np.asarray(g.hosts)]
    vparams = [tuple(p[:2]) for p in np.asarray(g.params)]
    return q, sig, eps, keep, sites, hosts, vparams

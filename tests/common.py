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


# ----------------------------------------------------------------------
# Oracle v3 case builders (polarizable stack; shared by the generator
# and tests/test_oracle.py). Engine-side objects and the RAW arrays the
# independent numpy oracle consumes are built from the same inputs.
# ----------------------------------------------------------------------

def oracle_v3_amoeba_case():
    """AMOEBA water03 dimer near the hydrogen-bonded minimum: permanent
    multipoles (bisector O + z-then-x H frames, dipoles + traceless
    quadrupoles) and Thole mutual polarization. Returns
    (elec, pos (6,3) np, raw dict for the oracle)."""
    import jax.numpy as jnp
    from test_amoeba import WATER03_PRM, WATER_DIMER_XYZ, _ffp

    from torchmd_tpu.amoeba import (
        make_amoeba_electrostatics, parse_tinker_prm, read_tinker_xyz,
    )

    prm = parse_tinker_prm(WATER03_PRM)
    coords, types, bonds, _box = read_tinker_xyz(WATER_DIMER_XYZ)
    N = len(types)
    mask = np.ones((N, N), bool) & ~np.eye(N, dtype=bool)
    for m in (0, 3):
        for a in (m, m + 1, m + 2):
            for b in (m, m + 1, m + 2):
                mask[a, b] = False
    ffp = _ffp(N, nb_mask=jnp.asarray(mask))
    elec, charges = make_amoeba_electrostatics(ffp, types, bonds, prm)
    spec = elec.multipoles.spec
    ps = elec.polarization.pspec
    raw = {
        "charges": np.asarray(charges, np.float64),
        "sites": np.asarray(spec.sites, int),
        "mu_local": np.asarray(spec.mu_local, np.float64),
        "frame_kind": np.asarray(spec.frame_kind, int),
        "z_atom": np.asarray(spec.z_atom, int),
        "x_atom": np.asarray(spec.x_atom, int),
        "quad_local": np.asarray(spec.quad_local, np.float64),
        "nb_mask": mask,
        "pol_sites": np.asarray(ps.sites, int),
        "alpha": np.asarray(ps.alpha, np.float64),
        "thole": np.asarray(ps.thole, np.float64),
        "perm_mask": np.asarray(ps.perm_mask, bool),
    }
    return elec, np.asarray(coords, np.float64), raw


def oracle_v3_drude_case():
    """Three-atom synthetic Drude case: two polarizable atoms (one
    bonded-excluded pair, so the Thole screened term is active) + one
    fixed charge; zero-epsilon LJ so electrostatics+springs+Thole is the
    whole energy. Returns (ffp_ext, spec, cfg, pos (3,3), pos_ext_fixed
    (5,3), raw dict)."""
    import jax.numpy as jnp
    from test_drude import CFG, _bare_ffparams

    from torchmd_tpu.drude import init_drude_positions, make_drude_ffparams

    charges = np.array([0.35, -0.55, 0.20])
    alpha = np.array([1.1, 0.8, 0.0])
    k_drude, thole = 500.0, 2.6
    mask = ~np.eye(3, dtype=bool)
    mask[0, 1] = mask[1, 0] = False      # bonded-excluded -> Thole pair
    pos = np.array([[0.0, 0.0, 0.0],
                    [1.8, 0.3, -0.2],
                    [0.4, 2.2, 1.1]])
    ffp = _bare_ffparams(charges.tolist(), mask=mask)
    ffp_ext, spec = make_drude_ffparams(
        ffp, alpha.tolist(), k_drude=k_drude, thole=thole
    )
    p0 = np.asarray(init_drude_positions(jnp.asarray(pos), spec))
    # deterministic off-minimum Drude displacements for the fixed-config
    # energy parity check
    rs = np.random.RandomState(42)
    p_fixed = p0.copy()
    p_fixed[3:] += 0.03 * rs.randn(2, 3)
    raw = {"charges": charges, "alpha": alpha, "nb_mask": mask,
           "k_drude": k_drude, "thole": thole}
    return ffp_ext, spec, CFG, pos, p_fixed, raw


def oracle_v3_cmap_case():
    """Two smooth deterministic 24x24 maps + an 8-atom chain carrying
    two (phi, psi) cross-terms with shared atoms (the CHARMM backbone
    pattern). Returns (grids, idx, types, pos)."""
    n = 24
    rs = np.random.RandomState(7)
    ang = -np.pi + np.arange(n) * (2.0 * np.pi / n)
    P, S = np.meshgrid(ang, ang, indexing="ij")
    grids = []
    for _ in range(2):
        g = np.zeros((n, n))
        for kp in range(1, 4):
            for ks in range(1, 4):
                g += rs.randn() * np.cos(kp * P + rs.uniform(0, 2 * np.pi))
                g += rs.randn() * np.sin(ks * S + rs.uniform(0, 2 * np.pi))
                g += 0.5 * rs.randn() * np.cos(
                    kp * P + ks * S + rs.uniform(0, 2 * np.pi)
                )
        grids.append(g)
    idx = np.array([
        [0, 1, 2, 3, 1, 2, 3, 4],
        [2, 3, 4, 5, 3, 4, 5, 6],
    ], np.int32)
    types = np.array([0, 1], np.int32)
    rs2 = np.random.RandomState(11)
    t = np.arange(8, dtype=np.float64)
    pos = np.stack([
        1.4 * t,
        1.1 * np.sin(1.3 * t + 0.4),
        0.9 * np.cos(0.9 * t - 0.2),
    ], axis=1) + 0.15 * rs2.randn(8, 3)
    return grids, idx, types, pos

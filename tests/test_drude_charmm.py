"""CHARMM Drude-2013 file ingestion: RTF ALPHA/THOLE attributes,
LONEPAIR virtual sites, and the published SWM4-NDP water model as the
golden anchor (Lamoureux, Harder, Vorobyov, Roux & MacKerell,
Chem. Phys. Lett. 418, 245 (2006))."""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmd_tpu.forcefields.ff_charmm import CharmmParameterSet
from torchmd_tpu.drude import (
    LP_BISECTOR,
    charmm_drude_tables,
    constrain_lonepairs,
    lonepair_positions,
    make_lonepair_spec,
)
from torchmd_tpu.io import Molecule

# The published SWM4-NDP definition (toppar_drude convention): O carries
# the Drude oscillator (ALPHA -0.97825, negative-Drude convention),
# the M charge site sits 0.24034 A from O along the HOH bisector.
SWM4_RTF = """* SWM4-NDP polarizable water
*
MASS 1 ODW 15.99940 O
MASS 2 HDW 1.00800 H
MASS 3 LPD 0.00000

RESI SWM4 0.000
GROUP
ATOM OH2  ODW   0.00000 ALPHA -0.97825 THOLE 1.3
ATOM OM   LPD  -1.11466
ATOM H1   HDW   0.55733
ATOM H2   HDW   0.55733
BOND OH2 H1 OH2 H2 OH2 OM
LONEPAIR bisector OM OH2 H1 H2 distance 0.24034 angle 0.0 dihe 0.0

END
"""

DEBYE = 4.80320425


def _swm4_prm(tmp_path):
    p = os.path.join(str(tmp_path), "swm4.str")
    with open(p, "w") as fh:
        fh.write(SWM4_RTF)
    return CharmmParameterSet(p)


def _swm4_mol(nres=1, shift=20.0):
    mol = Molecule()
    n = 4 * nres
    mol.numAtoms = n
    mol.name = np.array(["OH2", "OM", "H1", "H2"] * nres, dtype=object)
    mol.resname = np.array(["SWM4"] * n, dtype=object)
    mol.resid = np.repeat(np.arange(nres), 4)
    r, th = 0.9572, np.deg2rad(104.52)
    base = np.array([
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],          # OM: placeholder, reconstructed
        [r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
        [-r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
    ])
    coords = np.concatenate(
        [base + [0.0, 0.0, shift * k] for k in range(nres)]
    )
    mol.coords = coords[:, :, None]
    return mol


def test_rtf_alpha_thole_and_lonepair_records(tmp_path):
    prm = _swm4_prm(tmp_path)
    rec = prm.rtf_atoms[("SWM4", "OH2")]
    assert rec["alpha"] == pytest.approx(0.97825)
    assert rec["thole"] == pytest.approx(1.3)
    assert rec["charge"] == pytest.approx(0.0)
    assert prm.rtf_atoms[("SWM4", "H1")]["alpha"] == 0.0
    lp = prm.rtf_lonepairs["SWM4"][0]
    assert lp["kind"].startswith("bisec")
    assert lp["site"] == "OM" and lp["hosts"] == ["OH2", "H1", "H2"]
    assert lp["distance"] == pytest.approx(0.24034)


def test_swm4_tables_and_lonepair_geometry(tmp_path):
    prm = _swm4_prm(tmp_path)
    mol = _swm4_mol()
    alpha, thole, charges, lps = charmm_drude_tables(prm, mol)
    np.testing.assert_allclose(alpha, [0.97825, 0.0, 0.0, 0.0])
    assert thole[0] == pytest.approx(1.3)
    assert charges.sum() == pytest.approx(0.0, abs=1e-12)
    spec = make_lonepair_spec(lps)
    assert int(spec.kind[0]) == LP_BISECTOR

    pos = jnp.asarray(mol.coords[:, :, 0])
    lp_pos = np.asarray(lonepair_positions(spec, pos))
    # the M site sits 0.24034 A from O along the HOH bisector (+z here)
    np.testing.assert_allclose(lp_pos[0], [0.0, 0.0, 0.24034],
                               atol=1e-12)


def test_swm4_gas_dipole_matches_published(tmp_path):
    """SWM4-NDP's fixed charges + M site reproduce the model's stated
    gas-phase dipole of 1.85 D (fit to experiment in the paper)."""
    prm = _swm4_prm(tmp_path)
    mol = _swm4_mol()
    alpha, thole, charges, lps = charmm_drude_tables(prm, mol)
    spec = make_lonepair_spec(lps)
    pos = jnp.asarray(mol.coords[:, :, 0])
    pos_c = np.asarray(
        constrain_lonepairs(spec, [l["site"] for l in lps], pos)
    )
    mu = (charges[:, None] * pos_c).sum(0)
    assert np.linalg.norm(mu) * DEBYE == pytest.approx(1.85, abs=0.01)


def test_lonepair_forces_transfer_to_hosts(tmp_path):
    """Energies evaluated on constrained positions are pure functions of
    the hosts: AD forces match finite differences THROUGH the site
    reconstruction (no direct force on the site's own row)."""
    prm = _swm4_prm(tmp_path)
    mol = _swm4_mol(nres=2, shift=4.0)   # two waters, M sites interact
    alpha, thole, charges, lps = charmm_drude_tables(prm, mol)
    spec = make_lonepair_spec(lps)
    sites = jnp.asarray([l["site"] for l in lps], jnp.int32)
    q = jnp.asarray(charges)

    def energy(p):
        pc = constrain_lonepairs(spec, sites, p)
        dv = pc[None, :, :] - pc[:, None, :]
        d2 = jnp.sum(dv * dv, axis=-1)
        n = pc.shape[0]
        inter = (jnp.arange(n)[:, None] // 4) != (jnp.arange(n)[None, :]
                                                  // 4)
        mask = inter & (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
        d2 = jnp.where(mask, d2, 1.0)
        e = 332.0636 * q[:, None] * q[None, :] * d2 ** -0.5
        return jnp.sum(jnp.where(mask, e, 0.0))

    pos = jnp.asarray(mol.coords[:, :, 0])
    g = jax.grad(energy)(pos)
    # the site row's own gradient must be zero (it is not a DOF)
    np.testing.assert_allclose(np.asarray(g)[[1, 5]], 0.0, atol=1e-12)
    h = 1e-6
    pos_np = np.asarray(pos)
    for a, d in [(0, 2), (2, 0), (4, 2), (6, 1)]:
        pp = pos_np.copy()
        pp[a, d] += h
        pm = pos_np.copy()
        pm[a, d] -= h
        fd = (energy(jnp.asarray(pp)) - energy(jnp.asarray(pm))) / (2 * h)
        assert float(g[a, d]) == pytest.approx(float(fd), abs=1e-7)


def test_swm4_drude_scf_polarizability(tmp_path):
    """The Drude oscillator built from the parsed alpha reproduces the
    molecular polarizability: a distant point charge induces
    mu_ind = alpha * E at the oxygen (within the field-gradient error)."""
    from torchmd_tpu.potentials import ELEC_FACTOR, FFParams
    from torchmd_tpu.drude import (
        init_drude_positions,
        make_drude_ffparams,
        scf_drude,
    )
    from torchmd_tpu.potentials import ForceTermConfig

    prm = _swm4_prm(tmp_path)
    mol = _swm4_mol()
    alpha, thole, charges, lps = charmm_drude_tables(prm, mol)

    # oxygen + a probe charge far away on z; the Drude relaxes to the
    # induced dipole (other SWM4 sites carry no polarizability and are
    # given zero charge here to isolate the induction response)
    n = 2
    q_probe = 1.0
    rprobe = 25.0
    ffp = FFParams(
        charges=jnp.asarray([0.0, q_probe]),
        masses=jnp.asarray([[15.999], [22.99]]),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.zeros((1, 2)),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None,
        nb_mask=jnp.ones((n, n), bool) & ~jnp.eye(n, dtype=bool),
    )
    ffp_ext, spec = make_drude_ffparams(ffp, [alpha[0], 0.0])
    cfg = ForceTermConfig(terms=("bonds", "electrostatics"))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, rprobe]])
    pos_ext = init_drude_positions(pos, spec)
    relaxed = scf_drude(ffp_ext, spec, cfg, pos_ext, None)
    d = np.asarray(relaxed[2] - relaxed[0])       # Drude displacement
    mu_ind = float(np.asarray(spec.q_drude)[0]) * d[2]
    e_field = q_probe / rprobe ** 2               # e/A^2 (Gaussian)
    assert mu_ind == pytest.approx(-alpha[0] * e_field, rel=2e-2)


NBTHOLE_PRM = """* ion-water pair-specific Thole (toppar_drude convention)
*
MASS 1 SOD 22.98977
MASS 2 ODW 15.99940

NBTHOLE
SOD    ODW    1.83

END
"""


def test_nbthole_parsing_and_pair_resolution(tmp_path):
    p = os.path.join(str(tmp_path), "nbthole.str")
    with open(p, "w") as fh:
        fh.write(NBTHOLE_PRM)
    prm = CharmmParameterSet(p)
    assert prm.nbthole_types[("SOD", "ODW")] == pytest.approx(1.83)
    assert prm.nbthole_types[("ODW", "SOD")] == pytest.approx(1.83)

    from torchmd_tpu.drude import charmm_nbthole_pairs

    mol = Molecule()
    mol.numAtoms = 3
    mol.atomtype = np.array(["SOD", "ODW", "ODW"], dtype=object)
    mol.name = np.array(["SOD", "OH2", "OH2"], dtype=object)
    mol.resname = np.array(["SOD", "SWM4", "SWM4"], dtype=object)
    pairs = charmm_nbthole_pairs(prm, mol)
    got = {(int(i), int(j)): a for i, j, a in pairs}
    assert got == {(0, 1): pytest.approx(1.83),
                   (0, 2): pytest.approx(1.83)}


def test_nbthole_energy_and_forces():
    """nbthole correction: matches the closed form -(1+u/2)e^-u qq/r over
    the oscillators' four charge pairs, folds into drude_energy, and is
    skipped for bonded-excluded pairs (those carry the standard Thole)."""
    from torchmd_tpu.potentials import (
        ELEC_FACTOR,
        FFParams,
        ForceTermConfig,
    )
    from torchmd_tpu.drude import (
        drude_energy,
        init_drude_positions,
        make_drude_ffparams,
        nbthole_energy,
    )

    n = 2
    alpha = [1.2, 0.8]
    a_pair = 1.83
    ffp = FFParams(
        charges=jnp.asarray([0.0, 0.0]),
        masses=jnp.asarray([[22.99], [15.999]]),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.zeros((1, 2)),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None,
        nb_mask=jnp.ones((n, n), bool) & ~jnp.eye(n, dtype=bool),
    )
    ffp_ext, spec = make_drude_ffparams(
        ffp, alpha, nbthole_pairs=[(0, 1, a_pair)]
    )
    assert spec.nbthole_i is not None
    u_scale = a_pair / (alpha[0] * alpha[1]) ** (1.0 / 6.0)
    assert float(spec.nbthole_coeff[0]) == pytest.approx(u_scale)

    pos = jnp.asarray([[0.0, 0.0, 0.0], [3.1, 0.4, -0.2]])
    pos_ext = np.array(init_drude_positions(pos, spec))
    rs = np.random.RandomState(5)
    pos_ext[2:] += rs.randn(2, 3) * 0.05          # displace the Drudes
    pos_ext = jnp.asarray(pos_ext)

    # manual closed form
    qd = np.asarray(spec.q_drude)
    rows = {"c0": 0, "c1": 1, "d0": 2, "d1": 3}
    combos = [("d0", "d1", qd[0] * qd[1]), ("d0", "c1", -qd[0] * qd[1]),
              ("c0", "d1", -qd[0] * qd[1]), ("c0", "c1", qd[0] * qd[1])]
    e_ref = 0.0
    P = np.asarray(pos_ext)
    for a, b, qq in combos:
        r = np.linalg.norm(P[rows[a]] - P[rows[b]])
        u = u_scale * r
        e_ref += -(1.0 + 0.5 * u) * np.exp(-u) * ELEC_FACTOR * qq / r
    assert float(nbthole_energy(spec, pos_ext, None)) == pytest.approx(
        e_ref, rel=1e-10
    )

    # folds into drude_energy
    cfg = ForceTermConfig(terms=("bonds", "electrostatics"))
    e_with = float(drude_energy(ffp_ext, spec, cfg, pos_ext, None))
    spec_no = spec._replace(nbthole_i=None, nbthole_j=None,
                            nbthole_coeff=None)
    e_without = float(drude_energy(ffp_ext, spec_no, cfg, pos_ext, None))
    assert e_with - e_without == pytest.approx(e_ref, rel=1e-9)

    # AD forces match finite differences through the correction
    g = jax.grad(lambda p: drude_energy(ffp_ext, spec, cfg, p, None))(
        pos_ext
    )
    h = 1e-5
    for a, d in [(0, 0), (2, 2), (3, 1)]:
        pp = np.asarray(pos_ext).copy(); pp[a, d] += h
        pm = np.asarray(pos_ext).copy(); pm[a, d] -= h
        fd = (drude_energy(ffp_ext, spec, cfg, jnp.asarray(pp), None)
              - drude_energy(ffp_ext, spec, cfg, jnp.asarray(pm), None)
              ) / (2 * h)
        assert float(g[a, d]) == pytest.approx(float(fd), rel=2e-5,
                                               abs=1e-7)

    # bonded-excluded pairs are skipped (standard Thole covers them)
    ffp_x = ffp._replace(
        nb_mask=jnp.zeros((n, n), bool),
        bonds=None,
    )
    ffp_ext2, spec2 = make_drude_ffparams(
        ffp_x, alpha, nbthole_pairs=[(0, 1, a_pair)]
    )
    assert spec2.nbthole_i is None
    assert spec2.thole_i is not None


def test_swm4_periodic_box_ewald_dipole_enhancement(tmp_path):
    """End-to-end periodic polarizable water from the .str file: a
    2x2x2 SWM4-NDP lattice under full Ewald (make_drude_ewald over the
    extended topology), M sites reconstructed, Drudes SCF-relaxed. The
    signature physics: the condensed-phase molecular dipole exceeds the
    1.85 D gas value (mutual induction in a cubic lattice of parallel
    dipoles adds the positive Lorentz field 4pi/3 P), which is the
    mechanism behind SWM4's published liquid dipole of ~2.46 D."""
    from torchmd_tpu.potentials import FFParams, ForceTermConfig
    from torchmd_tpu.drude import (
        drude_energy,
        init_drude_positions,
        make_drude_ewald,
        make_drude_ffparams,
        scf_drude,
    )

    prm = _swm4_prm(tmp_path)
    nres, L, a = 8, 8.0, 4.0
    mol = _swm4_mol(nres=nres)
    # rebuild coords as a 2x2x2 lattice (the fixture stacks along z)
    g = np.arange(2) * a + 1.0
    offsets = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    base = mol.coords[:4, :, 0]
    mol.coords = np.concatenate(
        [base + off for off in offsets]
    )[:, :, None]

    alpha, thole, charges, lps = charmm_drude_tables(prm, mol)
    spec_lp = make_lonepair_spec(lps)
    n = 4 * nres
    intra = np.zeros((n, n), bool)
    for m in range(nres):
        intra[4 * m:4 * m + 4, 4 * m:4 * m + 4] = True
    ffp = FFParams(
        charges=jnp.asarray(charges),
        masses=jnp.asarray(
            np.tile([15.999, 1e-9, 1.008, 1.008], nres).reshape(-1, 1)
        ),
        mapped_atom_types=jnp.zeros(n, jnp.int32),
        lj_params=jnp.zeros((1, 2)),
        bonds=None, angles=None, dihedrals=None, impropers=None,
        nb14=None, nb_mask=jnp.asarray(~intra),
    )
    # the M site is massless but only the O rows are polarizable, so the
    # Drude construction never touches its mass
    ffp_ext, spec = make_drude_ffparams(
        ffp, alpha, thole_atom=np.where(alpha > 0, thole, np.nan)
    )
    pos = jnp.asarray(mol.coords[:, :, 0])
    pos = constrain_lonepairs(spec_lp, [1 + 4 * m for m in range(nres)],
                              pos)
    p0 = init_drude_positions(pos, spec)

    box = np.asarray([L] * 3)
    cut = 3.5
    recip, aew = make_drude_ewald(ffp_ext, box, cut, tol=1e-6)
    cfg = ForceTermConfig(terms=("electrostatics", "bonds"),
                          cutoff=cut, ewald_alpha=aew)
    relaxed = scf_drude(ffp_ext, spec, cfg, p0, jnp.asarray(box),
                        recip=recip)
    e = float(drude_energy(ffp_ext, spec, cfg, relaxed,
                           jnp.asarray(box), recip=recip))
    assert np.isfinite(e)

    # per-molecule dipole: 4 sites + the molecule's Drude row
    q_ext = np.asarray(ffp_ext.charges)
    r = np.asarray(relaxed)
    mus = []
    for m in range(nres):
        rows = list(range(4 * m, 4 * m + 4)) + [n + m]
        org = r[4 * m]
        mu = sum(q_ext[i] * (r[i] - org) for i in rows)
        mus.append(np.linalg.norm(mu) * DEBYE)
    mus = np.asarray(mus)
    assert np.all(mus > 1.86)            # enhanced beyond gas phase
    assert np.all(mus < 3.2)             # and physically bounded
    np.testing.assert_allclose(mus, mus[0], rtol=1e-6)  # lattice symmetry

"""Halo-exchange slab MD (parallel/halo.py): rank-count invariance,
dense-path energy parity, migration across slab faces and the
surface-vs-volume comm accounting. Runs on the virtual 8-device CPU
mesh from conftest."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.forces import Forces
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.parallel.halo import HaloMD, make_halo_spec
from torchmd_tpu.potentials import nonbonded_energy_forces


def _gas(natoms=2000, L=90.0, charges=True, seed=0):
    rs = np.random.RandomState(seed)
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(["AR"] * natoms, dtype=object)
    mol.charge = rs.randn(natoms) * 0.03 if charges else np.zeros(natoms)
    mol.masses = np.full(natoms, 39.948)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    m = int(np.ceil(natoms ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:natoms]
    mol.coords = ((grid + 0.5) * (L / m)
                  + rs.randn(natoms, 3) * 0.3)[:, :, None]
    mol.box = np.full((3, 1), L)
    ffd = {"atomtypes": ["AR"],
           "lj": {"AR": {"sigma": 3.405, "epsilon": 0.238}},
           "electrostatics": {"AR": {"charge": 0.0}},
           "masses": {"AR": 39.948}}
    ff = YamlForcefield(mol, ffd)
    terms = ["lj", "electrostatics"] if charges else ["lj"]
    par = Parameters(ff, mol, terms, precision="single")
    if charges:
        par.charges = mol.charge.copy()
    forces = Forces(par, terms=terms, precision="single", cutoff=9.0,
                    rfa=charges)
    return mol, par, forces, L


def _mesh(r):
    return Mesh(np.array(jax.devices()[:r]), ("sp",))


def test_halo_spec_validation():
    spec = make_halo_spec([90.0] * 3, 9.0, 8, 2000)
    assert spec.slab_w >= spec.band_w
    assert spec.comm_bytes_per_step() > 0
    with pytest.raises(ValueError, match="too many ranks"):
        make_halo_spec([40.0] * 3, 9.0, 8, 2000)


def test_halo_energy_matches_dense():
    """Step with zero velocities: positions stay put, so the reported
    potential must equal the dense path's nonbonded energy."""
    mol, par, forces, L = _gas()
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot_d)))

    h = HaloMD(forces.ffparams, forces.config, _mesh(8), np.asarray([L] * 3),
               timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=1e-5)
    # velocities only pick up the trailing half-kick from fresh forces
    assert 0.0 <= ekin < 1e-4


def test_halo_rank_count_invariance_nve():
    """The same NVE trajectory must come out of 1, 2 and 8 slabs
    (migration, ghost wrap shifts and the symmetric evaluation all
    cancel across rank counts)."""
    mol, par, forces, L = _gas(seed=3)
    from torchmd_tpu.integrator import maxwell_boltzmann

    vel0 = np.asarray(maxwell_boltzmann(par.masses, 120.0, 1, seed=2))[0]
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    results = {}
    for r in (1, 2, 8):
        h = HaloMD(forces.ffparams, forces.config, _mesh(r),
                   np.asarray([L] * 3), timestep=5.0)
        h.init(pos0, jnp.asarray(vel0, jnp.float32))
        es = []
        for _ in range(3):
            ekin, epot, T = h.step(niter=8)
            es.append(epot)
        pos, vel = h.gather()
        results[r] = (np.asarray(es), pos, vel)

    e1, p1, v1 = results[1]
    for r in (2, 8):
        er, pr, vr = results[r]
        np.testing.assert_allclose(er, e1, rtol=5e-5)
        np.testing.assert_allclose(pr, p1, atol=2e-3)
        np.testing.assert_allclose(vr, v1, atol=2e-3)


def test_halo_migration_conserves_atoms():
    """A hot run that triggers rebuilds/migrations must keep every atom
    owned by exactly one rank."""
    mol, par, forces, L = _gas(seed=4)
    from torchmd_tpu.integrator import maxwell_boltzmann

    vel0 = np.asarray(maxwell_boltzmann(par.masses, 300.0, 1, seed=5))[0]
    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), timestep=5.0, T=120.0, gamma=0.5)
    h.init(jnp.asarray(mol.coords[:, :, 0], jnp.float32),
           jnp.asarray(vel0, jnp.float32))
    for _ in range(3):
        ekin, epot, T = h.step(niter=10)
        assert np.isfinite(epot) and np.isfinite(ekin)
    t = np.asarray(h._tables).reshape(-1, h._tables.shape[-1])
    ids = t[:, 0].astype(int)
    real = np.sort(ids[ids < mol.numAtoms])
    assert np.array_equal(real, np.arange(mol.numAtoms))
    # the thermostat held the temperature in a sane band
    assert 40.0 < T < 400.0


def test_halo_comm_scales_with_surface():
    """Per-step halo bytes scale with the slab FACE (the ghost band =
    band_w x Ly x Lz), independent of the slab depth: doubling the box
    along the slab axis (and N with it, constant density) leaves halo
    bytes unchanged while the all_gather's O(N) bytes double. At large
    enough slab depth the halo undercuts the all_gather."""
    spec = make_halo_spec([260.0, 90.0, 90.0], 9.0, 8, 50_000)
    allgather = 50_000 * 3 * 4       # every rank receives ~all positions
    assert spec.comm_bytes_per_step() < allgather

    spec2 = make_halo_spec([520.0, 90.0, 90.0], 9.0, 8, 100_000)
    # same face, same band occupancy -> same halo bytes (within the
    # sqrt-fluctuation slack term)
    ratio = spec2.comm_bytes_per_step() / spec.comm_bytes_per_step()
    assert ratio < 1.05
    assert 100_000 * 3 * 4 == 2 * allgather   # all_gather doubles


def _chain_gas(nchains=60, L=90.0, seed=7):
    """Periodic gas of 4-atom butane-like chains: bonds + angles +
    dihedrals + 1-4 + LJ + charges — the full bonded stack on a box
    large enough for 8 slabs at cutoff 9."""
    rs = np.random.RandomState(seed)
    n = 4 * nchains
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["CT", "CM", "CM", "CT"] * nchains,
                            dtype=object)
    mol.charge = np.tile([0.08, -0.08, -0.08, 0.08], nchains)
    mol.masses = np.full(n, 14.0)
    mol.bonds = np.concatenate([
        np.array([[0, 1], [1, 2], [2, 3]]) + 4 * i for i in range(nchains)
    ])
    mol.angles = np.concatenate([
        np.array([[0, 1, 2], [1, 2, 3]]) + 4 * i for i in range(nchains)
    ])
    mol.dihedrals = np.concatenate([
        np.array([[0, 1, 2, 3]]) + 4 * i for i in range(nchains)
    ])
    # gauche-ish chain geometry on a jittered grid
    base = np.array([
        [0.0, 0.0, 0.0],
        [1.53, 0.0, 0.0],
        [2.05, 1.44, 0.0],
        [3.58, 1.44, 0.4],
    ])
    m = int(np.ceil(nchains ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:nchains]
    coords = np.concatenate([
        base + (g + 0.5) * (L / m) + rs.randn(3) * 0.4 for g in grid
    ])
    mol.coords = coords[:, :, None]
    mol.box = np.full((3, 1), L)
    ffd = {
        "atomtypes": ["CT", "CM"],
        "bonds": {
            "(CT, CM)": {"k0": 310.0, "req": 1.526},
            "(CM, CM)": {"k0": 310.0, "req": 1.526},
        },
        "angles": {
            "(CT, CM, CM)": {"k0": 40.0, "theta0": 109.5},
            "(CM, CM, CT)": {"k0": 40.0, "theta0": 109.5},
        },
        "dihedrals": {
            "(CT, CM, CM, CT)": {
                "terms": [{"phi_k": 1.4, "phase": 0.0, "per": 3}],
                "scnb": 2.0, "scee": 1.2,
            },
        },
        "lj": {
            "CT": {"sigma": 3.4, "epsilon": 0.109,
                   "sigma14": 3.4, "epsilon14": 0.0545},
            "CM": {"sigma": 3.4, "epsilon": 0.109,
                   "sigma14": 3.4, "epsilon14": 0.0545},
        },
        "electrostatics": {"CT": {"charge": 0.08},
                           "CM": {"charge": -0.08}},
        "masses": {"CT": 14.0, "CM": 14.0},
    }
    ff = YamlForcefield(mol, ffd)
    terms = ["bonds", "angles", "dihedrals", "1-4", "lj",
             "electrostatics"]
    par = Parameters(ff, mol, terms, precision="single")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=terms, precision="single", cutoff=9.0,
                    rfa=True)
    return mol, par, forces, L


def test_halo_bonded_energy_matches_dense():
    """Zero-velocity step on the chain gas: halo epot must equal the
    dense path's TOTAL energy (bonded + 1-4 + nonbonded)."""
    from torchmd_tpu.potentials import compute_potentials

    mol, par, forces, L = _chain_gas()
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot = compute_potentials(forces.ffparams, pos, box, forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot)))

    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), excl_table=excl, timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=2e-5)


def test_halo_bonded_rank_invariance_nve():
    """The same chain-gas NVE trajectory out of 1, 2 and 8 slabs: the
    ownership-weighted bonded energies and visibility-gated forces must
    cancel across rank counts (including migrations)."""
    from torchmd_tpu.integrator import maxwell_boltzmann

    mol, par, forces, L = _chain_gas(seed=9)
    vel0 = np.asarray(maxwell_boltzmann(par.masses, 150.0, 1, seed=2))[0]
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    results = {}
    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    for r in (1, 2, 8):
        h = HaloMD(forces.ffparams, forces.config, _mesh(r),
                   np.asarray([L] * 3), excl_table=excl,
                   timestep=2.0)
        h.init(pos0, jnp.asarray(vel0, jnp.float32))
        es = []
        for _ in range(3):
            ekin, epot, T = h.step(niter=8)
            es.append(epot)
        pos, vel = h.gather()
        results[r] = (np.asarray(es), pos, vel)

    e1, p1, v1 = results[1]
    for r in (2, 8):
        er, pr, vr = results[r]
        np.testing.assert_allclose(er, e1, rtol=5e-5)
        np.testing.assert_allclose(pr, p1, atol=2e-3)
        np.testing.assert_allclose(vr, v1, atol=2e-3)


def _with_cmap(forces, nchains):
    """Inject one synthetic smooth 24x24 CMAP map over each chain's
    dihedral, used as both phi and psi (an 8-atom cross-term per chain).
    Returns (ffp2, cfg2) for the dense evaluator and HaloMD."""
    from torchmd_tpu.cmap import CMapTable, build_cmap_coeff_table

    n = 24
    ang = -np.pi + np.arange(n) * (2.0 * np.pi / n)
    P, S = np.meshgrid(ang, ang, indexing="ij")
    grid = (0.8 * np.cos(P + 0.3) + 0.5 * np.sin(2 * S - 0.7)
            + 0.3 * np.cos(P + S))
    idx = np.concatenate([
        np.array([[0, 1, 2, 3, 0, 1, 2, 3]]) + 4 * i
        for i in range(nchains)
    ])
    cm = CMapTable(
        idx=jnp.asarray(idx, jnp.int32),
        type=jnp.zeros(nchains, jnp.int32),
        coeffs=jnp.asarray(build_cmap_coeff_table([grid]), jnp.float32),
    )
    ffp2 = forces.ffparams._replace(cmap=cm)
    cfg2 = forces.config._replace(terms=tuple(forces.config.terms)
                                  + ("cmap",))
    return ffp2, cfg2


def test_halo_cmap_energy_matches_dense():
    """CMAP cross-terms on the halo path: zero-velocity step matches the
    dense path's TOTAL energy including the cmap term."""
    from torchmd_tpu.potentials import compute_potentials

    mol, par, forces, L = _chain_gas()
    ffp2, cfg2 = _with_cmap(forces, 60)
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot = compute_potentials(ffp2, pos, box, cfg2)
    assert float(pot["cmap"]) != 0.0
    e_dense = float(sum(jax.tree_util.tree_leaves(pot)))

    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    h = HaloMD(ffp2, cfg2, _mesh(8), np.asarray([L] * 3),
               excl_table=excl, timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=2e-5)


def test_halo_cmap_rank_invariance_nve():
    """Chain-gas NVE with the synthetic CMAP active: 1-slab and 8-slab
    trajectories must agree (ownership weights sum to 1, visibility
    gates complete every owned row's force)."""
    from torchmd_tpu.integrator import maxwell_boltzmann
    from torchmd_tpu.neighbors import build_exclusion_table

    mol, par, forces, L = _chain_gas(seed=11)
    ffp2, cfg2 = _with_cmap(forces, 60)
    vel0 = np.asarray(maxwell_boltzmann(par.masses, 150.0, 1, seed=4))[0]
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    excl = build_exclusion_table(par, mol.numAtoms, 0)

    results = {}
    for r in (1, 8):
        h = HaloMD(ffp2, cfg2, _mesh(r), np.asarray([L] * 3),
                   excl_table=excl, timestep=2.0)
        h.init(pos0, jnp.asarray(vel0, jnp.float32))
        es = []
        for _ in range(3):
            ekin, epot, T = h.step(niter=8)
            es.append(epot)
        pos, vel = h.gather()
        results[r] = (np.asarray(es), pos, vel)

    e1, p1, v1 = results[1]
    e8, p8, v8 = results[8]
    np.testing.assert_allclose(e8, e1, rtol=5e-5)
    np.testing.assert_allclose(p8, p1, atol=2e-3)
    np.testing.assert_allclose(v8, v1, atol=2e-3)


def _tile_x(mol, k):
    """Supercell: replicate a periodic system k times along x."""
    n = mol.numAtoms
    out = Molecule()
    out.numAtoms = n * k
    Lx = float(mol.box[0, 0])
    coords = []
    for i in range(k):
        c = mol.coords[:, :, 0].copy()
        c[:, 0] += i * Lx
        coords.append(c)
    out.coords = np.concatenate(coords)[:, :, None]
    out.box = mol.box.copy()
    out.box[0, 0] = Lx * k
    for attr in ("atomtype", "charge", "masses", "element"):
        v = getattr(mol, attr, None)
        if v is not None and np.size(v):
            setattr(out, attr, np.concatenate([v] * k))
    for attr in ("bonds", "angles", "dihedrals", "impropers"):
        v = getattr(mol, attr, None)
        if v is None or not np.size(v):
            setattr(out, attr, v)
        else:
            setattr(
                out, attr,
                np.concatenate([np.asarray(v) + i * n for i in range(k)]),
            )
    return out


def test_halo_alanine_8mesh_matches_dense():
    """A real biomolecule (alanine dipeptide in water, AMBER FF) runs
    HaloMD on the 8-mesh: a 4x supercell along x hosts 8 slabs at
    cutoff 6. Zero-velocity energy parity vs the dense path, plus
    2-vs-8-rank NVE trajectory invariance."""
    import os

    from common import load_system
    from conftest import DATA_DIR
    from torchmd_tpu.integrator import maxwell_boltzmann
    from torchmd_tpu.potentials import compute_potentials

    mol0, ff, _nb = load_system(
        os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")
    )
    mol = _tile_x(mol0, 4)
    terms = ["bonds", "angles", "dihedrals", "impropers", "1-4", "lj",
             "electrostatics"]
    par = Parameters(ff, mol, terms, precision="single")
    forces = Forces(par, terms=terms, precision="single", cutoff=6.0,
                    rfa=True)
    box = np.asarray([mol.box[0, 0], mol.box[1, 0], mol.box[2, 0]])
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    pot = compute_potentials(forces.ffparams, pos,
                             jnp.asarray(box, jnp.float32),
                             forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot)))

    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    h = HaloMD(forces.ffparams, forces.config, _mesh(8), box,
               excl_table=excl, timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    _, epot, _ = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=5e-5)

    # short NVE: 2 slabs vs 8 slabs give the same trajectory
    vel0 = np.asarray(maxwell_boltzmann(par.masses, 300.0, 1, seed=4))[0]
    out = {}
    for r in (2, 8):
        h = HaloMD(forces.ffparams, forces.config, _mesh(r), box,
                   excl_table=excl, timestep=1.0)
        h.init(pos, jnp.asarray(vel0, jnp.float32))
        es = []
        for _ in range(2):
            _, epot, _ = h.step(niter=5)
            es.append(epot)
        p, v = h.gather()
        out[r] = (np.asarray(es), p, v)
    e2, p2, v2 = out[2]
    e8, p8, v8 = out[8]
    np.testing.assert_allclose(e8, e2, rtol=5e-5)
    np.testing.assert_allclose(p8, p2, atol=2e-3)
    np.testing.assert_allclose(v8, v2, atol=2e-3)


def test_halo_bonded_reach_guard():
    """A bonded pair stretched across the box must trip the init
    guard (its partners would leave the ghost band)."""
    mol, par, forces, L = _chain_gas(nchains=30)
    pos = mol.coords[:, :, 0].copy()
    pos[1] = pos[0] + np.array([30.0, 0.0, 0.0])  # stretch one bond
    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), excl_table=excl,
               timestep=1.0)
    with pytest.raises(ValueError, match="bonded term extent|exclusion"):
        h.init(jnp.asarray(pos, jnp.float32),
               jnp.zeros((mol.numAtoms, 3), jnp.float32))


def test_halo_exclusions_respected():
    """Excluded pairs must drop from the halo evaluation exactly as the
    dense mask drops them (fabricated bond between nearby atoms)."""
    mol, par, forces, L = _gas(natoms=1000, seed=6)
    pos = np.asarray(mol.coords[:, :, 0], np.float32)
    pos[1] = pos[0] + [3.0, 0.0, 0.0]
    mol.bonds = np.array([[0, 1]])
    ff = YamlForcefield(mol, {
        "atomtypes": ["AR"],
        "lj": {"AR": {"sigma": 3.405, "epsilon": 0.238}},
        "electrostatics": {"AR": {"charge": 0.0}},
        "bonds": {"(AR, AR)": {"k0": 10.0, "req": 3.0}},
        "masses": {"AR": 39.948},
    })
    par = Parameters(ff, mol, ["lj", "electrostatics", "bonds"],
                     precision="single")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="single", cutoff=9.0, rfa=True)
    from torchmd_tpu.neighbors import build_exclusion_table

    excl = build_exclusion_table(par, mol.numAtoms, 0)
    posj = jnp.asarray(pos)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot_d, _ = nonbonded_energy_forces(forces.ffparams, posj, box,
                                       forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot_d)))
    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), excl_table=excl, timestep=1.0)
    h.init(posj, jnp.zeros_like(posj))
    _, epot, _ = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=1e-5)


def test_halo_nbfix_matches_dense():
    """NBFIX (ntypes, ntypes) A/B tables on the halo path: atom types
    travel with the migrating rows and per-pair A/B come from one-hot
    matmuls; the energy must match the dense NBFIX evaluation (this
    raised NotImplementedError before round 3)."""
    rs = np.random.RandomState(4)
    natoms, L = 1000, 96.0
    mol = Molecule()
    mol.numAtoms = natoms
    mol.atomtype = np.array(["AR", "XE"] * (natoms // 2), dtype=object)
    mol.charge = np.zeros(natoms)
    mol.masses = np.where(np.arange(natoms) % 2 == 0, 39.948, 131.29)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    m = int(np.ceil(natoms ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:natoms]
    mol.coords = ((grid + 0.5) * (L / m)
                  + rs.randn(natoms, 3) * 0.3)[:, :, None]
    mol.box = np.full((3, 1), L)
    ff = YamlForcefield(mol, {
        "atomtypes": ["AR", "XE"],
        "lj": {"AR": {"sigma": 3.405, "epsilon": 0.238},
               "XE": {"sigma": 3.96, "epsilon": 0.43}},
        "electrostatics": {"AR": {"charge": 0.0}, "XE": {"charge": 0.0}},
        "masses": {"AR": 39.948, "XE": 131.29},
    })
    par = Parameters(ff, mol, ["lj"], precision="single")
    # pair-specific AR-XE override, strong enough to matter
    uq = sorted(set(np.asarray(mol.atomtype)))
    par.nbfix = np.asarray([[uq.index("AR"), uq.index("XE"),
                             -0.9, 4.4]])
    forces = Forces(par, terms=["lj"], precision="single", cutoff=9.0,
                    nbfix=True)
    assert forces.ffparams.lj_ab is not None

    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot_d)))

    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=1e-5)
    # the override actually changes the answer vs plain LB mixing
    f_lb = Forces(par, terms=["lj"], precision="single", cutoff=9.0,
                  nbfix=False)
    pot_lb, _ = nonbonded_energy_forces(f_lb.ffparams, pos, box,
                                        f_lb.config)
    assert abs(e_dense - float(sum(jax.tree_util.tree_leaves(pot_lb))
                               )) > 1e-2


def test_halo_ewald_matches_dense():
    """Distributed classic Ewald on the halo path: partial structure
    factors psum over the slab axis (comm O(n_k), independent of N);
    the total energy must match the dense erfc real-space + EwaldRecip
    evaluation, and the NVE trajectory must be rank-count invariant
    (this raised NotImplementedError before round 3)."""
    mol, par, forces_plain, L = _gas(natoms=1500, seed=8)
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="single", cutoff=9.0, elec="ewald")
    forces.ensure_ewald(np.asarray([L] * 3))
    assert forces.config.ewald_alpha is not None

    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot_d))) \
        + float(forces._ewald.energy(pos, box))

    h = HaloMD(forces.ffparams, forces.config, _mesh(8),
               np.asarray([L] * 3), timestep=1.0)
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=2e-5)

    # rank-count invariance with reciprocal forces in the dynamics
    from torchmd_tpu.integrator import maxwell_boltzmann

    vel0 = np.asarray(maxwell_boltzmann(par.masses, 120.0, 1, seed=4))[0]
    results = {}
    for r in (1, 8):
        h = HaloMD(forces.ffparams, forces.config, _mesh(r),
                   np.asarray([L] * 3), timestep=5.0)
        h.init(pos, jnp.asarray(vel0, jnp.float32))
        es = [h.step(niter=4)[1] for _ in range(2)]
        p, v = h.gather()
        results[r] = (np.asarray(es), p, v)
    e1, p1, v1 = results[1]
    e8, p8, v8 = results[8]
    # f32: the complex structure-factor psum reassociates across rank
    # counts, so the chaotic trajectories decorrelate faster than the
    # pure pair path; bound the 8-step drift rather than demand bitness
    np.testing.assert_allclose(e8, e1, rtol=2e-3)
    np.testing.assert_allclose(p8, p1, atol=5e-3)

# ----------------------------------------------------------------------
# SETTLE + virtual sites on halo (round 5): molecule-atomic ownership
# ----------------------------------------------------------------------

def _tip4p_gas(tmp_path, nside=5, L=80.0):
    """nside^3 rigid TIP4P/2005 waters on a dilute grid (box L): small
    enough for the dense single-chip oracle, box wide enough for 8
    slabs at cutoff 5 + skin 2 + the vsite/SETTLE group widening."""
    import sys
    sys.path.insert(0, "tests")
    from test_gromacs import TIP4P2005_TOP, tip4p_water, write

    from torchmd_tpu.forcefields import ForceField

    nw = nside ** 3
    top = write(tmp_path / "tip4p.top",
                TIP4P2005_TOP.replace("SOL 2", f"SOL {nw}"))
    mol = Molecule(top)
    ff = ForceField.create(mol, top)
    rs = np.random.RandomState(11)
    grid = np.stack(
        np.meshgrid(*[np.arange(nside)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3) * (L / nside) + 2.0
    pts = [tip4p_water(g + rs.randn(3) * 0.4) for g in grid]
    mol.coords = np.concatenate(pts).astype(np.float64)[:, :, None]
    mol.box = np.full((3, 1), L)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="single")
    forces = Forces(par, terms=terms, precision="single", cutoff=5.0,
                    rfa=True)
    return mol, par, forces


def _tip4p_halo(forces, par, mol, r, L, timestep=2.0):
    from torchmd_tpu.constraints import build_constraint_spec
    from torchmd_tpu.neighbors import build_exclusion_table

    cs = build_constraint_spec(par, np.asarray(par.masses), mode="settle")
    excl = build_exclusion_table(par, mol.numAtoms, 0)
    return HaloMD(forces.ffparams, forces.config, _mesh(r),
                  np.asarray([L] * 3), excl_table=excl,
                  timestep=timestep, constraints=cs, vsites=par.vsites)


def test_halo_tip4p_settle_vsites_matches_dense_integrator(tmp_path):
    """The flagship composition (rigid TIP4P water: SETTLE + M-site
    vsites + LJ + electrostatics) steps HaloMD on the 8-mesh and must
    reproduce the single-chip dense Integrator's NVE trajectory: same
    VV/SHAKE/snap/eval/RATTLE ordering, molecule-local constraint and
    vsite work gated by group ownership."""
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    L = 80.0
    mol, par, forces = _tip4p_gas(tmp_path, nside=5, L=L)
    n = mol.numAtoms
    vel0 = np.array(maxwell_boltzmann(par.masses, 200.0, 1, seed=6))[0]
    vel0[np.asarray(par.masses).reshape(-1) <= 0] = 0.0
    pos0 = mol.coords[:, :, 0]

    # single-chip dense oracle (zero initial forces, same convention)
    syst = System(n, 1, "single")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(vel0[None])
    integ = Integrator(syst, forces, timestep=2.0, constraints="settle")
    es_d = []
    for _ in range(3):
        ek, ep, T = integ.step(niter=8)
        es_d.append(float(np.asarray(ep).reshape(-1)[0]))
    pos_d = np.asarray(syst.pos[0])

    for r in (1, 8):
        h = _tip4p_halo(forces, par, mol, r, L)
        h.init(jnp.asarray(pos0, jnp.float32),
               jnp.asarray(vel0, jnp.float32))
        assert h.spec.eps > 0.9  # the group widening is actually on
        es = []
        for _ in range(3):
            ekin, epot, T = h.step(niter=8)
            es.append(epot)
        pos_h, vel_h = h.gather()
        np.testing.assert_allclose(np.asarray(es), np.asarray(es_d),
                                   rtol=5e-5)
        # positions match up to the periodic image (halo wraps rigidly)
        d = pos_h - pos_d
        d -= L * np.round(d / L)
        assert np.max(np.abs(d)) < 2e-3
        # rigid geometry held: O-H and H-H at the SETTLE targets
        cs = h.constraints_obj.settle
        O = pos_h[np.asarray(cs.oidx)]
        H1 = pos_h[np.asarray(cs.h1)]
        H2 = pos_h[np.asarray(cs.h2)]
        doh = np.linalg.norm(O - H1, axis=1)
        dhh = np.linalg.norm(H1 - H2, axis=1)
        np.testing.assert_allclose(doh, np.asarray(cs.r_oh), atol=2e-4)
        np.testing.assert_allclose(dhh, np.asarray(cs.r_hh), atol=2e-4)
        # M sites on their construction (snap applied on owned rows)
        from torchmd_tpu.vsites import apply_vsites

        snapped = np.asarray(apply_vsites(
            par.vsites, jnp.asarray(pos_h, jnp.float32),
            jnp.asarray([L] * 3, jnp.float32),
        ))
        np.testing.assert_allclose(pos_h, snapped, atol=2e-4)


def test_halo_tip4p_migration_keeps_molecules_whole(tmp_path):
    """A thermostatted run hot enough to trigger migrations: every
    molecule's four atoms must stay co-owned on one rank (the
    molecule-atomic ownership invariant), and atoms stay conserved."""
    from torchmd_tpu.integrator import maxwell_boltzmann

    L = 80.0
    mol, par, forces = _tip4p_gas(tmp_path, nside=5, L=L)
    n = mol.numAtoms
    vel0 = np.array(maxwell_boltzmann(par.masses, 400.0, 1, seed=9))[0]
    vel0[np.asarray(par.masses).reshape(-1) <= 0] = 0.0
    h = _tip4p_halo(forces, par, mol, 8, L, timestep=4.0)
    h.init(jnp.asarray(mol.coords[:, :, 0], jnp.float32),
           jnp.asarray(vel0, jnp.float32))
    h.T = None  # NVE after init; velocities already hot
    for _ in range(4):
        ekin, epot, T = h.step(niter=12)
        assert np.isfinite(epot) and np.isfinite(ekin)
    t = np.asarray(h._tables)
    ids = t[:, :, 0].astype(int)             # (R, Acap)
    real = np.sort(ids[ids < n])
    assert np.array_equal(real, np.arange(n))
    # co-ownership: each molecule's atoms on exactly one rank
    rank_of = np.full(n, -1)
    for r in range(ids.shape[0]):
        sel = ids[r][ids[r] < n]
        rank_of[sel] = r
    mol_ranks = rank_of.reshape(-1, 4)
    assert np.all(mol_ranks == mol_ranks[:, :1])


# ----------------------------------------------------------------------
# 2-D x*y pencil decomposition (round 5): two-phase ghost exchange,
# two-phase migration, corner coverage via forwarded x ghosts
# ----------------------------------------------------------------------

def _mesh2(rx, ry):
    return Mesh(np.array(jax.devices()[: rx * ry]).reshape(rx, ry),
                ("spx", "spy"))


def test_halo_pencil_spec_validation():
    spec = make_halo_spec([90.0] * 3, 9.0, 2, 2000, Ry=4)
    assert spec.pencil_w >= spec.band_w
    assert spec.Gcap2 > 0
    assert spec.comm_bytes_per_step() > make_halo_spec(
        [90.0] * 3, 9.0, 2, 2000).comm_bytes_per_step()
    with pytest.raises(ValueError, match="y ranks"):
        make_halo_spec([90.0, 40.0, 90.0], 9.0, 2, 2000, Ry=4)


def test_halo_pencil_energy_matches_dense():
    """Zero-velocity step on a 2x4 pencil mesh: the reported potential
    equals the dense path's nonbonded energy (corner ghosts included)."""
    mol, par, forces, L = _gas()
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    box = jnp.asarray([L] * 3, jnp.float32)
    pot_d, f_d = nonbonded_energy_forces(forces.ffparams, pos, box,
                                         forces.config)
    e_dense = float(sum(jax.tree_util.tree_leaves(pot_d)))

    h = HaloMD(forces.ffparams, forces.config, _mesh2(2, 4),
               np.asarray([L] * 3), timestep=1.0, axis=("spx", "spy"))
    assert h.spec.Ry == 4
    h.init(pos, jnp.zeros_like(pos))
    ekin, epot, T = h.step(niter=1)
    assert epot == pytest.approx(e_dense, rel=1e-5)
    assert 0.0 <= ekin < 1e-4


def test_halo_pencil_rank_invariance_nve():
    """The same NVE trajectory out of 1 rank, 2x2 and 2x4 pencils (the
    two-phase exchange and migration cancel across decompositions)."""
    mol, par, forces, L = _gas(seed=3)
    from torchmd_tpu.integrator import maxwell_boltzmann

    vel0 = np.asarray(maxwell_boltzmann(par.masses, 120.0, 1, seed=2))[0]
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    results = {}
    for shape in ((1, 1), (2, 2), (2, 4)):
        h = HaloMD(forces.ffparams, forces.config, _mesh2(*shape),
                   np.asarray([L] * 3), timestep=5.0,
                   axis=("spx", "spy"))
        h.init(pos0, jnp.asarray(vel0, jnp.float32))
        es = []
        for _ in range(3):
            ekin, epot, T = h.step(niter=8)
            es.append(epot)
        pos, vel = h.gather()
        results[shape] = (np.asarray(es), pos, vel)

    e1, p1, v1 = results[(1, 1)]
    for shape in ((2, 2), (2, 4)):
        er, pr, vr = results[shape]
        np.testing.assert_allclose(er, e1, rtol=5e-5)
        np.testing.assert_allclose(pr, p1, atol=2e-3)
        np.testing.assert_allclose(vr, v1, atol=2e-3)


def test_halo_pencil_migration_conserves_atoms():
    """A thermostatted hot run on 2x4 pencils that fires two-phase
    (x then y, including diagonal) migrations keeps every atom owned by
    exactly one rank."""
    mol, par, forces, L = _gas(seed=4)
    from torchmd_tpu.integrator import maxwell_boltzmann

    vel0 = np.asarray(maxwell_boltzmann(par.masses, 300.0, 1, seed=5))[0]
    h = HaloMD(forces.ffparams, forces.config, _mesh2(2, 4),
               np.asarray([L] * 3), timestep=5.0, T=120.0, gamma=0.5,
               axis=("spx", "spy"))
    h.init(jnp.asarray(mol.coords[:, :, 0], jnp.float32),
           jnp.asarray(vel0, jnp.float32))
    for _ in range(3):
        ekin, epot, T = h.step(niter=10)
        assert np.isfinite(epot) and np.isfinite(ekin)
    t = np.asarray(h._tables).reshape(-1, h._tables.shape[-1])
    ids = t[:, 0].astype(int)
    real = np.sort(ids[ids < mol.numAtoms])
    assert np.array_equal(real, np.arange(mol.numAtoms))
    assert 40.0 < T < 400.0


def test_halo_pencil_tip4p_settle_vsites(tmp_path):
    """The flagship composition (SETTLE + vsites + LJ + electrostatics)
    on 2x4 pencils reproduces the single-chip dense Integrator and keeps
    molecules whole across two-phase migration."""
    from torchmd_tpu.constraints import build_constraint_spec
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.neighbors import build_exclusion_table
    from torchmd_tpu.systems import System

    L = 80.0
    mol, par, forces = _tip4p_gas(tmp_path, nside=5, L=L)
    n = mol.numAtoms
    vel0 = np.array(maxwell_boltzmann(par.masses, 200.0, 1, seed=6))[0]
    vel0[np.asarray(par.masses).reshape(-1) <= 0] = 0.0
    pos0 = mol.coords[:, :, 0]

    syst = System(n, 1, "single")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(vel0[None])
    integ = Integrator(syst, forces, timestep=2.0, constraints="settle")
    es_d = []
    for _ in range(3):
        ek, ep, T = integ.step(niter=8)
        es_d.append(float(np.asarray(ep).reshape(-1)[0]))
    pos_d = np.asarray(syst.pos[0])

    cs = build_constraint_spec(par, np.asarray(par.masses), mode="settle")
    excl = build_exclusion_table(par, n, 0)
    h = HaloMD(forces.ffparams, forces.config, _mesh2(2, 4),
               np.asarray([L] * 3), excl_table=excl, timestep=2.0,
               constraints=cs, vsites=par.vsites, axis=("spx", "spy"))
    h.init(jnp.asarray(pos0, jnp.float32), jnp.asarray(vel0, jnp.float32))
    assert h.spec.eps > 0.9
    es = []
    for _ in range(3):
        ekin, epot, T = h.step(niter=8)
        es.append(epot)
    pos_h, vel_h = h.gather()
    np.testing.assert_allclose(np.asarray(es), np.asarray(es_d),
                               rtol=5e-5)
    d = pos_h - pos_d
    d -= L * np.round(d / L)
    assert np.max(np.abs(d)) < 2e-3
    # molecule-atomic co-ownership held through 2-D migration
    t = np.asarray(h._tables)
    ids = t[:, :, 0].astype(int)
    rank_of = np.full(n, -1)
    for r in range(ids.shape[0]):
        sel = ids[r][ids[r] < n]
        rank_of[sel] = r
    mol_ranks = rank_of.reshape(-1, 4)
    assert np.all(mol_ranks == mol_ranks[:, :1])

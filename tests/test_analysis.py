"""On-device trajectory analysis: RMSD (Kabsch), RDF, MSD, and the
analysis-script integration on a short argon run."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import SYSTEMS_DIR

from torchmd_tpu.analysis import kabsch_rotation, msd, rdf, rmsd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rmsd_identity_and_rotation():
    rs = np.random.RandomState(0)
    ref = rs.randn(50, 3)
    # identical frames -> 0
    traj = np.stack([ref, ref])
    np.testing.assert_allclose(rmsd(traj), 0.0, atol=1e-10)
    # rigid rotation + translation -> 0 when aligned, > 0 unaligned
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    moved = ref @ R.T + np.array([3.0, -1.0, 2.0])
    traj = np.stack([ref, moved])
    np.testing.assert_allclose(rmsd(traj, align=True), 0.0, atol=1e-8)
    assert rmsd(traj, align=False)[1] > 0.5
    # genuine distortion survives alignment
    traj = np.stack([ref, moved + rs.randn(50, 3) * 0.5])
    val = rmsd(traj, align=True)[1]
    assert 0.3 < val < 1.5


def test_kabsch_proper_rotation():
    rs = np.random.RandomState(1)
    P = rs.randn(20, 3)
    # a reflected copy must still produce a PROPER rotation (det +1)
    Q = P * np.array([-1.0, 1.0, 1.0])
    R = np.asarray(kabsch_rotation(P - P.mean(0), Q - Q.mean(0)))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)


def test_rdf_ideal_gas_is_flat():
    """Uniform random gas: g(r) ~ 1 away from r=0."""
    rs = np.random.RandomState(2)
    L = 30.0
    traj = rs.rand(4, 500, 3) * L
    r, g = rdf(traj, [L, L, L], nbins=40)
    tail = g[r > 3.0]
    assert abs(tail.mean() - 1.0) < 0.05
    np.testing.assert_allclose(g[0], 0.0, atol=0.5)  # no self pairs


def test_rdf_crystal_peaks():
    """Simple cubic lattice: first RDF peak at the lattice constant."""
    a, m = 3.0, 6
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3) * a
    L = m * a
    r, g = rdf(grid[None], [L, L, L], r_max=6.0, nbins=60)
    # sharp peak at the lattice constant (exact distances land on a bin
    # edge, so check the neighborhood), empty in between
    assert g[np.abs(r - a) < 0.15].max() > 5.0
    assert g[np.abs(r - 1.23 * a) < 0.15].max() < 0.2


def test_msd_linear_for_ballistic():
    """Constant-velocity motion: MSD(lag) = (v*lag)^2."""
    v = np.array([0.1, 0.0, 0.0])
    frames = np.stack([np.zeros((10, 3)) + v * k for k in range(6)])
    vals = msd(frames)
    np.testing.assert_allclose(
        vals, (0.1 * np.arange(6)) ** 2, atol=1e-12
    )


def test_analysis_script_end_to_end(tmp_path):
    """CLI run -> analysis script produces rmsd/rdf CSVs."""
    out = tmp_path / "run"
    cmd = [
        sys.executable, "-m", "torchmd_tpu.run",
        "--topology", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield",
        os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ", "--cutoff", "9.0",
        "--steps", "40", "--output-period", "10", "--save-period", "40",
        "--temperature", "120", "--timestep", "5",
        "--log-dir", str(out),
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, env=env, capture_output=True,
                   cwd=REPO, timeout=1200)
    assert (out / "output_0.npy").exists()
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "analysis.py"),
         str(out), "--traj", "output_0.npy",
         "--rmsd", str(out / "rmsd.csv"),
         "--rdf", str(out / "rdf.csv"), "--box", "77.395",
         "--msd", str(out / "msd.csv")],
        check=True, env=env, capture_output=True, timeout=1200,
    )
    rm = np.loadtxt(out / "rmsd.csv", delimiter=",", skiprows=1)
    assert rm.shape[1] == 2 and rm[0, 1] < 1e-8  # frame 0 vs itself
    rg = np.loadtxt(out / "rdf.csv", delimiter=",", skiprows=1)
    assert rg.shape[1] == 2 and np.all(np.isfinite(rg))


def test_analyze_cli_subcommand(tmp_path):
    """`torchmd-tpu analyze` == python -m torchmd_tpu.analysis: structural
    CSVs from an existing trajectory without running a simulation."""
    import subprocess
    import sys

    traj = np.random.RandomState(0).randn(10, 3, 5)  # (natoms, 3, nframes)
    np.save(tmp_path / "output_0.npy", traj)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "torchmd_tpu.analysis", str(tmp_path),
         "--traj", "output_0.npy", "--rmsd", str(tmp_path / "r.csv"),
         "--msd", str(tmp_path / "m.csv")],
        check=True, env=env, capture_output=True, cwd=REPO, timeout=1200,
    )
    rm = np.loadtxt(tmp_path / "r.csv", delimiter=",", skiprows=1)
    assert rm.shape == (5, 2) and rm[0, 1] < 1e-8
    ms = np.loadtxt(tmp_path / "m.csv", delimiter=",", skiprows=1)
    assert ms.shape == (5, 2) and ms[0, 1] < 1e-12


def test_view_frame_png(tmp_path):
    """torchmd_tpu.viz.view_frame renders atoms+bonds+forces to a PNG
    (self-contained viewFrame substitute, reference run.py:20-25)."""
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.viz import view_frame

    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    pos = mol.coords[:, :, 0]
    f = np.random.RandomState(0).randn(*pos.shape)
    out = tmp_path / "frame.png"
    view_frame(mol, pos, f, out=str(out), title="argon")
    assert out.exists() and out.stat().st_size > 10000


def test_rdf_partial_selection_no_self_pairs():
    """sel_a with defaulted sel_b (overlapping selections) must not count
    identical-atom pairs (regression: g(r) spiked in bin 0)."""
    from torchmd_tpu.analysis import rdf

    rs = np.random.RandomState(0)
    traj = rs.rand(3, 20, 3) * 10.0  # (frames, atoms, 3)
    r, g = rdf(traj, [10.0] * 3, nbins=20, sel_a=np.arange(5))
    assert np.all(np.isfinite(g))
    assert g[0] < 5.0, g[0]  # no self-pair spike at r -> 0


def test_normal_modes_diatomic():
    """Mass-weighted Hessian via jax.hessian: a harmonic diatomic with
    effective spring 1 mdyn/A (143.94 kcal/mol/A^2) and reduced mass
    1 amu must vibrate at the classic 1302.8 cm^-1; the 5 remaining
    modes (3 translations + 2 rotations of a linear molecule) are ~0."""
    import numpy as np

    from torchmd_tpu.analysis import normal_modes
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters

    mol = Molecule()
    mol.numAtoms = 2
    mol.atomtype = np.array(["A", "A"], dtype=object)
    mol.charge = np.zeros(2)
    mol.masses = np.array([2.0, 2.0])  # mu = 1 amu
    mol.bonds = np.array([[0, 1]])
    mol.coords = np.array([[0.0, 0.0, 0.0], [1.2, 0.0, 0.0]])[:, :, None]

    # E = k0 (r-r0)^2 -> K_eff = 2 k0 = 143.94 kcal/mol/A^2 (1 mdyn/A)
    ff = YamlForcefield(mol, {
        "atomtypes": ["A"],
        "bonds": {"(A, A)": {"k0": 71.97, "req": 1.2}},
        "lj": {"A": {"sigma": 1.0, "epsilon": 0.0}},
        "electrostatics": {"A": {"charge": 0.0}},
        "masses": {"A": 2.0},
    })
    par = Parameters(ff, mol, ["bonds"], precision="double")
    forces = Forces(par, terms=["bonds"], precision="double")
    nu, modes = normal_modes(forces, mol.coords[:, :, 0])
    assert nu.shape == (6,)
    assert np.allclose(nu[:5], 0.0, atol=1.0)       # trans + rot
    assert nu[5] == pytest.approx(1302.8, abs=1.0)  # the stretch
    # the stretch mode displaces the atoms along x in opposite directions
    m = modes[5]
    assert abs(m[0, 0]) > 10 * abs(m[0, 1]) + 1e-12
    assert np.sign(m[0, 0]) == -np.sign(m[1, 0])


def test_interaction_energies_groups():
    """Group-group decomposition equals the hand-summed cross pairs."""
    import numpy as np

    from torchmd_tpu.analysis import interaction_energies
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.units import ELEC_FACTOR

    rs = np.random.RandomState(1)
    n = 6
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["A"] * n, dtype=object)
    mol.charge = rs.randn(n) * 0.3
    mol.masses = np.full(n, 12.0)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    coords = rs.rand(n, 3) * 8.0
    mol.coords = coords[:, :, None]
    ff = YamlForcefield(mol, {
        "atomtypes": ["A"],
        "lj": {"A": {"sigma": 3.0, "epsilon": 0.2}},
        "electrostatics": {"A": {"charge": 0.0}},
        "masses": {"A": 12.0},
    })
    par = Parameters(ff, mol, ["lj", "electrostatics"], precision="double")
    par.charges = np.asarray(mol.charge)
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="double")
    sel_a = [0, 1, 2]
    out = interaction_energies(forces, coords, sel_a=sel_a)

    e_lj = e_el = 0.0
    for i in sel_a:
        for j in range(3, n):
            r = np.linalg.norm(coords[i] - coords[j])
            s6 = (3.0 / r) ** 6
            e_lj += 4 * 0.2 * (s6 * s6 - s6)
            e_el += ELEC_FACTOR * mol.charge[i] * mol.charge[j] / r
    assert out["lj"] == pytest.approx(e_lj, rel=1e-9)
    assert out["electrostatics"] == pytest.approx(e_el, rel=1e-9)

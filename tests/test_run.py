"""End-to-end CLI runs on the bundled run configs (argon, oscillator,
water), plus checkpoint/resume."""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import SYSTEMS_DIR

from torchmd_tpu import run as runmod


def test_run_argon_lj(tmp_path):
    """Pure-LJ argon box with Langevin thermostat (tests/argon config)."""
    args = runmod.get_args([
        "--structure", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ",
        "--cutoff", "9.0",
        "--precision", "double",
        "--steps", "40", "--output-period", "10", "--save-period", "20",
        "--temperature", "120", "--langevin-temperature", "120",
        "--langevin-gamma", "1.0",
        "--log-dir", str(tmp_path),
        "--device", "cpu",
    ])
    mol, system, forces = runmod.setup(args)
    assert np.any(system.box != 0)  # CRYST1 box picked up
    runmod.dynamics(args, mol, system, forces)

    assert os.path.exists(tmp_path / "monitor_0.csv")
    assert os.path.exists(tmp_path / "output_0.npy")
    assert os.path.exists(tmp_path / "output_0.xyz")
    traj = np.load(tmp_path / "output_0.npy")
    assert traj.shape[0] == mol.numAtoms and traj.shape[1] == 3
    rows = open(tmp_path / "monitor_0.csv").read().strip().splitlines()
    assert rows[0].startswith("iter,ns,epot,ekin,etot,T")
    assert len(rows) == 1 + 4


def test_run_oscillator(tmp_path):
    """Harmonic-oscillator dimer (tests/oscillator): bonded-only dynamics."""
    args = runmod.get_args([
        "--structure", os.path.join(SYSTEMS_DIR, "oscillator", "dummy.pdb"),
        "--forcefield",
        os.path.join(SYSTEMS_DIR, "oscillator", "oscillator_forcefield.yaml"),
        "--forceterms", "Bonds",
        "--precision", "double",
        "--steps", "200", "--output-period", "50", "--save-period", "100",
        "--temperature", "0",
        "--log-dir", str(tmp_path),
        "--device", "cpu",
    ])
    mol, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol, system, forces)
    # bond (k0=0.2, req=3) with atoms 3 apart: energy stays ~0; atoms 2.99..3.01
    traj = np.load(tmp_path / "output_0.npy")
    d = np.linalg.norm(traj[0, :, -1] - traj[1, :, -1])
    assert 2.0 < d < 4.0


def test_run_water_replicas(tmp_path):
    """Water box, 2 replicas, full bonded+LJ+electrostatics
    (tests/water config shape)."""
    args = runmod.get_args([
        "--topology", os.path.join(SYSTEMS_DIR, "water", "structure.psf"),
        "--coordinates", os.path.join(SYSTEMS_DIR, "water", "structure.pdb"),
        "--forcefield",
        os.path.join(SYSTEMS_DIR, "water", "water_forcefield.yaml"),
        "--forceterms", "LJ", "Bonds", "Angles", "Electrostatics",
        "--cutoff", "7.3",
        "--replicas", "2",
        "--precision", "double",
        "--steps", "20", "--output-period", "10", "--save-period", "20",
        "--temperature", "300", "--langevin-temperature", "300",
        "--log-dir", str(tmp_path),
        "--device", "cpu",
    ])
    mol, system, forces = runmod.setup(args)
    assert system.nreplicas == 2
    runmod.dynamics(args, mol, system, forces)
    assert os.path.exists(tmp_path / "monitor_1.csv")
    assert os.path.exists(tmp_path / "output_1.xyz")


def test_checkpoint_resume(tmp_path):
    common = [
        "--structure", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ",
        "--cutoff", "9.0",
        "--precision", "double",
        "--output-period", "10",
        "--temperature", "120", "--langevin-temperature", "120",
        "--device", "cpu",
        "--seed", "7",
    ]
    # continuous 40-step run
    d1 = tmp_path / "full"
    args = runmod.get_args(
        common + ["--steps", "40", "--log-dir", str(d1)]
    )
    mol, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol, system, forces)
    full_pos = system.pos.copy()

    # 20 steps + checkpoint, then resume for the remaining 20
    d2 = tmp_path / "part1"
    args = runmod.get_args(
        common + ["--steps", "20", "--log-dir", str(d2),
                  "--checkpoint-period", "20"]
    )
    mol, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol, system, forces)
    chk = os.path.join(str(d2), "output.chk")
    assert os.path.exists(chk)

    d3 = tmp_path / "part2"
    args = runmod.get_args(
        common + ["--steps", "40", "--log-dir", str(d3), "--resume", chk]
    )
    mol, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol, system, forces)
    np.testing.assert_allclose(system.pos, full_pos, atol=1e-8)


def test_run_coarse_grained(tmp_path):
    """Coarse-grained chain (tests/cg config shape): PSF topology, XTC
    coords, YAML FF with bonds/angles/repulsionCG terms."""
    args = runmod.get_args([
        "--topology", os.path.join(SYSTEMS_DIR, "cg", "cg_structure.psf"),
        "--coordinates", os.path.join(SYSTEMS_DIR, "cg", "cg_structure.xtc"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "cg", "forcefield.yaml"),
        "--forceterms", "Bonds", "Angles", "RepulsionCG",
        "--cutoff", "7.3",
        "--replicas", "2",
        "--precision", "double",
        "--steps", "20", "--output-period", "10", "--save-period", "20",
        "--temperature", "350", "--langevin-temperature", "350",
        "--langevin-gamma", "1.0",
        "--log-dir", str(tmp_path),
        "--device", "cpu",
        "--exclusions", "bonds",
    ])
    mol, system, forces = runmod.setup(args)
    assert "repulsioncg" in forces.energies
    runmod.dynamics(args, mol, system, forces)
    assert os.path.exists(tmp_path / "monitor_1.csv")
    import csv
    with open(tmp_path / "monitor_0.csv") as f:
        rows = list(csv.DictReader(f))
    assert np.isfinite(float(rows[-1]["epot"]))


def test_run_npt_argon(tmp_path):
    """NPT: --pressure enables the MC barostat; the box volume changes."""
    args = runmod.get_args([
        "--structure", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ",
        "--cutoff", "9.0",
        "--precision", "double",
        "--steps", "60", "--output-period", "10", "--save-period", "30",
        "--temperature", "120", "--langevin-temperature", "120",
        "--langevin-gamma", "2.0",
        "--pressure", "100.0",
        "--log-dir", str(tmp_path),
        "--device", "cpu",
        "--seed", "4",
    ])
    mol, system, forces = runmod.setup(args)
    v0 = float(np.prod(np.diag(system.box[0])))
    runmod.dynamics(args, mol, system, forces)
    v1 = float(np.prod(np.diag(system.box[0])))
    assert np.isfinite(v1) and v1 > 0
    assert v1 != v0  # at least one accepted volume move


def test_run_dcd_output(tmp_path):
    args = runmod.get_args([
        "--structure", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ", "--cutoff", "9.0", "--precision", "double",
        "--steps", "30", "--output-period", "10", "--save-period", "30",
        "--temperature", "120", "--traj-format", "dcd",
        "--log-dir", str(tmp_path), "--device", "cpu",
    ])
    mol, system, forces = runmod.setup(args)
    runmod.dynamics(args, mol, system, forces)
    from torchmd_tpu.io.dcd import read_dcd
    d = read_dcd(str(tmp_path / "output_0.dcd"))
    assert d["coords"].shape == (mol.numAtoms, 3, 3)
    assert np.all(d["box"][:, 0] > 70)


def test_run_minimize_fire(tmp_path):
    args = runmod.get_args([
        "--structure", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield", os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ", "--cutoff", "9.0", "--precision", "double",
        "--steps", "10", "--output-period", "10", "--save-period", "10",
        "--temperature", "10",
        "--minimize", "50", "--minimize-method", "fire",
        "--log-dir", str(tmp_path), "--device", "cpu",
    ])
    mol, system, forces = runmod.setup(args)
    e0 = forces.compute(system.pos, system.box)[0]
    runmod.dynamics(args, mol, system, forces)
    assert os.path.exists(tmp_path / "monitor_0.csv")

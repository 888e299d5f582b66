"""DCD trajectory round-trip and positional restraints."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.io.dcd import DCDWriter, read_dcd
from torchmd_tpu.restraints import FlatBottomRestraint, HarmonicPositionalRestraint


def test_dcd_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    path = str(tmp_path / "traj.dcd")
    natoms, nframes = 17, 5
    frames = rs.randn(natoms, 3, nframes) * 10
    boxes = 10 + rs.rand(3, nframes)
    with DCDWriter(path, natoms, timestep_fs=2.0, save_period=10) as w:
        for k in range(nframes):
            w.write_frame(frames[:, :, k], boxes[:, k])

    d = read_dcd(path)
    assert d["nframes_header"] == nframes
    assert d["coords"].shape == (natoms, 3, nframes)
    np.testing.assert_allclose(d["coords"], frames, atol=1e-5)
    np.testing.assert_allclose(d["box"], boxes, atol=1e-10)


def test_harmonic_restraint_energy_and_md():
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "1water"))
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator

    ref = mol.coords[:, :, 0]
    rest = HarmonicPositionalRestraint(ref, k=10.0)
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", external=rest)

    pos = ref[None] + 0.1
    det = forces.compute(pos, None, returnDetails=True)[0]
    assert det["external"] == pytest_approx(10.0 * 3 * 3 * 0.01)

    # restrained MD stays near the reference
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions((ref + 0.3)[:, :, None])
    integ = Integrator(system, forces, 1.0, gamma=5.0, T=50, seed=1)
    for _ in range(5):
        integ.step(niter=20)
    disp = np.abs(system.pos[0] - ref).max()
    assert disp < 2.0


def pytest_approx(x, rel=1e-9):
    import pytest

    return pytest.approx(x, rel=rel)


def test_flat_bottom_restraint():
    ref = np.zeros((2, 3))
    rest = FlatBottomRestraint(ref, k=5.0, r0=1.0)
    inside = jnp.asarray([[0.5, 0, 0], [0, 0.9, 0]])
    outside = jnp.asarray([[2.0, 0, 0], [0, 0, 3.0]])
    assert float(rest.energy_fn(inside, None)) < 1e-10
    e = float(rest.energy_fn(outside, None))
    assert e == pytest_approx(5.0 * (1.0**2 + 2.0**2))

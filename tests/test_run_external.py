"""End-to-end CLI run with an npz molecule and an external (NNP-style)
potential, exercising the reference's external-config protocol
(run.py:186-209 equivalent)."""

from __future__ import annotations

import os
import textwrap

import numpy as np
import yaml

from torchmd_tpu import run as runmod


def test_run_npz_with_external(tmp_path):
    # tiny LJ-less gas of 8 carbons, held together by an external harmonic
    # well around the origin
    rs = np.random.RandomState(0)
    npz = tmp_path / "mol.npz"
    np.savez(
        npz,
        z=np.full(8, 6),
        coord=rs.randn(8, 3) * 2.0,
        charges=np.zeros(8),
    )

    potential = tmp_path / "well.py"
    potential.write_text(textwrap.dedent("""
        import jax.numpy as jnp

        def make_potential(embeddings, k=1.0):
            k = float(k)

            def energy_fn(pos, box):
                return k * jnp.sum(pos * pos)

            return energy_fn
    """))

    conf = tmp_path / "conf.yaml"
    conf.write_text(yaml.dump({
        "npz_file": str(npz),
        "forcefield": None,
        "forceterms": [],
        "external": {
            "module": "torchmd_tpu.external",
            "file": str(potential),
            "embeddings": [6] * 8,
            "k": 0.5,
        },
        "steps": 40,
        "output_period": 10,
        "save_period": 20,
        "timestep": 1.0,
        "temperature": 100,
        "langevin_temperature": 100,
        "langevin_gamma": 1.0,
        "precision": "double",
        "device": "cpu",
        "log_dir": str(tmp_path / "out"),
        "seed": 3,
    }))

    args = runmod.get_args(["--conf", str(conf)])
    mol, system, forces = runmod.setup(args)
    assert forces.external is not None
    runmod.dynamics(args, mol, system, forces)

    assert os.path.exists(tmp_path / "out" / "monitor_0.csv")
    traj = np.load(tmp_path / "out" / "output_0.npy")
    # the harmonic well keeps the gas bounded
    assert np.abs(traj).max() < 50

"""Checkpoint / resume for simulations.

New capability beyond the reference (which has none -- a crash loses the
run, cf. SURVEY.md §5): the full restartable state is (pos, vel, box,
forces, rng key, iteration counter), written atomically as .npz.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path, system, integrator, iteration: int):
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        pos=np.asarray(system.pos),
        vel=np.asarray(system.vel),
        forces=np.asarray(system.forces),
        box=np.asarray(system.box),
        key=np.asarray(integrator.key),
        iteration=np.asarray(iteration, dtype=np.int64),
    )
    os.replace(tmp, path)


def load_checkpoint(path, system, integrator) -> int:
    import jax.numpy as jnp

    data = np.load(path)
    system.pos[:] = data["pos"].astype(system.pos.dtype)
    system.vel[:] = data["vel"].astype(system.vel.dtype)
    system.forces[:] = data["forces"].astype(system.forces.dtype)
    system.box[:] = data["box"].astype(system.box.dtype)
    integrator.key = jnp.asarray(data["key"])
    return int(data["iteration"])

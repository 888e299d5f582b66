"""Checkpoint / resume for simulations.

New capability beyond the reference (which has none -- a crash loses the
run, cf. SURVEY.md §5): the full restartable state is (pos, vel, box,
forces, rng key, iteration counter) plus any extended-system state the
integrator carries -- Nose-Hoover / CSVR thermostat chains and the MTK
barostat (v_eps + its chain). Written atomically as .npz; resume is
bit-exact (the carried virial is a pure function of (pos, box) and is
recomputed on load).
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path, system, integrator, iteration: int):
    arrays = dict(
        pos=np.asarray(system.pos),
        vel=np.asarray(system.vel),
        forces=np.asarray(system.forces),
        box=np.asarray(system.box),
        key=np.asarray(integrator.key),
        iteration=np.asarray(iteration, dtype=np.int64),
    )
    aux = getattr(integrator, "_thermo_aux", None)
    if aux:
        for k, v in aux.items():
            arrays[f"thermo_{k}"] = np.asarray(v)
    if getattr(integrator, "_npt", None) is not None:
        v_eps, aux_b, _vir = integrator._npt_extra
        arrays["npt_veps"] = np.asarray(v_eps)
        for k, v in aux_b.items():
            arrays[f"npt_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path, system, integrator) -> int:
    import jax.numpy as jnp

    data = np.load(path)
    system.pos[:] = data["pos"].astype(system.pos.dtype)
    system.vel[:] = data["vel"].astype(system.vel.dtype)
    system.forces[:] = data["forces"].astype(system.forces.dtype)
    system.box[:] = data["box"].astype(system.box.dtype)
    integrator.key = jnp.asarray(data["key"])
    aux = getattr(integrator, "_thermo_aux", None)
    if aux:
        restored = {}
        for k, v in aux.items():
            name = f"thermo_{k}"
            restored[k] = (
                jnp.asarray(data[name], v.dtype) if name in data else v
            )
        integrator._thermo_aux = restored
    if getattr(integrator, "_npt", None) is not None and "npt_veps" in data:
        v_eps, aux_b, _ = integrator._npt_extra
        v_new = jnp.asarray(data["npt_veps"], v_eps.dtype)
        aux_new = {
            k: jnp.asarray(data[f"npt_{k}"], v.dtype)
            for k, v in aux_b.items()
        }
        # virial: pure function of (pos, box) -> lazily recomputed
        integrator._npt_extra = (v_new, aux_new, None)
    return int(data["iteration"])

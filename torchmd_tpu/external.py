"""External potential (neural-network potential) integration.

Protocol identical to the reference (torchmd/forces.py:321-326,
run.py:186-209): any object exposing

    calculate(pos[nreplicas, natoms, 3], box) -> (energy[nreplicas],
                                                  forces[nreplicas, natoms, 3])

can be passed as `Forces(external=...)`; it is evaluated batched over
replicas after the internal terms. Objects that additionally expose

    energy_fn(pos[natoms, 3], box[3]) -> scalar energy

as a JAX-traceable function get folded directly into the jitted
evaluation (and the integrator's lax.scan), with forces from autodiff --
zero host round-trips. Host-coupled externals (e.g. torch NNPs) fall back
to the per-step host loop, like the reference.
"""

from __future__ import annotations

import numpy as np


class JaxExternal:
    """Adapter for a pure-JAX potential `energy_fn(pos, box) -> scalar`.

    Satisfies both protocol levels: `energy_fn` for in-jit folding and
    `calculate` for the batched host API.
    """

    def __init__(self, energy_fn):
        self._efn = energy_fn

    def energy_fn(self, pos, box):
        return self._efn(pos, box)

    def calculate(self, pos, box):
        import jax
        import jax.numpy as jnp

        pos = jnp.asarray(np.asarray(pos))
        nrep = pos.shape[0]
        if box is None:
            boxd = jnp.zeros((nrep, 3), pos.dtype)
        else:
            boxd = jnp.asarray(np.asarray(box), pos.dtype)
            if boxd.ndim == 3:
                boxd = jnp.diagonal(boxd, axis1=1, axis2=2)
        e, g = jax.vmap(jax.value_and_grad(self._efn))(pos, boxd)
        return np.asarray(e), -np.asarray(g)


class External:
    """Reference-compatible CLI entry point: constructed from an external
    config as `External(file, embeddings, device, **kwargs)`
    (run.py:186-209). `file` must be a Python file or module path defining
    `make_potential(embeddings, **kwargs) -> energy_fn` (a JAX-traceable
    per-conformation energy)."""

    def __init__(self, file, embeddings, device=None, **kwargs):
        import importlib.util
        import importlib

        if str(file).endswith(".py"):
            spec = importlib.util.spec_from_file_location("_ext_potential", file)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        else:
            mod = importlib.import_module(str(file))
        self._inner = JaxExternal(mod.make_potential(np.asarray(embeddings), **kwargs))

    def energy_fn(self, pos, box):
        return self._inner.energy_fn(pos, box)

    def calculate(self, pos, box):
        return self._inner.calculate(pos, box)

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
    `calculate` for the batched host API. An optional analytic
    `energy_forces_fn(pos, box) -> (energy, forces)` overrides the
    value_and_grad force path (e.g. GB/OBC's two-pass formulation,
    which avoids reverse-mode's O(N^2) stored residuals)."""

    def __init__(self, energy_fn, energy_forces_fn=None):
        self._efn = energy_fn
        if energy_forces_fn is not None:
            # bound attribute, only present when an analytic path exists
            # (external_ef() dispatches on attribute presence)
            self.energy_forces_fn = energy_forces_fn

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
        ef = external_ef(self)
        e, frc = jax.vmap(ef)(pos, boxd)
        return np.asarray(e), np.asarray(frc)


def external_ef(external):
    """(pos, box) -> (energy, forces) closure for a jittable external:
    the object's analytic `energy_forces_fn` when present, else
    value_and_grad of `energy_fn`. None for host-coupled externals."""
    if external is None:
        return None
    ef = getattr(external, "energy_forces_fn", None)
    if ef is not None:
        return ef
    fn = getattr(external, "energy_fn", None)
    if fn is None:
        return None

    def _ef(pos, box):
        import jax

        e, g = jax.value_and_grad(fn)(pos, box)
        return e, -g

    return _ef


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

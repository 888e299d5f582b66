"""Thermodynamic observables: virial and instantaneous pressure.

New capability vs the reference (which reports only E/T). The virial is
computed by autodiff through a uniform scaling of coordinates AND box,

    W = -dU(lambda*pos, lambda*box)/dlambda |_{lambda=1}

which is exact for every term in the framework (minimum-image pair terms,
switching, reaction field, Ewald reciprocal space) without per-term virial
formulas. Pressure: P = (2K + W) / (3V).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .units import BOLTZMANN

# kcal/mol/A^3 -> bar
KCALMOL_A3_TO_BAR = 1.0 / (1.0e5 * 1.0e-30 * 6.02214076e23 / 4184.0)


def virial(efn_one, pos, box):
    """-dU/dlambda for one conformation. efn_one(pos, box) -> scalar."""

    def scaled(lmbda):
        return efn_one(pos * lmbda, None if box is None else box * lmbda)

    _, dUdl = jax.jvp(scaled, (jnp.asarray(1.0, pos.dtype),),
                      (jnp.asarray(1.0, pos.dtype),))
    return -dUdl


def pressure(forces, system, units="bar"):
    """Instantaneous pressure per replica from the current System state.
    Requires a periodic box."""
    box = np.asarray(system.box_diag)
    if np.any(box <= 0):
        raise ValueError("Pressure requires a periodic box")

    from .integrator import kinetic_energy

    dtype = forces.dtype
    masses = jnp.asarray(np.asarray(forces.par.masses).reshape(-1, 1), dtype)

    def etot_one(pos, b):
        pot, _ = forces.ef_one(pos, b)
        leaves = jax.tree_util.tree_leaves(pot)
        return sum(leaves) if leaves else jnp.zeros((), pos.dtype)

    pos = jnp.asarray(system.pos, dtype)
    boxd = jnp.asarray(box, dtype)
    W = jax.vmap(lambda p, b: virial(etot_one, p, b))(pos, boxd)
    K = kinetic_energy(masses, jnp.asarray(system.vel, dtype))[:, 0]
    V = jnp.prod(boxd, axis=1)
    P = (2.0 * K + W) / (3.0 * V)  # kcal/mol/A^3
    P = np.asarray(P, dtype=np.float64)
    if units == "bar":
        return P * KCALMOL_A3_TO_BAR
    return P


def ideal_gas_pressure(natoms, T, volume, units="bar"):
    """NkT/V reference value."""
    p = natoms * BOLTZMANN * T / volume
    return p * KCALMOL_A3_TO_BAR if units == "bar" else p

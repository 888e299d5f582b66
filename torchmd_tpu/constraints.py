"""Holonomic bond constraints: SHAKE (positions) + RATTLE (velocities).

New capability relative to the reference (which has none -- unconstrained
X-H stretches limit it to ~1 fs timesteps): constraining hydrogen bonds
(or all bonds) permits the 2-4 fs production timesteps its own bundled
configs assume.

TPU-first formulation: instead of the classical serial Gauss-Seidel sweep,
constraints are relaxed in parallel (Jacobi / matrix-free SHAKE) inside a
`lax.fori_loop` with a fixed iteration count -- static shapes, no
data-dependent control flow, vmappable over replicas, and safe inside the
integrator's scan. Overlapping clusters (e.g. CH3) converge in a few tens
of iterations with under-relaxation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ConstraintSet(NamedTuple):
    pairs: jnp.ndarray    # (C, 2) int32 atom indices
    r0: jnp.ndarray       # (C,) target distances
    invm: jnp.ndarray     # (natoms, 1) inverse masses
    iterations: int
    relax: float          # under-relaxation factor for Jacobi sweeps


def build_constraints(parameters, masses, mode="hbonds", iterations=50,
                      relax=0.5, h_mass_cut=3.5) -> Optional[ConstraintSet]:
    """Build constraints from assembled bond parameters.

    mode: "hbonds" constrains bonds with a light (<= h_mass_cut amu) atom;
    "allbonds" constrains every bond (with the reference water model's
    zero-k H-H spacer bonds this makes water rigid)."""
    if parameters.bond_params is None or mode in (None, "none", False):
        return None
    idx = np.asarray(parameters.bond_params["idx"])
    bmap = np.asarray(parameters.bond_params["map"])
    bpar = np.asarray(parameters.bond_params["params"])
    r0_all = bpar[bmap[:, 1], 1]
    masses = np.asarray(masses, dtype=np.float64).reshape(-1)

    if mode == "allbonds":
        keep = np.ones(len(idx), dtype=bool)
    elif mode == "hbonds":
        light = masses <= h_mass_cut
        keep = light[idx[:, 0]] | light[idx[:, 1]]
    else:
        raise ValueError(f"Unknown constraint mode: {mode}")
    if not keep.any():
        return None
    invm = np.where(masses > 0, 1.0 / np.maximum(masses, 1e-12), 0.0)
    return ConstraintSet(
        pairs=jnp.asarray(idx[keep], jnp.int32),
        r0=jnp.asarray(r0_all[keep]),
        invm=jnp.asarray(invm.reshape(-1, 1)),
        iterations=int(iterations),
        relax=float(relax),
    )


def shake_positions(cs: ConstraintSet, pos_new, pos_ref):
    """Project `pos_new` back onto the constraint manifold, using the
    pre-step geometry `pos_ref` for the constraint gradients (standard
    SHAKE linearization)."""
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    ref = pos_ref[i] - pos_ref[j]                       # (C, 3)
    wi = cs.invm[i]
    wj = cs.invm[j]
    denom = 2.0 * jnp.sum(ref * ref, axis=1) * (wi + wj)[:, 0]

    def body(_, p):
        d = p[i] - p[j]
        diff = jnp.sum(d * d, axis=1) - cs.r0 * cs.r0
        g = cs.relax * diff / denom                      # (C,)
        corr = g[:, None] * ref
        p = p.at[i].add(-corr * wi)
        p = p.at[j].add(corr * wj)
        return p

    return jax.lax.fori_loop(0, cs.iterations, body, pos_new)


def rattle_velocities(cs: ConstraintSet, pos, vel):
    """Remove velocity components along the constraints (RATTLE)."""
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    d = pos[i] - pos[j]
    wi = cs.invm[i]
    wj = cs.invm[j]
    denom = jnp.sum(d * d, axis=1) * (wi + wj)[:, 0]

    def body(_, v):
        rv = jnp.sum((v[i] - v[j]) * d, axis=1)
        k = cs.relax * rv / denom
        corr = k[:, None] * d
        v = v.at[i].add(-corr * wi)
        v = v.at[j].add(corr * wj)
        return v

    return jax.lax.fori_loop(0, cs.iterations, body, vel)


def max_constraint_error(cs: ConstraintSet, pos):
    i, j = cs.pairs[:, 0], cs.pairs[:, 1]
    d = jnp.linalg.norm(pos[i] - pos[j], axis=1)
    return jnp.max(jnp.abs(d - cs.r0))

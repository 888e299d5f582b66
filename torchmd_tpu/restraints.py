"""Positional restraints as external potentials.

Production convenience the reference lacks: harmonic and flat-bottom
restraints compose with any force field through the external-potential
slot (JAX energy, folds into the jitted scan, forces by autodiff).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class HarmonicPositionalRestraint:
    """E = sum_i k_i * |r_i - r0_i|^2 over the selected atoms."""

    def __init__(self, ref_pos, k, atom_idx=None):
        self.ref = jnp.asarray(np.asarray(ref_pos, dtype=np.float64))
        self.k = jnp.asarray(k)
        self.idx = None if atom_idx is None else jnp.asarray(
            np.asarray(atom_idx), jnp.int32
        )

    def energy_fn(self, pos, box):
        p = pos if self.idx is None else pos[self.idx]
        ref = self.ref.astype(pos.dtype)
        d = p - ref
        return jnp.sum(self.k * jnp.sum(d * d, axis=-1))

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


class FlatBottomRestraint:
    """Zero inside radius r0 around the reference points, harmonic
    (k*(|d|-r0)^2) outside."""

    def __init__(self, ref_pos, k, r0, atom_idx=None):
        self.ref = jnp.asarray(np.asarray(ref_pos, dtype=np.float64))
        self.k = jnp.asarray(k)
        self.r0 = float(r0)
        self.idx = None if atom_idx is None else jnp.asarray(
            np.asarray(atom_idx), jnp.int32
        )

    def energy_fn(self, pos, box):
        p = pos if self.idx is None else pos[self.idx]
        ref = self.ref.astype(pos.dtype)
        d = jnp.sqrt(jnp.sum((p - ref) ** 2, axis=-1) + 1e-24)
        over = jnp.maximum(d - self.r0, 0.0)
        return jnp.sum(self.k * over * over)

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


class AnisotropicPositionalRestraint:
    """Per-axis harmonic restraint: E = sum_i (kx dx^2 + ky dy^2 + kz dz^2)
    -- the GROMACS [position_restraints] funct 1 form (whose 1/2 factor and
    kJ/nm^2 units are folded into k by the caller)."""

    def __init__(self, ref_pos, kvec, atom_idx=None):
        self.ref = jnp.asarray(np.asarray(ref_pos, dtype=np.float64))
        self.k = jnp.asarray(np.asarray(kvec, dtype=np.float64))  # (n, 3)
        self.idx = None if atom_idx is None else jnp.asarray(
            np.asarray(atom_idx), jnp.int32
        )

    def energy_fn(self, pos, box):
        p = pos if self.idx is None else pos[self.idx]
        d = p - self.ref.astype(pos.dtype)
        return jnp.sum(self.k.astype(pos.dtype) * d * d)

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


def make_gromacs_posres(parameters, ref_pos):
    """Build the restraint object for a GROMACS topology's
    [position_restraints] records (parameters.gmx_posres, filled by
    ff_gromacs when the defining #ifdef -- typically POSRES -- is active;
    see TMD_GMX_DEFINES). `ref_pos` (natoms, 3) supplies the reference
    coordinates (GROMACS `-r`, normally the starting structure)."""
    rec = getattr(parameters, "gmx_posres", None)
    if not rec:
        return None
    idx = np.asarray([r[0] for r in rec], dtype=np.int64)
    k = np.asarray([r[1:4] for r in rec], dtype=np.float64)
    ref = np.asarray(ref_pos, dtype=np.float64)[idx]
    return AnisotropicPositionalRestraint(ref, k, atom_idx=idx)

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


class GromacsDistanceRestraint:
    """GROMACS [distance_restraints] funct 1 (instantaneous form):
        r < low        : 1/2 k (r - low)^2
        low <= r <= up1: 0
        up1 < r <= up2 : 1/2 k (r - up1)^2
        r > up2        : linear continuation 1/2 k (up2-up1)(2r-up2-up1)
    All lengths in Angstrom, k in kcal/mol/A^2 (per-pair, already scaled
    by the row's weighting factor)."""

    def __init__(self, pairs, low, up1, up2, k):
        self.pairs = jnp.asarray(np.asarray(pairs), jnp.int32)
        self.low = jnp.asarray(low)
        self.up1 = jnp.asarray(up1)
        self.up2 = jnp.asarray(up2)
        self.k = jnp.asarray(k)

    def energy_fn(self, pos, box):
        from .potentials import wrap_displacement

        d = pos[self.pairs[:, 0]] - pos[self.pairs[:, 1]]
        d = wrap_displacement(d, box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-24)
        low = self.low.astype(pos.dtype)
        up1 = self.up1.astype(pos.dtype)
        up2 = self.up2.astype(pos.dtype)
        k = self.k.astype(pos.dtype)
        e_low = 0.5 * k * (r - low) ** 2
        e_mid = 0.5 * k * (r - up1) ** 2
        e_lin = 0.5 * k * (up2 - up1) * (2.0 * r - up2 - up1)
        e = jnp.where(
            r < low, e_low,
            jnp.where(r <= up1, 0.0, jnp.where(r <= up2, e_mid, e_lin)),
        )
        return jnp.sum(e)

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


class GromacsDihedralRestraint:
    """GROMACS [dihedral_restraints] funct 1: flat within +-dphi of phi0,
    harmonic 1/2 k (|dphi_wrapped| - dphi)^2 outside. Angles in radians,
    k in kcal/mol/rad^2."""

    def __init__(self, quads, phi0, dphi, k):
        self.quads = jnp.asarray(np.asarray(quads), jnp.int32)
        self.phi0 = jnp.asarray(phi0)
        self.dphi = jnp.asarray(dphi)
        self.k = jnp.asarray(k)

    def energy_fn(self, pos, box):
        from .potentials import _dihedral_phi

        phi = _dihedral_phi(pos, self.quads, box)
        diff = phi - self.phi0.astype(pos.dtype)
        diff = diff - 2.0 * jnp.pi * jnp.round(diff / (2.0 * jnp.pi))
        over = jnp.maximum(
            jnp.abs(diff) - self.dphi.astype(pos.dtype), 0.0
        )
        return jnp.sum(0.5 * self.k.astype(pos.dtype) * over * over)

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


def make_gromacs_distres(parameters, fc_kj_nm2=1000.0):
    """Restraint object for parameters.gmx_distres (rows (i, j, low, up1,
    up2, fac) in Angstrom; fac scales the global force constant
    `fc_kj_nm2`, GROMACS's disre-fc .mdp parameter)."""
    rec = getattr(parameters, "gmx_distres", None)
    if not rec:
        return None
    rec = np.asarray(rec, dtype=np.float64)
    k = rec[:, 5] * fc_kj_nm2 / 4.184 / 100.0
    return GromacsDistanceRestraint(
        rec[:, :2].astype(np.int64), rec[:, 2], rec[:, 3], rec[:, 4], k
    )


def make_gromacs_dihres(parameters):
    """Restraint object for parameters.gmx_dihres (rows (i, j, k, l,
    phi0_rad, dphi_rad, k_kcal_rad2))."""
    rec = getattr(parameters, "gmx_dihres", None)
    if not rec:
        return None
    rec = np.asarray(rec, dtype=np.float64)
    return GromacsDihedralRestraint(
        rec[:, :4].astype(np.int64), rec[:, 4], rec[:, 5], rec[:, 6]
    )

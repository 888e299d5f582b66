"""Collective variables, harmonic biases (umbrella sampling / restrained
MD), and a 1-D WHAM estimator.

Capability beyond the reference. The functional design keeps the whole
workflow inside the compiled scan: a CV is a pure differentiable function
of positions, a bias implements the external-potential protocol
(`energy_fn(pos, box) -> scalar`, forces.py:17-21), so `Forces(...,
external=bias)` folds the restraint into the jitted integrator with
forces via AD. Umbrella windows are independent `Forces`+`Integrator`
pairs (or vmapped replicas); `wham` combines the sampled CV series into a
potential of mean force.

Energy convention: E_bias = 0.5 * k * (cv - center)^2, kcal/mol with the
CV in its natural unit (Angstrom or radian).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import _dihedral_phi, wrap_displacement
from .units import BOLTZMANN

__all__ = [
    "distance_cv", "angle_cv", "dihedral_cv", "com_distance_cv",
    "HarmonicBias", "wham",
]


def _boxes_to_diag(box, nreplicas):
    """Accept (R,3,3), (R,3), (3,3), (3,) -> (R,3) diagonals (the same
    shapes Forces._box_to_diag takes on the jitted path)."""
    b = np.asarray(box, np.float64)
    if b.ndim == 3:
        b = np.stack([np.diag(b[r]) for r in range(b.shape[0])])
    elif b.ndim == 2 and b.shape == (3, 3):
        b = np.diag(b)[None]
    return np.broadcast_to(b.reshape(-1, 3), (nreplicas, 3))


def distance_cv(i, j):
    """CV: distance between atoms i and j (minimum image when boxed)."""
    i, j = int(i), int(j)

    def cv(pos, box=None):
        dv = wrap_displacement(pos[i] - pos[j], box)
        return jnp.sqrt(jnp.maximum(jnp.sum(dv * dv), 1e-32))

    return cv


def angle_cv(i, j, k):
    """CV: angle i-j-k in radians."""
    i, j, k = int(i), int(j), int(k)

    def cv(pos, box=None):
        r1 = wrap_displacement(pos[i] - pos[j], box)
        r2 = wrap_displacement(pos[k] - pos[j], box)
        c = jnp.sum(r1 * r2) / jnp.sqrt(
            jnp.maximum(jnp.sum(r1 * r1) * jnp.sum(r2 * r2), 1e-32)
        )
        c = jnp.clip(c, -1.0, 1.0)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-24))
        return jnp.arctan2(s, c)

    return cv


def dihedral_cv(i, j, k, l):  # noqa: E741
    """CV: dihedral i-j-k-l in radians (same sign convention as the
    force-field torsion term)."""
    idx = jnp.asarray([[int(i), int(j), int(k), int(l)]], jnp.int32)

    def cv(pos, box=None):
        return _dihedral_phi(pos, idx, box)[0]

    return cv


def com_distance_cv(group_a, group_b, masses=None):
    """CV: distance between the (mass-weighted) centers of two atom
    groups. With PBC the group centers use raw coordinates (groups are
    assumed whole); the center separation is minimum-imaged."""
    ga = jnp.asarray(np.asarray(group_a, dtype=np.int64))
    gb = jnp.asarray(np.asarray(group_b, dtype=np.int64))
    if masses is not None:
        m = np.asarray(masses, dtype=np.float64).reshape(-1)
        wa = jnp.asarray(m[np.asarray(group_a)] / m[np.asarray(group_a)].sum())
        wb = jnp.asarray(m[np.asarray(group_b)] / m[np.asarray(group_b)].sum())
    else:
        wa = jnp.full(len(group_a), 1.0 / len(group_a))
        wb = jnp.full(len(group_b), 1.0 / len(group_b))

    def cv(pos, box=None):
        ca = jnp.sum(pos[ga] * wa[:, None].astype(pos.dtype), axis=0)
        cb = jnp.sum(pos[gb] * wb[:, None].astype(pos.dtype), axis=0)
        dv = wrap_displacement(ca - cb, box)
        return jnp.sqrt(jnp.maximum(jnp.sum(dv * dv), 1e-32))

    return cv


class HarmonicBias:
    """Harmonic restraint on a CV: E = 0.5 k (cv - center)^2 (+ optional
    periodic wrap for angular CVs). Implements the external-potential
    protocol, so it rides inside the jitted scan. One bias per umbrella
    window (the center is baked into the compiled evaluation)."""

    def __init__(self, cv_fn, k, center, periodic=False):
        self.cv_fn = cv_fn
        self.k = float(k)
        self.center = float(center)
        self.periodic = bool(periodic)

    def energy_fn(self, pos, box=None):
        x = self.cv_fn(pos, box) - self.center
        if self.periodic:
            x = x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))
        return 0.5 * self.k * x * x

    def cv_value(self, pos, box=None):
        return self.cv_fn(pos, box)

    def calculate(self, pos, box=None):
        """Batched host-protocol fallback (reference forces.py:321-326).
        The box threads through to the CV so minimum-image CVs behave
        identically to the jitted path."""
        pos = jnp.asarray(pos)
        if box is None:
            e, g = jax.vmap(
                jax.value_and_grad(lambda p: self.energy_fn(p, None))
            )(pos)
        else:
            boxes = jnp.asarray(_boxes_to_diag(box, pos.shape[0]))
            e, g = jax.vmap(
                jax.value_and_grad(self.energy_fn), in_axes=(0, 0)
            )(pos, boxes)
        return np.asarray(e), -np.asarray(g)


def wham(cv_series, centers, k, kT=None, T=300.0, nbins=60, bias_energies
         =None, periodic=False, tol=1e-8, maxiter=10000):
    """1-D weighted-histogram analysis over umbrella windows.

    cv_series: list of 1-D arrays (sampled CV values per window);
    centers/k: the windows' harmonic parameters (k scalar or per-window);
    returns (bin_centers, pmf) with the PMF in kcal/mol, min-shifted to 0.

    Standard self-consistent WHAM (Kumar et al. 1992):
        p_b  = sum_i n_ib / sum_i N_i exp((f_i - w_ib)/kT)
        exp(-f_i/kT) = sum_b p_b exp(-w_ib/kT)
    """
    if kT is None:
        kT = BOLTZMANN * T
    series = [np.asarray(s, dtype=np.float64).reshape(-1) for s in cv_series]
    centers = np.asarray(centers, dtype=np.float64).reshape(-1)
    kk = np.broadcast_to(np.asarray(k, dtype=np.float64), centers.shape)
    if len(series) != len(centers):
        raise ValueError("one CV series per window required")

    lo = min(s.min() for s in series)
    hi = max(s.max() for s in series)
    edges = np.linspace(lo, hi + 1e-12, nbins + 1)
    xb = 0.5 * (edges[:-1] + edges[1:])

    nwin = len(series)
    n_ib = np.stack([np.histogram(s, bins=edges)[0] for s in series])
    N_i = n_ib.sum(axis=1)

    # bias energy of bin b under window i
    dx = xb[None, :] - centers[:, None]
    if periodic:
        dx = dx - 2.0 * np.pi * np.round(dx / (2.0 * np.pi))
    w_ib = 0.5 * kk[:, None] * dx * dx
    if bias_energies is not None:
        w_ib = np.asarray(bias_energies, dtype=np.float64)

    f = np.zeros(nwin)
    num = n_ib.sum(axis=0)  # (nbins,)
    for _ in range(maxiter):
        denom = np.sum(
            N_i[:, None] * np.exp((f[:, None] - w_ib) / kT), axis=0
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where(denom > 0, num / denom, 0.0)
        zi = np.sum(p[None, :] * np.exp(-w_ib / kT), axis=1)
        f_new = -kT * np.log(np.maximum(zi, 1e-300))
        f_new -= f_new[0]
        if np.max(np.abs(f_new - f)) < tol:
            f = f_new
            break
        f = f_new
    denom = np.sum(N_i[:, None] * np.exp((f[:, None] - w_ib) / kT), axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(denom > 0, num / denom, 0.0)
    with np.errstate(divide="ignore"):
        pmf = -kT * np.log(np.maximum(p, 1e-300))
    good = p > 0
    pmf = pmf - pmf[good].min()
    pmf[~good] = np.nan
    return xb, pmf

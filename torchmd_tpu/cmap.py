"""CMAP cross-terms: CHARMM36 coupled dihedral (phi, psi) correction maps.

Capability beyond the reference (torchmd has no CMAP; its CHARMM systems
are limited to the additive bonded terms). The implementation follows the
standard CHARMM/OpenMM formulation: the tabulated grid (typically 24 x 24,
15 degree spacing, kcal/mol) is interpolated with a *periodic bicubic
spline*, giving a C1 energy surface E(phi, psi) whose gradient (and hence
the forces, via JAX autodiff of the dihedral angles) is continuous.

TPU-first split:
  - Host (numpy, once per force field): derivative estimation via periodic
    cubic splines + the 16-coefficient bicubic solve per grid cell ->
    a dense (ntypes, n, n, 4, 4) coefficient table.
  - Device (jit/vmap/grad-safe): per cross-term, two dihedral angles, one
    integer cell locate, one (4, 4) coefficient gather, and a degree-3
    polynomial evaluation. Static shapes throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CMapTable(NamedTuple):
    """Cross-term instances + precomputed bicubic coefficient tables."""

    idx: jnp.ndarray     # (nc, 8) int32 -- atoms of the two dihedrals
    type: jnp.ndarray    # (nc,) int32 -- map index per cross-term
    coeffs: jnp.ndarray  # (ntypes, n, n, 4, 4) bicubic coefficients


# ----------------------------------------------------------------------
# Host-side spline setup (numpy, float64)
# ----------------------------------------------------------------------

def periodic_spline_derivatives(y: np.ndarray, axis: int = -1) -> np.ndarray:
    """First derivatives (in grid-cell units) of a periodic cubic spline
    through uniformly spaced samples along `axis`.

    For the natural periodic cubic spline the nodal derivatives d satisfy
    the cyclic tridiagonal system d[i-1] + 4 d[i] + d[i+1] =
    3 (y[i+1] - y[i-1]).
    """
    y = np.moveaxis(np.asarray(y, dtype=np.float64), axis, -1)
    n = y.shape[-1]
    m = np.zeros((n, n))
    i = np.arange(n)
    m[i, i] = 4.0
    m[i, (i + 1) % n] = 1.0
    m[i, (i - 1) % n] = 1.0
    rhs = 3.0 * (np.roll(y, -1, axis=-1) - np.roll(y, 1, axis=-1))
    d = np.linalg.solve(m, rhs[..., None])[..., 0]
    return np.moveaxis(d, -1, axis)


# Standard bicubic interpolation matrix: A = M F M^T with
# F = [[f00, f01, fu00, fu01], [f10, f11, fu10, fu11],
#      [ft00, ft01, ftu00, ftu01], [ft10, ft11, ftu10, ftu11]]
_M = np.array(
    [[1.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 0.0],
     [-3.0, 3.0, -2.0, -1.0],
     [2.0, -2.0, 1.0, 1.0]]
)


def bicubic_coefficients(grid: np.ndarray) -> np.ndarray:
    """Periodic bicubic spline coefficients for one (n, n) CMAP grid.

    grid[i, j] = E(phi_i, psi_j) with phi_i = -pi + i * 2pi/n (same for
    psi). Returns (n, n, 4, 4) coefficients a such that within cell (i, j)

        E(t, u) = sum_{p,q} a[i, j, p, q] * t**p * u**q,

    t = (phi - phi_i) / h, u = (psi - psi_j) / h in [0, 1).
    """
    f = np.asarray(grid, dtype=np.float64)
    n = f.shape[0]
    if f.shape != (n, n):
        raise ValueError(f"CMAP grid must be square, got {f.shape}")
    ft = periodic_spline_derivatives(f, axis=0)    # dE/dt (cell units)
    fu = periodic_spline_derivatives(f, axis=1)    # dE/du
    ftu = periodic_spline_derivatives(ft, axis=1)  # d2E/dtdu

    def corners(a):
        # (n, n, 2, 2): value at the 4 corners of each cell (periodic)
        a01 = np.roll(a, -1, axis=1)
        a10 = np.roll(a, -1, axis=0)
        a11 = np.roll(a10, -1, axis=1)
        return np.stack(
            [np.stack([a, a01], axis=-1), np.stack([a10, a11], axis=-1)],
            axis=-2,
        )

    cf, cft, cfu, cftu = corners(f), corners(ft), corners(fu), corners(ftu)
    F = np.zeros((n, n, 4, 4))
    F[..., 0:2, 0:2] = cf
    F[..., 0:2, 2:4] = cfu
    F[..., 2:4, 0:2] = cft
    F[..., 2:4, 2:4] = cftu
    return np.einsum("pi,xyij,qj->xypq", _M, F, _M)


def build_cmap_coeff_table(grids) -> np.ndarray:
    """Stack per-type grids into one (ntypes, n, n, 4, 4) coefficient
    table. All grids must share one resolution (CHARMM36 uses 24)."""
    grids = [np.asarray(g, dtype=np.float64) for g in grids]
    n = grids[0].shape[0]
    for g in grids:
        if g.shape != (n, n):
            raise ValueError("All CMAP grids must share one resolution")
    return np.stack([bicubic_coefficients(g) for g in grids])


# ----------------------------------------------------------------------
# Device-side evaluation
# ----------------------------------------------------------------------

def cmap_energy_rows(table: CMapTable, pos, box) -> jnp.ndarray:
    """Per-cross-term CMAP correction energies, shape (nc,).

    Differentiable in `pos` (forces via -grad): the cell index is a
    non-differentiable integer locate, and the in-cell polynomial is
    smooth; C1 continuity across cells comes from the spline setup.
    The per-row form is what the halo path weights by instance
    ownership/visibility (parallel/halo_bonded.py)."""
    from .potentials import _dihedral_phi

    n = table.coeffs.shape[1]
    h = 2.0 * jnp.pi / n
    phi = _dihedral_phi(pos, table.idx[:, 0:4], box)
    psi = _dihedral_phi(pos, table.idx[:, 4:8], box)

    def locate(ang):
        x = (ang + jnp.pi) / h
        cell = jnp.floor(x)
        frac = x - cell
        return jnp.mod(cell.astype(jnp.int32), n), frac

    ci, t = locate(phi)
    cj, u = locate(psi)
    a = table.coeffs[table.type, ci, cj]          # (nc, 4, 4)
    one = jnp.ones_like(t)
    tp = jnp.stack([one, t, t * t, t * t * t], axis=-1)   # (nc, 4)
    up = jnp.stack([one, u, u * u, u * u * u], axis=-1)
    return jnp.einsum("cp,cpq,cq->c", tp, a, up)


def cmap_energy(table: CMapTable, pos, box) -> jnp.ndarray:
    """Total CMAP correction energy (kcal/mol) for one conformation."""
    return jnp.sum(cmap_energy_rows(table, pos, box))

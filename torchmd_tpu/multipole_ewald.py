"""Full Ewald summation for point multipoles (charges + permanent
dipoles + traceless quadrupoles).

Extends the charge-only Ewald module (`torchmd_tpu.ewald`) to the
multipole stack (`torchmd_tpu.multipoles`), completing periodic
electrostatics for AMOEBA-style force fields (the reference has no
Ewald at all and no multipoles, SURVEY.md §2.1; capability beyond it).

The TPU-native design choice mirrors the rest of the multipole stack:
every interaction tier derives from ONE pair operator via nested AD
instead of hand-derived T-tensor tables. With the multipole operator

    L_i = q_i + mu_i . grad_{r_i} + (1/6) Q_i : grad grad_{r_i}

(traceless Jackson convention Q_ab = sum q (3 r_a r_b - r^2 d_ab)), the
energy of a pair under any radial kernel G is E = L_i L_j G(r_i - r_j),
evaluated by two levels of jax.grad/jax.hessian. The Ewald tiers are
then just three kernel choices:

  - real space:  G = erfc(alpha r)/r over non-excluded pairs in the
    cutoff (the erfc tail beyond it is negligible by construction),
  - exclusions:  subtract G = erf(alpha r)/r for masked pairs (the
    reciprocal sum implicitly included their full interaction),
  - self:        E_self_i = -1/2 (L_i L_i G_erf)(0). erf(alpha r)/r is
    an analytic function of r^2, implemented as a Taylor series near 0
    so the SAME nested-AD operator evaluates the r -> 0 limit exactly
    (reproducing -alpha/sqrt(pi) q^2, -2 alpha^3/(3 sqrt(pi)) |mu|^2,
    and the quadrupole constant without hand-derived coefficients).

The reciprocal sum keeps the separable structure-factor formulation
(ewald.py): the multipole-dressed amplitude

    Lambda_j(k) = q_j + i k . mu_j - (1/6) k^T Q_j k

splits into 10 charge-like structure factors (1 monopole + 3 dipole +
6 symmetric quadrupole components), each a per-axis phase-table matmul
contraction on the MXU; they recombine with the k-grid afterwards.

Local frames rotate with the molecular geometry every evaluation
(multipoles.lab_dipoles/lab_quadrupoles), so jax.grad delivers forces
WITH the frame torques, exactly as in the real-space module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ewald import choose_parameters
from .multipoles import MultipoleSpec, lab_dipoles, lab_quadrupoles
from .potentials import ELEC_FACTOR, wrap_displacement


def _g_erfc(alpha):
    """erfc(alpha r)/r as a function of the displacement (r > 0)."""

    def g(d):
        r = jnp.sqrt(jnp.sum(d * d))
        return jax.scipy.special.erfc(alpha * r) / r

    return g


def _g_erf(alpha):
    """erf(alpha r)/r as a smooth function of the displacement.

    Analytic in r^2: erf(x)/x = 2/sqrt(pi) (1 - t/3 + t^2/10 - t^3/42
    + t^4/216 - t^5/1320 + t^6/9360), t = x^2. The series branch keeps
    the function (and its first four derivatives, needed by the
    quad-quad tier) finite and exact at r = 0, which is what lets the
    self energy reuse the generic pair operator."""
    inv_sqrt_pi2 = 2.0 / np.sqrt(np.pi)

    def g(d):
        r2 = jnp.sum(d * d)
        t = (alpha * alpha) * r2
        small = t < 0.25
        # series branch (exact at 0; |error| < 1e-12 for t < 0.25)
        ser = 1.0 + t * (
            -1.0 / 3.0 + t * (1.0 / 10.0 + t * (
                -1.0 / 42.0 + t * (1.0 / 216.0 + t * (
                    -1.0 / 1320.0 + t / 9360.0))))
        )
        e_series = alpha * inv_sqrt_pi2 * ser
        # analytic branch with the double-where guard so its gradient
        # is clean where the series branch is selected
        r2_safe = jnp.where(small, 1.0, r2)
        r_safe = jnp.sqrt(r2_safe)
        e_exact = jax.scipy.special.erf(alpha * r_safe) / r_safe
        return jnp.where(small, e_series, e_exact)

    return g


def _apply_site(f, q, mu, Q, sign):
    """g(d) = (q + sign * mu . grad + (1/6) Q : grad grad) f(d).

    `sign` encodes which end of the pair the moments sit on: with
    d = r_i - r_j, grad_{r_i} = +grad_d and grad_{r_j} = -grad_d (the
    quadrupole term is even, so the sign cancels there)."""

    def g(d):
        out = q * f(d)
        out = out + sign * jnp.dot(mu, jax.grad(f)(d))
        if Q is not None:
            out = out + jnp.einsum("ab,ab->", Q, jax.hessian(f)(d)) / 6.0
        return out

    return g


def pair_interaction(kernel, d, qi, mui, Qi, qj, muj, Qj):
    """E = L_i L_j kernel(d) for one pair, d = r_i - r_j (no EF)."""
    g = _apply_site(kernel, qj, muj, Qj, -1.0)
    return _apply_site(g, qi, mui, Qi, +1.0)(d)


def _self_energy(kernel, q, mu, Q):
    """-1/2 (L L' kernel)(0) per site (vmapped by the caller)."""
    zero = jnp.zeros(3, q.dtype if hasattr(q, "dtype") else None)
    return -0.5 * pair_interaction(kernel, zero, q, mu, Q, q, mu, Q)


class MultipoleEwald:
    """External-potential object: full Ewald electrostatics for a
    topology with charges everywhere and dipoles/quadrupoles on
    `spec.sites` (local frames re-evaluated every call).

    Replaces BOTH the point-charge electrostatics term and the
    real-space `Multipoles` object for periodic systems: build `Forces`
    without 'electrostatics' in the terms and pass this as `external`.

    box0: the (3,) box used to pick alpha and the k-space extent
    (static, like ewald.EwaldRecip); the energy itself follows the
    traced box. Cost note: the real-space tier evaluates the nested-AD
    operator on the dense masked pair block -- the validation tier for
    AMOEBA-scale systems (hundreds to a few thousand atoms), not the
    large-N production path.
    """

    def __init__(self, spec: MultipoleSpec, charges, box0, cutoff,
                 tol=1e-5):
        if spec.cutoff is not None and float(spec.cutoff) != float(cutoff):
            raise ValueError(
                "spec.cutoff and the Ewald cutoff disagree; build the "
                "spec with cutoff=None (the Ewald real-space cutoff "
                "applies here)"
            )
        self.spec = spec
        self.charges = jnp.asarray(charges)
        self.cutoff = float(cutoff)
        self.cfg = choose_parameters(np.asarray(box0), cutoff, tol)
        kx, ky, kz = self.cfg.kmax
        self._nx = jnp.arange(-kx, kx + 1)
        self._ny = jnp.arange(-ky, ky + 1)
        self._nz = jnp.arange(-kz, kz + 1)
        n = int(self.charges.shape[0])
        mask = np.asarray(spec.nb_mask)
        iu, ju = np.triu_indices(n, 1)
        excl = ~mask[iu, ju]
        self._excl_pairs = (
            np.stack([iu[excl], ju[excl]], 1).astype(np.int32)
            if excl.any() else None
        )

    # -- moment assembly -------------------------------------------------
    def _moments(self, pos, box):
        dtype = pos.dtype
        n = self.charges.shape[0]
        q = self.charges.astype(dtype)
        mu = jnp.zeros((n, 3), dtype)
        mu = mu.at[self.spec.sites].set(
            lab_dipoles(self.spec, pos, box).astype(dtype)
        )
        if self.spec.quad_local is not None:
            Q = jnp.zeros((n, 3, 3), dtype)
            Q = Q.at[self.spec.sites].set(
                lab_quadrupoles(self.spec, pos, box).astype(dtype)
            )
        else:
            Q = None
        return q, mu, Q

    # -- tiers -----------------------------------------------------------
    def _real_plus_corrections(self, pos, box, q, mu, Q, alpha):
        dtype = pos.dtype
        n = q.shape[0]
        g_erfc = _g_erfc(alpha)
        g_erf = _g_erf(alpha)

        def pair_e(kernel, d, i, j):
            Qi = None if Q is None else Q[i]
            Qj = None if Q is None else Q[j]
            return pair_interaction(kernel, d, q[i], mu[i], Qi,
                                    q[j], mu[j], Qj)

        # dense masked upper-triangle block, erfc within the cutoff
        iu, ju = jnp.triu_indices(n, 1)
        dv = wrap_displacement(pos[iu] - pos[ju], box)
        d2 = jnp.sum(dv * dv, axis=-1)
        m_real = self.spec.nb_mask[iu, ju] & (d2 <= self.cutoff**2)
        dv_safe = jnp.where(m_real[:, None], dv, 1.0)
        e_pairs = jax.vmap(
            lambda d, i, j: pair_e(g_erfc, d, i, j)
        )(dv_safe, iu, ju)
        e_real = jnp.sum(jnp.where(m_real, e_pairs, 0.0))

        # excluded pairs: remove the erf part the reciprocal sum added
        e_excl = jnp.zeros((), dtype)
        if self._excl_pairs is not None:
            ei = jnp.asarray(self._excl_pairs[:, 0])
            ej = jnp.asarray(self._excl_pairs[:, 1])
            dve = wrap_displacement(pos[ei] - pos[ej], box)
            e_excl = -jnp.sum(
                jax.vmap(lambda d, i, j: pair_e(g_erf, d, i, j))(
                    dve, ei, ej
                )
            )

        # self: the generic operator at d = 0 on the smooth erf kernel
        e_self = jnp.sum(
            jax.vmap(
                lambda i: _self_energy(
                    g_erf, q[i], mu[i], None if Q is None else Q[i]
                )
            )(jnp.arange(n))
        )
        return e_real + e_excl + e_self

    def _reciprocal(self, pos, box, q, mu, Q, alpha):
        dtype = pos.dtype
        V = box[0] * box[1] * box[2]
        ctype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        two_pi = 2.0 * jnp.pi

        def phase(coords, nvec, L):
            ang = (two_pi / L) * jnp.outer(coords, nvec.astype(dtype))
            return jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(ctype)

        Ax = phase(pos[:, 0], self._nx, box[0])
        Ay = phase(pos[:, 1], self._ny, box[1])
        Az = phase(pos[:, 2], self._nz, box[2])

        def sfac(w):
            """Charge-like structure factor for per-atom weights w."""
            wAx = Ax * w.astype(ctype)[:, None]
            Wxy = jnp.einsum("jx,jy->xyj", wAx, Ay)
            return (Wxy.reshape(-1, pos.shape[0]) @ Az).reshape(-1)

        kx = (two_pi / box[0]) * self._nx.astype(dtype)
        ky = (two_pi / box[1]) * self._ny.astype(dtype)
        kz = (two_pi / box[2]) * self._nz.astype(dtype)
        kvec = jnp.stack(
            jnp.meshgrid(kx, ky, kz, indexing="ij"), axis=-1
        ).reshape(-1, 3)                                  # (K, 3)
        k2 = jnp.sum(kvec * kvec, axis=-1)

        S = sfac(q)
        # dipole tier: + i k . S_mu
        for a in range(3):
            S = S + 1j * kvec[:, a].astype(ctype) * sfac(mu[:, a])
        # quadrupole tier: - (1/6) k^T S_Q k
        if Q is not None:
            for a in range(3):
                for b in range(3):
                    S = S - (1.0 / 6.0) * (
                        kvec[:, a] * kvec[:, b]
                    ).astype(ctype) * sfac(Q[:, a, b])

        k2_safe = jnp.where(k2 > 0, k2, 1.0)
        pref = jnp.where(
            k2 > 0, jnp.exp(-k2_safe / (4.0 * alpha**2)) / k2_safe, 0.0
        )
        e_recip = (
            (two_pi / V) * jnp.sum(pref * (S.real**2 + S.imag**2))
        )
        # net-charge (tinfoil) term: dipoles/quadrupoles carry no k=0
        qtot = jnp.sum(q)
        e_net = -jnp.pi / (2.0 * V * alpha**2) * qtot * qtot
        return e_recip + e_net

    # -- protocol --------------------------------------------------------
    def energy_with_moments(self, pos, box, q, mu, Q, alpha=None):
        """All four Ewald tiers (real erfc + exclusion + self +
        reciprocal) for EXPLICIT per-atom moments, in raw Gaussian
        units (no ELEC_FACTOR). Quadratic in (q, mu, Q) -- the
        polarization solver exploits this by injecting induced dipoles
        on top of the permanent moments (amoeba.AmoebaPolarizationEwald)
        and reading fields/couplings off with AD."""
        dtype = pos.dtype
        box = jnp.asarray(box, dtype).reshape(-1)[:3]
        if alpha is None:
            alpha = jnp.asarray(self.cfg.alpha, dtype)
        e = self._real_plus_corrections(pos, box, q, mu, Q, alpha)
        return e + self._reciprocal(pos, box, q, mu, Q, alpha)

    def energy_fn(self, pos, box=None):
        if box is None:
            raise ValueError("MultipoleEwald needs a periodic box")
        dtype = pos.dtype
        box = jnp.asarray(box, dtype).reshape(-1)[:3]
        q, mu, Q = self._moments(pos, box)
        return ELEC_FACTOR * self.energy_with_moments(pos, box, q, mu, Q)

    def calculate(self, pos, box=None):
        """Batched host-protocol fallback (reference forces.py:321-326)."""
        from .cv import _boxes_to_diag

        pos = jnp.asarray(pos)
        boxes = jnp.asarray(_boxes_to_diag(box, pos.shape[0]))
        e, g = jax.vmap(
            jax.value_and_grad(self.energy_fn), in_axes=(0, 0)
        )(pos, boxes)
        return np.asarray(e), -np.asarray(g)


class MultipolePme(MultipoleEwald):
    """Particle-mesh Ewald for point multipoles: MultipoleEwald with the
    O(N * K^3) structure-factor reciprocal sum replaced by derivative
    B-spline spreading + one 3-D FFT, O(N * p^3 + K^3 log K).

    A point multipole's charge density is the multipole operator applied
    to a delta:  rho_j = [q_j + mu_j . grad_{r_j}
    + (1/6) Q_j : grad grad_{r_j}] delta(r - r_j). PME approximates the
    delta by the B-spline kernel, so the multipole mesh is the SAME
    operator applied to the spreading weights -- per-axis (M, M', M'')
    spline taps from forward AD of the Cox-de Boor recursion
    (ewald.bspline_weights_d2: no hand-derived derivative tables), and
    the ten moment components become ten separable tap products folded
    into ONE combined-coefficient scatter (same N*p^3 scatter cost as
    charge-only PME). The Euler |b(m)|^2 factors, Gaussian influence
    function and tinfoil net-charge term are unchanged -- derivative
    spreading uses the same interpolation basis, so the same
    b2-correction applies to every tier (Essmann et al. 1995, sec. 4;
    the AMOEBA PME of Sagui, Pedersen & Darden, JCP 120:73, 2004).

    Real-space / exclusion / self tiers and the `energy_fn`/`calculate`
    protocol are inherited. Accuracy vs the exact reciprocal sum is set
    by the spline order and mesh spacing; the quadrupole tier spreads
    SECOND-derivative taps, which cost two effective spline orders, so
    the default is order 8 (~order-6-accurate on quadrupoles; water
    dimer total-energy error 6e-5 kcal/mol at spacing 0.8 vs 5e-4 for
    order 6 -- pinned by tests/test_multipole_ewald.py)."""

    def __init__(self, spec: MultipoleSpec, charges, box0, cutoff,
                 tol=1e-5, order=8, spacing=0.8):
        super().__init__(spec, charges, box0, cutoff, tol)
        from .ewald import bspline_b2, pme_mesh_shape

        self.order = int(order)
        self.kmesh = pme_mesh_shape(self.cfg.kmax, box0, spacing)
        self._b2 = tuple(
            jnp.asarray(bspline_b2(K, self.order), jnp.float64)
            for K in self.kmesh
        )

    def _reciprocal(self, pos, box, q, mu, Q, alpha):
        from .ewald import bspline_weights_d2

        dtype = pos.dtype
        n = self.order
        Kx, Ky, Kz = self.kmesh
        V = box[0] * box[1] * box[2]
        two_pi = 2.0 * jnp.pi
        N = pos.shape[0]

        Ks = jnp.asarray([Kx, Ky, Kz], dtype)
        u = pos / box
        u = (u - jnp.floor(u)) * Ks             # scaled coords in [0, K)
        base = jnp.floor(u)                     # zero-gradient (floor)
        frac = u - base
        w, dw, d2w = bspline_weights_d2(frac, n)    # (N, 3, n) each
        scale = Ks / box                        # du/dx per axis
        # per-axis tap stacks: value, d/dx, d^2/dx^2 (chain rule through
        # u = x * K / L; base is piecewise constant so AD sees only frac)
        s1 = scale[None, :, None]
        V3 = jnp.stack([w, dw * s1, d2w * s1 * s1], axis=0)  # (3, N, 3, n)

        # ten separable products: (ax-deriv, ay-deriv, az-deriv, coeff)
        terms = [
            (0, 0, 0, q),
            (1, 0, 0, mu[:, 0]), (0, 1, 0, mu[:, 1]), (0, 0, 1, mu[:, 2]),
        ]
        if Q is not None:
            terms += [
                (2, 0, 0, Q[:, 0, 0] / 6.0),
                (0, 2, 0, Q[:, 1, 1] / 6.0),
                (0, 0, 2, Q[:, 2, 2] / 6.0),
                (1, 1, 0, Q[:, 0, 1] / 3.0),
                (1, 0, 1, Q[:, 0, 2] / 3.0),
                (0, 1, 1, Q[:, 1, 2] / 3.0),
            ]
        coef = None
        for (a, b, c, cf) in terms:
            t = (
                cf[:, None, None, None]
                * V3[a][:, 0, :, None, None]
                * V3[b][:, 1, None, :, None]
                * V3[c][:, 2, None, None, :]
            )
            coef = t if coef is None else coef + t

        idx = (
            base[..., None].astype(jnp.int32)
            - jnp.arange(n, dtype=jnp.int32)
        )
        idx = jnp.mod(
            idx, jnp.asarray([Kx, Ky, Kz], jnp.int32)[None, :, None]
        )
        ix, iy, iz = idx[:, 0, :], idx[:, 1, :], idx[:, 2, :]
        flat = (
            (ix[:, :, None, None] * Ky + iy[:, None, :, None]) * Kz
            + iz[:, None, None, :]
        ).reshape(-1)
        mesh = jax.ops.segment_sum(
            coef.reshape(-1), flat, num_segments=Kx * Ky * Kz
        ).reshape(Kx, Ky, Kz)

        Sk = jnp.fft.fftn(mesh.astype(
            jnp.float64 if dtype == jnp.float64 else jnp.float32
        ))

        def kvec(K, L):
            m = jnp.fft.fftfreq(K, d=1.0 / K).astype(dtype)
            return (two_pi / L) * m

        kx, ky, kz = kvec(Kx, box[0]), kvec(Ky, box[1]), kvec(Kz, box[2])
        k2 = (
            kx[:, None, None] ** 2 + ky[None, :, None] ** 2
            + kz[None, None, :] ** 2
        )
        k2_safe = jnp.where(k2 > 0, k2, 1.0)
        pref = jnp.where(
            k2 > 0, jnp.exp(-k2_safe / (4.0 * alpha**2)) / k2_safe, 0.0
        )
        bx, by, bz = self._b2
        b2 = (
            bx[:, None, None] * by[None, :, None] * bz[None, None, :]
        ).astype(dtype)
        s2 = (Sk.real**2 + Sk.imag**2).astype(dtype)
        e_recip = (two_pi / V) * jnp.sum(pref * b2 * s2)

        qtot = jnp.sum(q)
        e_net = -jnp.pi / (2.0 * V * alpha**2) * qtot * qtot
        return e_recip + e_net

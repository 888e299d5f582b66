"""Alchemical free-energy machinery: soft-core decoupling, TI and FEP/BAR.

Capability beyond the reference (torchmd has no alchemical support). The
design exploits the functional core: the coupling energy is a pure
function of (positions, box, lambda), so

  - dU/dlambda is one `jax.grad` (thermodynamic integration),
  - re-evaluating stored frames at neighboring lambdas is one vmap (FEP /
    BAR), and
  - the term folds into the jitted integrator scan through the standard
    `energy_fn` external-potential protocol (forces.py:17-21), composing
    with every kernel path.

Scheme (standard decoupling): alchemical atoms keep their intramolecular
interactions; only the CROSSING pairs (alchemical x environment) are
lambda-coupled with Beutler soft-core LJ

    E_lj = 4 eps lam [ (alpha (1-lam) + (r/sigma)^6)^-2
                       - (alpha (1-lam) + (r/sigma)^6)^-1 ]

and linearly scaled electrostatics (same cutoff/RFA settings as the base
force field). `make_alchemical` removes the crossing pairs from the base
nonbonded mask and returns the coupling object to attach as `external`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import ELEC_FACTOR, wrap_displacement


class AlchemicalCoupling:
    """Lambda-coupled crossing-pair interactions (soft-core LJ + scaled
    electrostatics). Implements the external-potential protocol
    (`energy_fn(pos, box) -> scalar`), so `Forces(..., external=coupling)`
    folds it into the jitted evaluation and forces come from AD."""

    def __init__(self, ffparams, cfg, alch_atoms, lam=1.0, alpha=0.5,
                 softcore_power=1, env_atoms=None):
        natoms = int(ffparams.charges.shape[0])
        alch = np.zeros(natoms, dtype=bool)
        alch[np.asarray(alch_atoms, dtype=np.int64)] = True
        if env_atoms is None:
            env = ~alch
        else:
            # explicit environment selection (multi-site lambda-dynamics:
            # other sites' atoms are neither alch nor env for this site)
            env = np.zeros(natoms, dtype=bool)
            env[np.asarray(env_atoms, dtype=np.int64)] = True
            if np.any(env & alch):
                raise ValueError("env_atoms overlap alch_atoms")
        self.alch_idx = jnp.asarray(np.flatnonzero(alch), jnp.int32)
        self.env_idx = jnp.asarray(np.flatnonzero(env), jnp.int32)
        self.lam = float(lam)
        self.alpha = float(alpha)
        self.softcore_power = int(softcore_power)
        self.cfg = cfg

        # static per-pair tables on the (n_alch, n_env) crossing block
        nb_mask = np.asarray(ffparams.nb_mask)
        self.pair_mask = jnp.asarray(
            nb_mask[np.ix_(np.flatnonzero(alch), np.flatnonzero(env))]
        )
        q = np.asarray(ffparams.charges)
        self.qq = jnp.asarray(
            ELEC_FACTOR * q[np.flatnonzero(alch)][:, None]
            * q[np.flatnonzero(env)][None, :]
        )
        ti = np.asarray(ffparams.mapped_atom_types)
        ta = ti[np.flatnonzero(alch)]
        te = ti[np.flatnonzero(env)]
        if ffparams.lj_ab is not None:
            # NBFIX override tables: recover per-pair sigma^6/eps from the
            # A/B the base path would have used (A = 4 eps sig^12,
            # B = 4 eps sig^6), so lam=1 reproduces the base system
            # exactly even for NBFIX-affected crossing pairs
            A = np.asarray(ffparams.lj_ab[0])[ta[:, None], te[None, :]]
            B = np.asarray(ffparams.lj_ab[1])[ta[:, None], te[None, :]]
            safe_B = np.where(B > 0, B, 1.0)
            sig6 = np.where(B > 0, A / safe_B, 1.0)
            eps = np.where(B > 0, B * B / np.maximum(4.0 * A, 1e-300), 0.0)
        else:
            lj = np.asarray(ffparams.lj_params)
            s_at, e_at = lj[ti, 0], np.abs(lj[ti, 1])
            sig = 0.5 * (s_at[ta][:, None] + s_at[te][None, :])
            eps = np.sqrt(e_at[ta][:, None] * e_at[te][None, :])
            sig6 = sig**6
        self.sigma6 = jnp.asarray(sig6)
        self.eps = jnp.asarray(eps)

    # ------------------------------------------------------------------
    def energy_lambda(self, pos, box, lam):
        """Crossing-pair coupling energy at coupling parameter lam
        (lam=1 fully coupled, lam=0 decoupled). Differentiable in both
        pos (forces) and lam (TI)."""
        cfg = self.cfg
        dtype = pos.dtype
        lam = jnp.asarray(lam, dtype)
        dv = pos[self.alch_idx][:, None, :] - pos[self.env_idx][None, :, :]
        dv = wrap_displacement(dv, box)
        d2 = jnp.sum(dv * dv, axis=-1)
        mask = self.pair_mask
        if cfg.cutoff is not None:
            mask = jnp.logical_and(mask, d2 <= cfg.cutoff * cfg.cutoff)
        fmask = mask.astype(dtype)
        d2 = jnp.where(mask, d2, 1.0)

        # Beutler soft-core LJ
        lam_sc = lam**self.softcore_power
        denom = self.alpha * (1.0 - lam) + (d2 * d2 * d2) / self.sigma6
        inv = 1.0 / denom
        e_lj = 4.0 * self.eps * lam_sc * (inv * inv - inv)
        if cfg.switch_dist is not None and cfg.cutoff is not None:
            dist = jnp.sqrt(d2)
            t = (dist - cfg.switch_dist) / (cfg.cutoff - cfg.switch_dist)
            sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
            e_lj = jnp.where(dist > cfg.switch_dist, e_lj * sw, e_lj)

        # linearly scaled electrostatics on the SOFT-CORE distance
        # r_sc = (alpha (1-lam) sigma^6 + r^6)^(1/6): finite at overlap,
        # exactly r at lam=1; same cutoff treatment as the base config
        d6_sc = denom * self.sigma6
        dist = d6_sc ** (1.0 / 6.0)
        rinv = 1.0 / dist
        if cfg.ewald_alpha is not None:
            pot_e = self.qq * jax.scipy.special.erfc(
                cfg.ewald_alpha * dist) * rinv
        elif cfg.rfa and cfg.cutoff is not None:
            den = 2.0 * cfg.solvent_dielectric + 1.0
            krf = (1.0 / cfg.cutoff**3) * (cfg.solvent_dielectric - 1.0) / den
            crf = (1.0 / cfg.cutoff) * (3.0 * cfg.solvent_dielectric) / den
            pot_e = self.qq * (rinv + krf * dist * dist - crf)
        else:
            pot_e = self.qq * rinv
        e_elec = lam * pot_e
        return jnp.sum((e_lj + e_elec) * fmask)

    def energy_fn(self, pos, box):
        """External-potential protocol: energy at the current lambda."""
        return self.energy_lambda(pos, box, self.lam)

    def dudl(self, pos, box, lam=None):
        """dU/dlambda at (pos, box) -- the TI integrand sample."""
        lam = self.lam if lam is None else lam
        return jax.grad(
            lambda l: self.energy_lambda(pos, box, l)
        )(jnp.asarray(lam, pos.dtype))

    def energies_over_frames(self, frames, boxes, lam):
        """Coupling energy of stored frames re-evaluated at `lam` (one
        vmap) -- the FEP/BAR building block."""
        return jax.vmap(
            lambda p, b: self.energy_lambda(p, b, lam)
        )(frames, boxes)


def _require_masked_nonbonded(forces):
    """Alchemical constructions edit the dense nb_mask; the cell path
    masks pairs only via the bonds/angles/1-4 exclusion table and would
    silently double-count every crossing pair. Guard on the raw size
    trigger (cell_auto_size), not the current cell_auto — the box
    resolver can re-enable the cell path later — and mark the mask as
    authoritative so auto-selection never flips back."""
    if getattr(forces, "cell_requested", False) or getattr(
        forces, "cell_auto_size", getattr(forces, "cell_auto", False)
    ):
        raise NotImplementedError(
            "alchemical coupling requires a nonbonded path driven by the "
            "dense mask (dense/Pallas/verlet); the cell-list kernel does "
            "not consult nb_mask and would double-count crossing pairs"
        )
    # the edited mask is now load-bearing: forbid any later switch to
    # the cell path, and drop a previously built verlet kernel (it holds
    # the pre-edit FFParams)
    forces._nb_mask_authoritative = True
    if getattr(forces, "_verlet_kernel", None) is not None:
        forces._verlet_kernel = None


def make_alchemical(forces, alch_atoms, lam=1.0, alpha=0.5,
                    softcore_power=1):
    """Turn a built `Forces` object into an alchemically coupled system.

    Removes the crossing pairs from the base nonbonded mask (they would
    double-count), rebuilds the evaluators, attaches the coupling as the
    external potential, and returns it. The base intra-alchemical and
    intra-environment interactions are untouched."""
    _require_masked_nonbonded(forces)
    coupling = AlchemicalCoupling(
        forces.ffparams, forces.config, alch_atoms, lam=lam, alpha=alpha,
        softcore_power=softcore_power,
    )
    mask = np.asarray(forces.ffparams.nb_mask).copy()
    ai = np.asarray(coupling.alch_idx)
    ei = np.asarray(coupling.env_idx)
    mask[np.ix_(ai, ei)] = False
    mask[np.ix_(ei, ai)] = False
    forces.ffparams = forces.ffparams._replace(nb_mask=jnp.asarray(mask))
    forces.external = coupling
    forces._build_evaluators()
    return coupling


# ----------------------------------------------------------------------
# Free-energy estimators (host-side numpy; inputs in kcal/mol)
# ----------------------------------------------------------------------

def ti_integrate(lambdas, dudl_means):
    """Thermodynamic integration: trapezoid over <dU/dlambda>(lambda)."""
    lambdas = np.asarray(lambdas, np.float64)
    dudl_means = np.asarray(dudl_means, np.float64)
    order = np.argsort(lambdas)
    return float(np.trapezoid(dudl_means[order], lambdas[order]))


def fep_exponential(du, kT):
    """Zwanzig exponential averaging: dF = -kT ln <exp(-dU/kT)>."""
    du = np.asarray(du, np.float64) / kT
    m = du.min()
    return float(kT * (m - np.log(np.mean(np.exp(-(du - m))))))


def bar(w_f, w_r, kT, tol=1e-10, maxiter=500):
    """Bennett acceptance ratio for forward work w_f (0->1) and reverse
    work w_r (1->0), both in kcal/mol. Returns dF (kcal/mol); solves the
    self-consistent BAR equation by bisection on dF."""
    w_f = np.asarray(w_f, np.float64) / kT
    w_r = np.asarray(w_r, np.float64) / kT
    n_f, n_r = len(w_f), len(w_r)
    M = np.log(n_f / n_r)

    def fermi(x):
        return 1.0 / (1.0 + np.exp(np.clip(x, -500, 500)))

    def resid(df):
        return (
            np.log(np.sum(fermi(M + w_f - df)) + 1e-300)
            - np.log(np.sum(fermi(-M + w_r + df)) + 1e-300)
        )

    lo, hi = -1e4, 1e4
    r_lo = resid(lo)
    for _ in range(maxiter):
        mid = 0.5 * (lo + hi)
        r = resid(mid)
        if abs(r) < tol or (hi - lo) < tol:
            return float(mid * kT)
        if (r > 0) == (r_lo > 0):
            lo, r_lo = mid, r
        else:
            hi = mid
    return float(0.5 * (lo + hi) * kT)

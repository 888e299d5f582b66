"""Drude-oscillator polarizable force fields (classical induced dipoles).

Capability beyond the reference (fixed-charge only). Each polarizable
atom gets an auxiliary "Drude" particle tied to its core by a harmonic
spring; the displaced charge pair is a classical induced dipole with

    alpha = ELEC_FACTOR * q_D^2 / (2 k0)          (q_D < 0 by convention)

in this package's units (energies kcal/mol, distances A, charges e,
spring E = k0 d^2 -- the same convention as the bonds term). The
construction extends an existing `FFParams` pytree in place of building a
new topology:

  - core charge q_i - q_D, Drude charge q_D (total charge preserved),
  - mass m_D transferred from the parent (CHARMM-style 0.4 amu),
  - a bonds-table spring row (k0 = k_drude, r0 = 0) per oscillator,
  - the Drude row of the nonbonded mask inherits the parent's exclusions
    (plus core-Drude and Drude-Drude of excluded parents),
  - Thole dipole-dipole screening between bonded-neighbor (excluded)
    polarizable pairs: the four charge-pair interactions of the two
    dipoles, each damped by S(u) = 1 - (1 + u/2) exp(-u),
    u = a r / (alpha_i alpha_j)^(1/6)  (Thole 1981; CHARMM Drude-2013).

Dynamics: `DrudeIntegrator` runs velocity Verlet with the standard
dual-Langevin scheme (Lamoureux & Roux, J. Chem. Phys. 119, 3025 (2003)):
the center of mass of each core-Drude pair couples to the physical bath
(T, gamma) while the relative coordinate couples to a cold bath
(T_drude ~ 1 K, gamma_drude) so the oscillators stay near the adiabatic
(SCF) surface. `scf_drude` relaxes the Drude coordinates exactly for
validation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import (
    ELEC_FACTOR,
    FFParams,
    TermTable,
    compute_potentials,
    wrap_displacement,
)
from .integrator import TIMEFACTOR, kinetic_to_temp
from .systems import SimState
from .units import BOLTZMANN, PICOSEC2TIMEU


class DrudeSpec(NamedTuple):
    core_idx: jnp.ndarray     # (npol,) int32 -- parent atom rows
    drude_idx: jnp.ndarray    # (npol,) int32 -- appended particle rows
    q_drude: jnp.ndarray      # (npol,) Drude charges (negative)
    alpha: jnp.ndarray        # (npol,) polarizabilities (A^3)
    m_core: jnp.ndarray       # (npol,) reduced core masses
    m_drude: float
    k_drude: float
    # Thole screening pairs: indices INTO THE POLARIZABLE LIST (not atom
    # rows) of bonded-neighbor dipole pairs + the damping coefficient
    # a / (alpha_i alpha_j)^(1/6) per pair.
    thole_i: Optional[jnp.ndarray]   # (npairs,) int32
    thole_j: Optional[jnp.ndarray]
    thole_coeff: Optional[jnp.ndarray]
    # NBTHOLE: pair-specific screening of NONBONDED oscillator pairs
    # (CHARMM Drude-2013 .prm NBTHOLE section, typically ion-water).
    # Same index convention; the energy term is the damping CORRECTION
    # -(1 + u/2) e^-u qq/r on top of the bare Coulomb the nonbonded
    # path already counts (bonded-excluded Thole pairs instead ADD the
    # full screened interaction, thole_energy).
    nbthole_i: Optional[jnp.ndarray] = None
    nbthole_j: Optional[jnp.ndarray] = None
    nbthole_coeff: Optional[jnp.ndarray] = None


def make_drude_ffparams(ffp: FFParams, alpha, k_drude=500.0, m_drude=0.4,
                        thole=2.6, thole_atom=None, nbthole_pairs=None):
    """Extend `ffp` with Drude particles for every atom with alpha > 0.

    alpha: (natoms,) polarizabilities in A^3 (0 = non-polarizable).
    thole: default pair damping factor; `thole_atom` optionally gives
    per-atom factors a_i (NaN = default/2) combined as
    u = (a_i + a_j) r / (alpha_i alpha_j)^(1/6).
    nbthole_pairs: optional (m, 3) rows (atom_i, atom_j, a) of
    pair-specific screening for NONBONDED oscillator pairs (CHARMM
    NBTHOLE; resolve type pairs to atoms with `charmm_nbthole_pairs`);
    the pair a REPLACES a_i + a_j and u = a r / (alpha_i alpha_j)^(1/6).
    Returns (ffp_ext, spec). Positions must be extended with
    `init_drude_positions`; energies evaluated with `drude_energy`.
    """
    n = int(ffp.charges.shape[0])
    alpha = np.asarray(alpha, np.float64).reshape(n)
    if np.any(alpha < 0):
        raise ValueError("polarizabilities must be >= 0")
    pol = np.flatnonzero(alpha > 0)
    npol = len(pol)
    if npol == 0:
        raise ValueError("no polarizable atoms (all alpha == 0)")
    if ffp.nb_mask is None:
        raise ValueError("Drude construction needs the dense nonbonded mask")

    q = np.asarray(ffp.charges, np.float64)
    masses = np.asarray(ffp.masses, np.float64).reshape(n)
    if np.any(masses[pol] <= m_drude):
        raise ValueError("parent masses must exceed the Drude mass")
    # alpha = ELEC_FACTOR q_D^2 / (2 k0)  ->  q_D = -sqrt(2 k0 alpha / EF)
    q_d = -np.sqrt(2.0 * k_drude * alpha[pol] / ELEC_FACTOR)

    drude_rows = n + np.arange(npol)
    charges_ext = np.concatenate([q, q_d])
    charges_ext[pol] = q[pol] - q_d
    masses_ext = np.concatenate([masses, np.full(npol, m_drude)])
    masses_ext[pol] = masses[pol] - m_drude

    # LJ: Drude particles are pure charges -- a fresh zero-epsilon type
    ti = np.asarray(ffp.mapped_atom_types)
    ntypes = int(ti.max()) + 1 if len(ti) else 0
    types_ext = np.concatenate([ti, np.full(npol, ntypes, ti.dtype)])
    lj_params = ffp.lj_params
    lj_ext = None
    if lj_params is not None:
        lj_ext = np.concatenate(
            [np.asarray(lj_params), [[1.0, 0.0]]], axis=0
        )
    lj_ab_ext = None
    if ffp.lj_ab is not None:
        A, B = (np.asarray(t) for t in ffp.lj_ab)
        A2 = np.zeros((ntypes + 1, ntypes + 1), A.dtype)
        B2 = np.zeros_like(A2)
        A2[:ntypes, :ntypes] = A
        B2[:ntypes, :ntypes] = B
        lj_ab_ext = (jnp.asarray(A2), jnp.asarray(B2))

    # nonbonded mask: Drude rows inherit the parent's pattern
    mask = np.asarray(ffp.nb_mask)
    mask_ext = np.zeros((n + npol, n + npol), bool)
    mask_ext[:n, :n] = mask
    mask_ext[n:, :n] = mask[pol, :]
    mask_ext[:n, n:] = mask[:, pol]
    mask_ext[n:, n:] = mask[np.ix_(pol, pol)]
    # core-Drude of the SAME oscillator never interacts nonbonded
    mask_ext[pol, drude_rows] = False
    mask_ext[drude_rows, pol] = False
    np.fill_diagonal(mask_ext, False)

    # spring rows appended to the bonds table (E = k0 d^2, r0 = 0)
    spring_idx = np.stack([pol, drude_rows], axis=1).astype(np.int32)
    spring_param = np.asarray([[k_drude, 0.0]])
    if ffp.bonds is not None:
        b = ffp.bonds
        nb_inst = int(b.idx.shape[0])
        nrows = int(b.params.shape[0])
        bonds_ext = TermTable(
            idx=jnp.concatenate([b.idx, jnp.asarray(spring_idx)]),
            map_term=jnp.concatenate([
                b.map_term,
                jnp.arange(nb_inst, nb_inst + npol, dtype=b.map_term.dtype),
            ]),
            map_param=jnp.concatenate([
                b.map_param,
                jnp.full(npol, nrows, b.map_param.dtype),
            ]),
            params=jnp.concatenate([
                b.params, jnp.asarray(spring_param, b.params.dtype)
            ]),
        )
    else:
        bonds_ext = TermTable(
            idx=jnp.asarray(spring_idx),
            map_term=jnp.arange(npol, dtype=jnp.int32),
            map_param=jnp.zeros(npol, jnp.int32),
            params=jnp.asarray(spring_param),
        )

    # Thole pairs: bonded-neighbor (excluded) polarizable pairs
    sub = ~mask[np.ix_(pol, pol)]
    tp = np.argwhere(np.triu(sub, 1))
    ti_ = tp[:, 0].tolist()
    tj_ = tp[:, 1].tolist()
    a_at = np.full(n, thole / 2.0)
    if thole_atom is not None:
        ta = np.asarray(thole_atom, np.float64).reshape(n)
        a_at = np.where(np.isnan(ta), a_at, ta)
    pair_a = a_at[pol[tp[:, 0]]] + a_at[pol[tp[:, 1]]]
    tc_ = (
        pair_a / (alpha[pol[tp[:, 0]]] * alpha[pol[tp[:, 1]]]) ** (1.0 / 6.0)
    ).tolist()

    # NBTHOLE: nonbonded pair-specific screening (skip non-polarizable
    # atoms and bonded-excluded pairs -- those carry the standard Thole)
    pol_of_atom = np.full(n, -1)
    pol_of_atom[pol] = np.arange(npol)
    excl_set = set(zip(ti_, tj_))
    nbi_, nbj_, nbc_ = [], [], []
    if nbthole_pairs is not None:
        for ai, aj, a_pair in nbthole_pairs:
            pi, pj = pol_of_atom[int(ai)], pol_of_atom[int(aj)]
            if pi < 0 or pj < 0 or pi == pj:
                continue
            lo, hi = (pi, pj) if pi < pj else (pj, pi)
            if (lo, hi) in excl_set:
                continue
            nbi_.append(lo)
            nbj_.append(hi)
            nbc_.append(float(a_pair)
                        / (alpha[pol[lo]] * alpha[pol[hi]]) ** (1.0 / 6.0))
    spec = DrudeSpec(
        core_idx=jnp.asarray(pol, jnp.int32),
        drude_idx=jnp.asarray(drude_rows, jnp.int32),
        q_drude=jnp.asarray(q_d),
        alpha=jnp.asarray(alpha[pol]),
        m_core=jnp.asarray(masses_ext[pol]),
        m_drude=float(m_drude),
        k_drude=float(k_drude),
        thole_i=jnp.asarray(ti_, jnp.int32) if ti_ else None,
        thole_j=jnp.asarray(tj_, jnp.int32) if ti_ else None,
        thole_coeff=jnp.asarray(tc_) if ti_ else None,
        nbthole_i=jnp.asarray(nbi_, jnp.int32) if nbi_ else None,
        nbthole_j=jnp.asarray(nbj_, jnp.int32) if nbi_ else None,
        nbthole_coeff=jnp.asarray(nbc_) if nbi_ else None,
    )

    ffp_ext = ffp._replace(
        charges=jnp.asarray(charges_ext),
        masses=jnp.asarray(masses_ext.reshape(-1, 1)),
        mapped_atom_types=jnp.asarray(types_ext),
        lj_params=None if lj_ext is None else jnp.asarray(lj_ext),
        lj_ab=lj_ab_ext,
        bonds=bonds_ext,
        nb_mask=jnp.asarray(mask_ext),
    )
    return ffp_ext, spec


def make_drude(forces, alpha=None, k_drude=500.0, m_drude=0.4, thole=2.6,
               nbthole_pairs=None):
    """Extend a built `Forces` object's FFParams with Drude oscillators.

    With `alpha=None` the polarizabilities come from the force field
    (the YAML schema's `polarizabilities: {TYPE: {alpha, thole}}`
    section, assembled onto `Parameters.alpha`/`.thole`).
    nbthole_pairs: optional (m, 3) (atom_i, atom_j, a) rows of CHARMM
    NBTHOLE pair-specific nonbonded screening (`charmm_nbthole_pairs`)."""
    thole_atom = None
    if alpha is None:
        alpha = getattr(forces.par, "alpha", None)
        thole_atom = getattr(forces.par, "thole", None)
        if alpha is None:
            raise ValueError(
                "no polarizabilities: pass alpha=... or use a force field "
                "with a `polarizabilities:` section"
            )
    return make_drude_ffparams(
        forces.ffparams, alpha, k_drude=k_drude, m_drude=m_drude,
        thole=thole, thole_atom=thole_atom, nbthole_pairs=nbthole_pairs,
    )


def init_drude_positions(pos, spec: DrudeSpec):
    """(natoms, 3) -> (natoms + npol, 3) with Drudes on their cores."""
    pos = jnp.asarray(pos)
    return jnp.concatenate([pos, pos[spec.core_idx]], axis=0)


def thole_energy(spec: DrudeSpec, pos_ext, box):
    """Screened dipole-dipole interaction of bonded-neighbor oscillators:
    four charge pairs (+-q_Di at core_i/Drude_i) x (+-q_Dj ...), each
    scaled by S(u) = 1 - (1 + u/2) e^-u."""
    if spec.thole_i is None:
        return jnp.zeros((), pos_ext.dtype)
    dtype = pos_ext.dtype
    ci = spec.core_idx[spec.thole_i]
    di = spec.drude_idx[spec.thole_i]
    cj = spec.core_idx[spec.thole_j]
    dj = spec.drude_idx[spec.thole_j]
    qi = spec.q_drude[spec.thole_i].astype(dtype)
    qj = spec.q_drude[spec.thole_j].astype(dtype)
    a = spec.thole_coeff.astype(dtype)

    def pair(idx_a, idx_b, qq):
        dv = wrap_displacement(pos_ext[idx_a] - pos_ext[idx_b], box)
        r = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
        u = a * r
        s = 1.0 - (1.0 + 0.5 * u) * jnp.exp(-u)
        return jnp.sum(s * ELEC_FACTOR * qq / r)

    # charges: Drude q_D, core counter-charge -q_D (the dipole pair)
    e = pair(di, dj, qi * qj)
    e = e + pair(di, cj, -qi * qj)
    e = e + pair(ci, dj, -qi * qj)
    e = e + pair(ci, cj, qi * qj)
    return e


def nbthole_energy(spec: DrudeSpec, pos_ext, box):
    """Pair-specific Thole damping of NONBONDED oscillator pairs (CHARMM
    NBTHOLE, typically ion-water): the nonbonded path already counts the
    bare Coulomb of the four charge pairs, so the correction per pair is
    qq/r * (S(u) - 1) = -qq/r (1 + u/2) e^-u."""
    if spec.nbthole_i is None:
        return jnp.zeros((), pos_ext.dtype)
    dtype = pos_ext.dtype
    ci = spec.core_idx[spec.nbthole_i]
    di = spec.drude_idx[spec.nbthole_i]
    cj = spec.core_idx[spec.nbthole_j]
    dj = spec.drude_idx[spec.nbthole_j]
    qi = spec.q_drude[spec.nbthole_i].astype(dtype)
    qj = spec.q_drude[spec.nbthole_j].astype(dtype)
    a = spec.nbthole_coeff.astype(dtype)

    def pair(idx_a, idx_b, qq):
        dv = wrap_displacement(pos_ext[idx_a] - pos_ext[idx_b], box)
        r = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
        u = a * r
        damp = -(1.0 + 0.5 * u) * jnp.exp(-u)
        return jnp.sum(damp * ELEC_FACTOR * qq / r)

    e = pair(di, dj, qi * qj)
    e = e + pair(di, cj, -qi * qj)
    e = e + pair(ci, dj, -qi * qj)
    e = e + pair(ci, cj, qi * qj)
    return e


def make_drude_ewald(ffp_ext: FFParams, box, cutoff, tol=1e-5,
                     pme="auto", dtype=jnp.float64):
    """Reciprocal-space engine for the EXTENDED (cores + Drudes)
    topology: returns (recip, alpha). Periodic Drude electrostatics is
    then the standard Ewald split over the extended charge set -- the
    nonbonded path evaluates erfc real space (set
    cfg._replace(ewald_alpha=alpha)), `recip` adds reciprocal + self +
    exclusion terms (pass it to `drude_energy` / `DrudeIntegrator`),
    and the Thole terms are untouched: bonded-excluded oscillator
    pairs' nearest image cancels via the -erf exclusion correction
    (their periodic images stay in the reciprocal sum, which is the
    physically correct exclusion treatment), and thole_energy then adds
    the screened nearest-image interaction exactly as in the direct
    model. NBTHOLE corrections are short-range additive damping on top
    of the full (erfc + erf) bare pair and also carry over unchanged.

    pme: True / False forces the gridded PmeRecip vs the exact
    separable sum; "auto" mirrors Forces.ensure_ewald (PME at or above
    TMD_PME_N extended particles, default 4096)."""
    import os as _os

    from .ewald import EwaldRecip, PmeRecip

    mask = np.asarray(ffp_ext.nb_mask)
    n_ext = mask.shape[0]
    excl = np.argwhere(np.triu(~mask, 1)).astype(np.int32)
    use_pme = (
        pme if isinstance(pme, bool)
        else n_ext >= int(_os.environ.get("TMD_PME_N", "4096"))
    )
    cls = PmeRecip if use_pme else EwaldRecip
    recip = cls(
        ffp_ext.charges, np.asarray(box).reshape(-1)[:3], cutoff,
        excl_pairs=excl, tol=tol, dtype=dtype,
    )
    return recip, float(recip.cfg.alpha)


def drude_energy(ffp_ext: FFParams, spec: DrudeSpec, cfg, pos_ext, box,
                 recip=None):
    """Total potential of the extended (cores + Drudes) system.

    Periodic Ewald/PME electrostatics: set cfg.ewald_alpha and pass the
    matching `recip` engine from `make_drude_ewald`."""
    if "bonds" not in cfg.terms:
        raise ValueError(
            "Drude systems need 'bonds' in the force terms (the core-Drude "
            "springs live in the bonds table)"
        )
    if cfg.ewald_alpha is not None and recip is None:
        raise ValueError(
            "cfg.ewald_alpha is set but no reciprocal engine was given: "
            "erfc real space alone is not valid electrostatics. Build one "
            "with make_drude_ewald(ffp_ext, box, cutoff) and pass recip=."
        )
    pot = compute_potentials(ffp_ext, pos_ext, box, cfg)
    e = (
        sum(jax.tree_util.tree_leaves(pot))
        + thole_energy(spec, pos_ext, box)
        + nbthole_energy(spec, pos_ext, box)
    )
    if recip is not None:
        e = e + recip.energy(pos_ext, jnp.asarray(box, pos_ext.dtype))
    return e


def scf_drude(ffp_ext, spec, cfg, pos_ext, box, iters=200, tol=1e-10,
              recip=None):
    """Relax the Drude coordinates at fixed cores (adiabatic/SCF limit)
    by damped Newton iterations on the spring-dominated Hessian: exact
    enough for validation, jit-compatible."""
    didx = spec.drude_idx

    def efun(p):
        return drude_energy(ffp_ext, spec, cfg, p, box, recip=recip)

    # the Hessian along each Drude coordinate is ~2 k0; a step of
    # g / (2 k0) is a Newton step in the dominant curvature
    step = 1.0 / (2.0 * spec.k_drude)

    def body(carry):
        p, i, _ = carry
        g = jax.grad(efun)(p)
        gd = g[didx]
        p = p.at[didx].add(-step * gd)
        return p, i + 1, jnp.max(jnp.abs(gd))

    def cond(carry):
        _, i, gmax = carry
        return jnp.logical_and(i < iters, gmax > tol)

    p, _, _ = jax.lax.while_loop(
        cond, body, (pos_ext, 0, jnp.asarray(jnp.inf, pos_ext.dtype))
    )
    return p


class DrudeIntegrator:
    """Velocity Verlet + dual Langevin (Lamoureux-Roux) for one replica of
    an extended Drude system.

    pos_ext/vel_ext live on this object (the plain System container has no
    notion of the auxiliary particles). T/gamma act on pair centers of
    mass and non-polarizable atoms; T_drude/gamma_drude on the relative
    core-Drude coordinates."""

    def __init__(self, ffp_ext, spec: DrudeSpec, cfg, pos_ext, box=None,
                 timestep=1.0, T=300.0, gamma=1.0, T_drude=1.0,
                 gamma_drude=20.0, seed=1, dtype=jnp.float64,
                 recip=None):
        self.ffp = ffp_ext
        self.spec = spec
        self.cfg = cfg
        self.recip = recip
        self.dtype = dtype
        self.dt = timestep / TIMEFACTOR
        self.box = (
            None if box is None else jnp.asarray(box, dtype).reshape(3)
        )
        self.pos = jnp.asarray(pos_ext, dtype)
        self.n_ext = int(self.pos.shape[0])
        self.masses = jnp.asarray(ffp_ext.masses, dtype)
        self.key = jax.random.PRNGKey(seed)
        self.vel = jnp.zeros_like(self.pos)
        self._last_frc = None
        self._last_pos = None
        self.T = float(T)
        self.T_drude = float(T_drude)
        self.gamma = float(gamma) / PICOSEC2TIMEU
        self.gamma_d = float(gamma_drude) / PICOSEC2TIMEU
        self._scan = self._build_scan()

    def set_velocities_boltzmann(self, seed=1):
        """Maxwell-Boltzmann cores at T; Drudes start with their core's
        velocity (cold relative coordinate)."""
        key = jax.random.PRNGKey(seed)
        std = jnp.sqrt(self.T * BOLTZMANN / self.masses)
        v = std * jax.random.normal(key, self.pos.shape, dtype=self.dtype)
        v = v.at[self.spec.drude_idx].set(v[self.spec.core_idx])
        self.vel = v

    def _build_scan(self):
        spec = self.spec
        ffp = self.ffp
        cfg = self.cfg
        box = self.box
        dt = self.dt
        masses = self.masses
        ci, di = spec.core_idx, spec.drude_idx
        m_c = spec.m_core[:, None].astype(self.dtype)
        m_d = jnp.asarray(spec.m_drude, self.dtype)
        M = m_c + m_d
        mu = m_c * m_d / M  # reduced mass of the relative coordinate
        kT = BOLTZMANN * self.T
        kTd = BOLTZMANN * self.T_drude
        g, gd = self.gamma, self.gamma_d
        vc_atom = jnp.sqrt(2.0 * g * kT * dt / masses).astype(self.dtype)
        vc_com = jnp.sqrt(2.0 * g * kT * dt / M).astype(self.dtype)
        vc_rel = jnp.sqrt(2.0 * gd * kTd * dt / mu).astype(self.dtype)

        recip = self.recip

        def ef(p):
            e, grad = jax.value_and_grad(
                lambda q: drude_energy(ffp, spec, cfg, q, box,
                                       recip=recip)
            )(p)
            return e, -grad

        def kick(vel, key):
            """Dual Langevin: COM/relative for oscillators, plain for the
            rest (the per-atom kick is computed everywhere, then the
            oscillator rows are overwritten with the transformed kick)."""
            k1, k2, k3 = jax.random.split(key, 3)
            noise = jax.random.normal(k1, vel.shape, dtype=vel.dtype)
            vel_all = vel - g * vel * dt + noise * vc_atom
            v_c, v_d = vel[ci], vel[di]
            v_com = (m_c * v_c + m_d * v_d) / M
            v_rel = v_d - v_c
            n2 = jax.random.normal(k2, v_com.shape, dtype=vel.dtype)
            n3 = jax.random.normal(k3, v_rel.shape, dtype=vel.dtype)
            v_com = v_com - g * v_com * dt + n2 * vc_com
            v_rel = v_rel - gd * v_rel * dt + n3 * vc_rel
            vel_all = vel_all.at[ci].set(v_com - (m_d / M) * v_rel)
            vel_all = vel_all.at[di].set(v_com + (m_c / M) * v_rel)
            return vel_all

        use_thermo = self.T > 0 and g > 0

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, niter: int):
            def body(c, _):
                st = c
                acc = st.forces / masses
                pos = st.pos + st.vel * dt + 0.5 * acc * dt * dt
                vel = st.vel + 0.5 * dt * acc
                epot, frc = ef(pos)
                key = st.key
                if use_thermo:
                    key, sub = jax.random.split(key)
                    vel = kick(vel, sub)
                vel = vel + 0.5 * dt * (frc / masses)
                return SimState(pos, vel, frc, key), epot

            carry, epots = jax.lax.scan(body, carry, None, length=niter)
            return carry, epots[-1]

        self._ef = jax.jit(ef)
        return run

    def step(self, niter=1):
        """Returns (Ekin_physical, Epot, T_physical, T_drude_rel): the
        physical numbers use COM + non-polarizable DOFs; the last entry is
        the relative-coordinate temperature (should sit near T_drude)."""
        # pos/vel are owned by this object, so the forces carried out of
        # the previous chunk stay valid; only the first chunk (or a
        # direct mutation of self.pos) needs a fresh evaluation
        if getattr(self, "_last_frc", None) is None or (
            self._last_pos is not self.pos
        ):
            _, self._last_frc = self._ef(self.pos)
        state = SimState(self.pos, self.vel, self._last_frc, self.key)
        state, epot = self._scan(state, int(niter))
        self.pos, self.vel, self.key = state.pos, state.vel, state.key
        self._last_frc = state.forces
        self._last_pos = self.pos

        spec = self.spec
        ci, di = spec.core_idx, spec.drude_idx
        m_c = spec.m_core[:, None].astype(self.dtype)
        m_d = jnp.asarray(spec.m_drude, self.dtype)
        M = m_c + m_d
        mu = m_c * m_d / M
        v = self.vel
        v_com = (m_c * v[ci] + m_d * v[di]) / M
        v_rel = v[di] - v[ci]
        n = self.n_ext - len(np.asarray(ci))  # physical atom count
        others = np.setdiff1d(
            np.arange(self.n_ext),
            np.concatenate([np.asarray(ci), np.asarray(di)]),
        )
        ke_phys = 0.5 * float(
            jnp.sum(M[:, 0] * jnp.sum(v_com**2, axis=1))
            + jnp.sum(
                self.masses[others, 0] * jnp.sum(v[others] ** 2, axis=1)
            )
        )
        ke_rel = 0.5 * float(jnp.sum(mu[:, 0] * jnp.sum(v_rel**2, axis=1)))
        T_phys = kinetic_to_temp(np.asarray([ke_phys]), n)[0]
        T_rel = kinetic_to_temp(
            np.asarray([ke_rel]), len(np.asarray(ci))
        )[0]
        return ke_phys, float(epot), T_phys, T_rel


# ----------------------------------------------------------------------
# CHARMM Drude-2013 file ingestion: RTF ALPHA/THOLE attributes and
# LONEPAIR virtual sites (the ecosystem's published polarizable FFs)
# ----------------------------------------------------------------------

LP_BISECTOR = 0
LP_COLINEAR = 1
LP_RELATIVE = 2


class LonePairSpec(NamedTuple):
    """Massless virtual charge sites reconstructed from host geometry.

    `hosts` rows are (A, B, C) core-atom indices; the site sits at
    distance `dist` from A with direction cos(angle) along A->ref +
    sin(angle) in the (cos(dihe), sin(dihe)) transverse frame, where
    ref is B (relative/colinear) or the (B, C) bisector (bisector kind)
    -- CHARMM's LONEPAIR internal-coordinate semantics. Positions are
    differentiable functions of the hosts, so jax.grad transfers the
    site force back to the hosts exactly (no hand-written projection).
    """

    kind: jnp.ndarray     # (nlp,) int32 LP_* code
    hosts: jnp.ndarray    # (nlp, 3) int32 (A, B, C); C=B for colinear
    dist: jnp.ndarray     # (nlp,)
    angle: jnp.ndarray    # (nlp,) radians
    dihe: jnp.ndarray     # (nlp,) radians
    charge: jnp.ndarray   # (nlp,) site charges


def _unit(v, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def lonepair_positions(spec: LonePairSpec, pos, box=None):
    """(nlp, 3) virtual-site positions from core positions."""
    A = pos[spec.hosts[:, 0]]
    vb = wrap_displacement(pos[spec.hosts[:, 1]] - A, box)
    vc = wrap_displacement(pos[spec.hosts[:, 2]] - A, box)
    ub = _unit(vb)
    uc = _unit(vc)
    ref = jnp.where(
        (spec.kind == LP_BISECTOR)[:, None], _unit(ub + uc), ub
    )
    # transverse frame: n1 in the (ref, C) plane, n2 the plane normal
    n2 = _unit(jnp.cross(ref, uc))
    # degenerate colinear frames (C == B): any transverse works; the
    # angle is 0 for colinear sites so the frame never contributes
    n2 = jnp.where(
        jnp.sum(n2 * n2, axis=-1, keepdims=True) > 1e-12,
        n2,
        _unit(jnp.cross(ref, ref + jnp.asarray([0.13, 0.71, 0.37],
                                               pos.dtype))),
    )
    n1 = jnp.cross(n2, ref)
    ca, sa = jnp.cos(spec.angle)[:, None], jnp.sin(spec.angle)[:, None]
    cd, sd = jnp.cos(spec.dihe)[:, None], jnp.sin(spec.dihe)[:, None]
    direction = ca * ref + sa * (cd * n1 + sd * n2)
    return A + spec.dist[:, None] * direction


def charmm_drude_tables(prm, mol):
    """Map a CHARMM Drude-2013 parameter set's RTF attributes onto a
    Molecule: returns (alpha (n,), thole (n,), charges (n,), lonepairs).

    `prm` is a `forcefields.ff_charmm.CharmmParameterSet` whose RTF
    carried ALPHA/THOLE atom attributes and LONEPAIR records; atoms are
    matched by (resname, atom name). Lone-pair SITES must exist as atoms
    of the topology (CHARMM convention); their records come back with
    host indices resolved per residue occurrence."""
    n = int(mol.numAtoms)
    resnames = np.asarray(mol.resname).reshape(-1)
    names = np.asarray(mol.name).reshape(-1)
    resids = np.asarray(
        getattr(mol, "resid", np.zeros(n, int))
    ).reshape(-1)
    alpha = np.zeros(n)
    thole = np.full(n, np.nan)
    charges = np.zeros(n)
    for a in range(n):
        rec = prm.rtf_atoms.get((str(resnames[a]), str(names[a])))
        if rec is None:
            raise KeyError(
                f"atom {a} ({resnames[a]}:{names[a]}): no RTF ATOM record"
            )
        alpha[a] = rec["alpha"]
        charges[a] = rec["charge"]
        if rec["thole"] is not None:
            thole[a] = rec["thole"]
    # resolve lone pairs per residue occurrence
    lps = []
    kinds = {"bisector": LP_BISECTOR, "colinear": LP_COLINEAR,
             "relative": LP_RELATIVE, "bisec": LP_BISECTOR}
    for key in np.unique(np.stack([resnames.astype(str),
                                   resids.astype(str)], 1), axis=0):
        rn, rid = key
        rows = np.where((resnames.astype(str) == rn)
                        & (resids.astype(str) == rid))[0]
        by_name = {str(names[a]): int(a) for a in rows}
        for rec in prm.rtf_lonepairs.get(rn, []):
            kname = rec["kind"][:8]
            kind = kinds.get(kname, kinds.get(kname[:5]))
            if kind is None:
                raise NotImplementedError(
                    f"LONEPAIR kind '{rec['kind']}' not supported"
                )
            site = by_name[rec["site"]]
            hosts = [by_name[h] for h in rec["hosts"]]
            while len(hosts) < 3:
                hosts.append(hosts[-1])
            lps.append({
                "site": site, "kind": kind, "hosts": hosts[:3],
                "dist": rec["distance"],
                "angle": np.deg2rad(rec["angle"]),
                "dihe": np.deg2rad(rec["dihe"]),
                "charge": charges[site],
            })
    return alpha, thole, charges, lps


def charmm_nbthole_pairs(prm, mol):
    """Resolve a parameter set's NBTHOLE type-pair table onto atom pairs:
    returns (m, 3) rows (atom_i, atom_j, a) for every unordered pair of
    atoms whose (RTF) types match an NBTHOLE entry. Types come from the
    RTF ATOM records when present (Drude topologies), else mol.atomtype.
    Feed the result to `make_drude_ffparams(..., nbthole_pairs=...)`."""
    tab = getattr(prm, "nbthole_types", None)
    if not tab:
        return None
    n = int(mol.numAtoms)
    types = np.empty(n, dtype=object)
    resnames = np.asarray(mol.resname).reshape(-1)
    names = np.asarray(mol.name).reshape(-1)
    for a in range(n):
        rec = prm.rtf_atoms.get((str(resnames[a]), str(names[a])))
        types[a] = (rec["type"] if rec is not None
                    else str(np.asarray(mol.atomtype).reshape(-1)[a]))
    rows = []
    seen_keys = {tuple(sorted(k)) for k in tab}
    for ta, tb in seen_keys:
        a_val = tab[(ta, tb)]
        ia = np.flatnonzero(types == ta)
        ib = np.flatnonzero(types == tb)
        for i in ia:
            for j in ib:
                if i < j:
                    rows.append((int(i), int(j), float(a_val)))
                elif j < i and ta != tb:
                    rows.append((int(j), int(i), float(a_val)))
    if not rows:
        return None
    return np.asarray(sorted(set(rows)), dtype=np.float64)


def make_lonepair_spec(lps) -> Optional[LonePairSpec]:
    if not lps:
        return None
    return LonePairSpec(
        kind=jnp.asarray([l["kind"] for l in lps], jnp.int32),
        hosts=jnp.asarray([l["hosts"] for l in lps], jnp.int32),
        dist=jnp.asarray([l["dist"] for l in lps]),
        angle=jnp.asarray([l["angle"] for l in lps]),
        dihe=jnp.asarray([l["dihe"] for l in lps]),
        charge=jnp.asarray([l["charge"] for l in lps]),
    )


def constrain_lonepairs(spec: LonePairSpec, sites, pos):
    """Return positions with the lone-pair SITE rows snapped onto their
    reconstructed virtual positions (sites: (nlp,) atom rows). Energies
    evaluated on the result are pure functions of the host geometry, so
    jax.grad transfers site forces to the hosts exactly."""
    lp_pos = lonepair_positions(spec, pos)
    return pos.at[jnp.asarray(sites, jnp.int32)].set(lp_pos)

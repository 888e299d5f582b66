"""Lambda-dynamics and constant-pH MD on the alchemical coupling.

Capability beyond the reference (torchmd has no alchemical machinery at
all). The coupling parameter of each titratable/alchemical site becomes a
DYNAMICAL degree of freedom (Kong & Brooks, J. Chem. Phys. 105, 2414
(1996)): lambda_s = sin^2(theta_s) with an unconstrained theta carrying a
fictitious mass, so lambda stays in [0, 1] without wall potentials. The
force on theta is -dE/dtheta -- one jax.grad through the soft-core
coupling (`alchemy.AlchemicalCoupling.energy_lambda`), which is why this
is ~40 lines of physics here instead of per-term dU/dlambda formulas.

Constant-pH MD (Lee, Salsbury & Brooks 2004 continuous-titration flavor)
is a bias potential on lambda:

    U_pH(lam) = [ln(10) kT (pH - pKa_model) + dG_model] * lam
                + 4 h lam (1 - lam)

where the linear term encodes the deprotonation free energy of the model
compound at this pH and the optional barrier h discourages unphysical
half-protonated states.

The atoms AND the thetas integrate together in one jitted lax.scan
(velocity Verlet + Langevin on both), reusing the Forces object's fused
evaluators for the base force field; the per-step lambda trace comes back
as a scan output for titration statistics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .alchemy import AlchemicalCoupling
from .integrator import TIMEFACTOR, kinetic_to_temp
from .systems import SimState
from .units import BOLTZMANN, PICOSEC2TIMEU


def make_lambda_sites(forces, site_atoms_list, alpha=0.5, softcore_power=1):
    """Prepare a built `Forces` object for multi-site lambda-dynamics.

    For every site: removes its (site x environment) crossing pairs from
    the base nonbonded mask and builds an `AlchemicalCoupling` whose
    environment EXCLUDES all other sites' atoms (site-site interactions
    stay in the base force field at full strength, the standard disjoint-
    sites approximation). Returns the list of couplings; the external
    slot of `forces` is left untouched -- LambdaDynamics evaluates the
    couplings itself at the current lambdas.
    """
    from .alchemy import _require_masked_nonbonded

    _require_masked_nonbonded(forces)
    natoms = int(forces.ffparams.charges.shape[0])
    in_any = np.zeros(natoms, dtype=bool)
    for atoms in site_atoms_list:
        atoms = np.asarray(atoms, dtype=np.int64)
        if np.any(in_any[atoms]):
            raise ValueError("lambda sites must be disjoint")
        in_any[atoms] = True
    env_all = np.flatnonzero(~in_any)

    couplings = []
    mask = np.asarray(forces.ffparams.nb_mask).copy()
    for atoms in site_atoms_list:
        atoms = np.asarray(atoms, dtype=np.int64)
        couplings.append(
            AlchemicalCoupling(
                forces.ffparams, forces.config, atoms, alpha=alpha,
                softcore_power=softcore_power, env_atoms=env_all,
            )
        )
        mask[np.ix_(atoms, env_all)] = False
        mask[np.ix_(env_all, atoms)] = False
    forces.ffparams = forces.ffparams._replace(nb_mask=jnp.asarray(mask))
    forces._build_evaluators()
    return couplings


def ph_bias(pKa_model, pH, T, dG_model=0.0, barrier=0.0):
    """Constant-pH bias U(lam) for one titratable site (kcal/mol).

    pKa_model: reference (model-compound) pKa of the site; pH: solution
    pH; dG_model: residual model-compound correction; barrier: height h
    of the 4 h lam (1-lam) end-state barrier."""
    slope = np.log(10.0) * BOLTZMANN * float(T) * (float(pH) - float(pKa_model))
    slope = slope + float(dG_model)

    def bias(lam):
        return slope * lam + 4.0 * float(barrier) * lam * (1.0 - lam)

    return bias


class LambdaDynamics:
    """Joint (atoms, thetas) dynamics for one replica.

    system/forces: the usual pair (forces prepared via make_lambda_sites);
    couplings: list of AlchemicalCoupling; biases: optional list of
    callables U_s(lam) (e.g. `ph_bias(...)`); lam0: initial lambdas;
    theta_mass: fictitious masses (amu A^2; CHARMM-style default 12).
    """

    def __init__(self, system, forces, couplings, biases=None, timestep=1.0,
                 T=300.0, gamma=1.0, theta_mass=12.0, lam0=None, seed=1):
        if system.nreplicas != 1:
            raise ValueError("LambdaDynamics drives one replica")
        self.system = system
        self.forces = forces
        self.couplings = list(couplings)
        ns = len(self.couplings)
        self.nsites = ns
        biases = list(biases) if biases is not None else [None] * ns
        if len(biases) != ns:
            raise ValueError("one bias per site (or None)")
        self.biases = biases
        self.dtype = forces.dtype
        self.dt = timestep / TIMEFACTOR
        self.T = float(T)
        self.gamma = float(gamma) / PICOSEC2TIMEU
        self.key = jax.random.PRNGKey(seed)

        masses = np.asarray(forces.par.masses, np.float64).reshape(-1, 1)
        self.masses = jnp.asarray(masses, self.dtype)
        self.theta_mass = jnp.asarray(
            np.broadcast_to(np.asarray(theta_mass, np.float64), (ns,)),
            self.dtype,
        )
        lam0 = np.broadcast_to(
            np.asarray(0.5 if lam0 is None else lam0, np.float64), (ns,)
        )
        if np.any((lam0 < 0) | (lam0 > 1)):
            raise ValueError("lam0 must be in [0, 1]")
        self.theta = jnp.asarray(np.arcsin(np.sqrt(lam0)), self.dtype)
        self.vtheta = jnp.zeros((ns,), self.dtype)
        self._ef_fn = self._make_ef()
        self._scan = self._build_scan()

    # ------------------------------------------------------------------
    def _build_scan(self):
        dt = self.dt
        gamma = self.gamma
        kT = BOLTZMANN * self.T
        masses = self.masses
        m_th = self.theta_mass
        use_thermo = self.T > 0 and gamma > 0
        vc_atoms = jnp.sqrt(2.0 * gamma * kT * dt / masses).astype(self.dtype)
        vc_theta = jnp.sqrt(2.0 * gamma * kT * dt / m_th).astype(self.dtype)

        ef = self._ef_fn

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, box, niter: int):
            def body(c, _):
                st, theta, vtheta, fth = c
                # first VV half-kick + drift (atoms and thetas)
                acc = st.forces / masses
                pos = st.pos + st.vel * dt + 0.5 * acc * dt * dt
                vel = st.vel + 0.5 * dt * acc
                acc_t = fth / m_th
                theta = theta + vtheta * dt + 0.5 * acc_t * dt * dt
                vtheta = vtheta + 0.5 * dt * acc_t
                epot, frc, fth = ef(pos, box, theta)
                key = st.key
                if use_thermo:
                    key, k1, k2 = jax.random.split(key, 3)
                    noise = jax.random.normal(k1, vel.shape, dtype=vel.dtype)
                    vel = vel - gamma * vel * dt + noise * vc_atoms
                    nth = jax.random.normal(k2, vtheta.shape,
                                            dtype=vtheta.dtype)
                    vtheta = vtheta - gamma * vtheta * dt + nth * vc_theta
                vel = vel + 0.5 * dt * (frc / masses)
                vtheta = vtheta + 0.5 * dt * (fth / m_th)
                lam = jnp.sin(theta) ** 2
                return (SimState(pos, vel, frc, key), theta, vtheta, fth), (
                    epot, lam,
                )

            carry, (epots, lams) = jax.lax.scan(body, carry, None,
                                                length=niter)
            return carry, epots[-1], lams

        return run

    # ------------------------------------------------------------------
    def step(self, niter=1):
        """Advance atoms + lambdas `niter` steps. Returns (Ekin, Epot, T,
        lam_trace) with lam_trace of shape (niter, nsites)."""
        s = self.system
        box = jnp.asarray(np.asarray(s.box_diag)[0], self.dtype)
        pos = jnp.asarray(s.pos[0], self.dtype)
        vel = jnp.asarray(s.vel[0], self.dtype)
        frc = jnp.asarray(s.forces[0], self.dtype)
        # entry-state forces: always recomputed WITH the coupling terms (a
        # caller-seeded forces.compute() would lack the crossing pairs)
        if not hasattr(self, "_entry_jit"):
            self._entry_jit = jax.jit(self._ef_fn)
        del frc
        _, f0, fth = self._entry_jit(pos, box, self.theta)
        state = SimState(pos, vel, f0, self.key)
        carry = (state, self.theta, self.vtheta, fth)
        (state, self.theta, self.vtheta, _), epot, lams = self._scan(
            carry, box, int(niter)
        )
        self.key = state.key
        s.pos[0] = np.asarray(state.pos, dtype=s.pos.dtype)
        s.vel[0] = np.asarray(state.vel, dtype=s.vel.dtype)
        s.forces[0] = np.asarray(state.forces, dtype=s.forces.dtype)
        ekin = float(
            0.5 * jnp.sum(self.masses[:, 0] * jnp.sum(state.vel**2, axis=1))
        )
        T = kinetic_to_temp(np.asarray([ekin]), len(np.asarray(s.pos[0])))[0]
        return (
            np.asarray([ekin]),
            np.asarray([float(epot)]),
            np.asarray([T]),
            np.asarray(lams),
        )

    def _make_ef(self):
        """The ONE energy/force function both the scan and the entry-state
        seeding use: base force field (ef_one) + an external potential if
        the Forces object carries a jittable one + coupling/bias terms,
        with forces on atoms AND thetas from a single value_and_grad."""
        forces_obj = self.forces
        couplings = self.couplings
        biases = self.biases
        ext_energy = getattr(forces_obj.external, "energy_fn", None)

        def extra_energy(pos, box, theta):
            lam = jnp.sin(theta) ** 2
            e = jnp.zeros((), pos.dtype)
            for s, c in enumerate(couplings):
                e = e + c.energy_lambda(pos, box, lam[s])
                if biases[s] is not None:
                    e = e + biases[s](lam[s])
            if ext_energy is not None:
                e = e + ext_energy(pos, box)
            return e

        def ef(pos, box, theta):
            pot, frc = forces_obj.ef_one(pos, box)
            e_x, (g_pos, g_th) = jax.value_and_grad(
                extra_energy, argnums=(0, 2)
            )(pos, box, theta)
            e = sum(jax.tree_util.tree_leaves(pot)) + e_x
            return e, frc - g_pos, -g_th

        return ef

    # ------------------------------------------------------------------
    @property
    def lambdas(self):
        """Current per-site lambda values (numpy, in [0, 1])."""
        return np.asarray(jnp.sin(self.theta) ** 2)

    def theta_kinetic_energy(self):
        return float(0.5 * jnp.sum(self.theta_mass * self.vtheta**2))


def protonation_fraction(lam_trace, threshold=0.8):
    """Fraction of frames each site spends coupled (lam > threshold) --
    the raw titration-curve observable. lam_trace: (nframes, nsites)."""
    lam_trace = np.asarray(lam_trace)
    return (lam_trace > threshold).mean(axis=0)

"""NVT thermostats beyond the reference's Langevin: Nose-Hoover chains
(deterministic, correct canonical sampling) and CSVR / Bussi stochastic
velocity rescaling (global rescale, minimal disturbance of dynamics).

The reference framework has exactly one thermostat (Langevin,
torchmd/integrator.py:72-77). These two are the standard production
alternatives; both are implemented as pure per-replica functions so the
integrator scan vmaps them over the batch and they jit/shard untouched.

Units follow the rest of the package: internal time units (dt =
timestep_fs / TIMEFACTOR), energies kcal/mol, BOLTZMANN in kcal/mol/K.

References (public algorithms):
  - Martyna, Klein, Tuckerman, J. Chem. Phys. 97, 2635 (1992) -- NHC.
  - Martyna et al., Mol. Phys. 87, 1117 (1996) -- reversible NHC update.
  - Bussi, Donadio, Parrinello, J. Chem. Phys. 126, 014101 (2007) -- CSVR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .units import BOLTZMANN, TIMEFACTOR

__all__ = ["NoseHooverChain", "CSVR", "make_thermostat"]


class NoseHooverChain:
    """Global Nose-Hoover chain coupled to all degrees of freedom.

    aux state per replica: (xi, v_xi) each (nchain,). The chain propagator
    runs for dt/2 before the first velocity half-kick and dt/2 after the
    second (standard MTK operator splitting); each half uses one
    Suzuki-Yoshida step with the reversible update of Martyna et al. 1996.
    """

    stochastic = False

    def __init__(self, T, tau_fs, ndof, nchain=3):
        if nchain < 1:
            raise ValueError("nchain must be >= 1")
        self.T = float(T)
        self.kT = BOLTZMANN * float(T)
        self.tau = float(tau_fs) / TIMEFACTOR  # internal time units
        self.ndof = int(ndof)
        self.nchain = int(nchain)
        q1 = self.ndof * self.kT * self.tau**2
        qk = self.kT * self.tau**2
        self.Q = np.array([q1] + [qk] * (self.nchain - 1))

    def init(self, nreplicas, dtype):
        # distinct buffers: the scan carry is donated, and aliased leaves
        # cannot both be donated
        return {
            "xi": jnp.zeros((nreplicas, self.nchain), dtype=dtype),
            "vxi": jnp.zeros((nreplicas, self.nchain), dtype=dtype),
        }

    def _chain_half(self, vel, xi, vxi, masses, dth, axis_name=None):
        """Propagate the chain for dth and rescale velocities. Per replica;
        the nchain loop is unrolled in Python (nchain is tiny and static).
        With `axis_name`, `vel`/`masses` hold only this rank's atom rows
        (spatial sharding) and the kinetic energy is psum-reduced, so every
        rank advances an identical chain."""
        M = self.nchain
        kT = self.kT
        # match the velocity dtype: a raw np.float64 Q would promote an
        # f32 scan carry to f64 under x64 (CPU validation runs)
        Q = jnp.asarray(self.Q, vel.dtype)
        nf_kT = self.ndof * kT
        dt4 = 0.5 * dth
        dt8 = 0.25 * dth

        K2 = jnp.sum(masses[:, 0] * jnp.sum(vel * vel, axis=1))  # 2*KE
        if axis_name is not None:
            K2 = jax.lax.psum(K2, axis_name)
        v = [vxi[k] for k in range(M)]

        def G(k, K2_now):
            if k == 0:
                return (K2_now - nf_kT) / Q[0]
            return (Q[k - 1] * v[k - 1] ** 2 - kT) / Q[k]

        # backward sweep: update the tail first
        v[M - 1] = v[M - 1] + G(M - 1, K2) * dt4
        for k in range(M - 2, -1, -1):
            e = jnp.exp(-dt8 * v[k + 1])
            v[k] = (v[k] * e + G(k, K2) * dt4) * e
        # scale particle velocities + advance chain positions
        s = jnp.exp(-dth * v[0])
        K2 = K2 * s * s
        xi = xi + dth * jnp.stack(v)
        # forward sweep with the updated kinetic energy
        for k in range(M - 1):
            e = jnp.exp(-dt8 * v[k + 1])
            v[k] = (v[k] * e + G(k, K2) * dt4) * e
        v[M - 1] = v[M - 1] + G(M - 1, K2) * dt4
        return vel * s, xi, jnp.stack(v)

    def pre(self, vel, aux, masses, dt, key=None, axis_name=None):
        vel, xi, vxi = self._chain_half(vel, aux["xi"], aux["vxi"],
                                        masses, 0.5 * dt,
                                        axis_name=axis_name)
        return vel, {"xi": xi, "vxi": vxi}

    post = pre  # same half-propagator after the second VV half-kick

    def conserved(self, aux):
        """Thermostat contribution to the conserved (extended) energy:
        sum_k Q_k v_k^2 / 2 + Nf kT xi_1 + kT sum_{k>1} xi_k. Add to
        Ekin + Epot to monitor drift."""
        xi, vxi = aux["xi"], aux["vxi"]
        Q = jnp.asarray(self.Q, vxi.dtype)
        e = 0.5 * jnp.sum(Q * vxi * vxi, axis=-1)
        e = e + self.ndof * self.kT * xi[..., 0]
        if self.nchain > 1:
            e = e + self.kT * jnp.sum(xi[..., 1:], axis=-1)
        return e


class CSVR:
    """Canonical sampling through velocity rescaling (Bussi 2007).

    One global stochastic rescale per step after the force update. No aux
    state; needs a PRNG key. Exact canonical distribution of the kinetic
    energy for any tau; tau -> inf recovers NVE.
    """

    stochastic = True

    def __init__(self, T, tau_fs, ndof):
        self.T = float(T)
        self.kT = BOLTZMANN * float(T)
        self.tau = float(tau_fs) / TIMEFACTOR
        self.ndof = int(ndof)

    def init(self, nreplicas, dtype):
        return {}

    def pre(self, vel, aux, masses, dt, key=None, axis_name=None):
        return vel, aux

    def post(self, vel, aux, masses, dt, key=None, axis_name=None):
        """With `axis_name` (spatial sharding) the kinetic energy psums
        over ranks; callers must pass the SAME (replicated, un-folded) key
        on every rank so the global rescale factor is identical."""
        nf = self.ndof
        K = 0.5 * jnp.sum(masses[:, 0] * jnp.sum(vel * vel, axis=1))
        if axis_name is not None:
            K = jax.lax.psum(K, axis_name)
        K = jnp.maximum(K, 1e-12)
        kbar = 0.5 * nf * self.kT
        c = jnp.exp(-dt / self.tau).astype(vel.dtype)
        k1, k2 = jax.random.split(key)
        r1 = jax.random.normal(k1, (), dtype=vel.dtype)
        # sum of (nf-1) squared normals ~ chi^2(nf-1) = 2 * Gamma((nf-1)/2)
        r2 = 2.0 * jax.random.gamma(
            k2, jnp.asarray(0.5 * (nf - 1), vel.dtype), dtype=vel.dtype
        )
        a2 = (
            c
            + (1.0 - c) * (kbar / (nf * K)) * (r1 * r1 + r2)
            + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * kbar / (nf * K))
        )
        return vel * jnp.sqrt(jnp.maximum(a2, 0.0)), aux

    def conserved(self, aux):
        return 0.0


def make_thermostat(name, T, tau_fs, ndof, nchain=3):
    """Factory: 'nhc' | 'nosehoover' -> NoseHooverChain, 'csvr' | 'bussi'
    -> CSVR. 'langevin' returns None (handled inline by the integrator,
    reference numerics)."""
    name = (name or "langevin").lower()
    if name in ("langevin", "none"):
        return None
    if name in ("nhc", "nosehoover", "nose-hoover"):
        return NoseHooverChain(T, tau_fs, ndof, nchain=nchain)
    if name in ("csvr", "bussi"):
        return CSVR(T, tau_fs, ndof)
    raise ValueError(f"Unknown thermostat: {name}")

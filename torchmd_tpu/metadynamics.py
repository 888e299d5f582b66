"""Well-tempered metadynamics, fully inside the compiled scan.

Capability beyond the reference. The history-dependent bias lives on a
fixed-shape 1-D grid carried through the integrator `lax.scan` (like the
thermostat aux state), so hill deposition, bias interpolation and the MD
step all compile into one device program -- no host round trip per hill
(CPU metadynamics codes sync every stride).

    B_{t+1}(x) = B_t(x) + w_t exp(-(x - s_t)^2 / 2 sigma^2)
    w_t = height * exp(-B_t(s_t) / (kB * dT)),   dT = (gamma_b - 1) T

The PMF estimate is F(x) = -(gamma_b / (gamma_b - 1)) * B(x) (standard
well-tempered reweighting), min-shifted to zero.

Reference algorithm: Barducci, Bussi, Parrinello, PRL 100, 020603 (2008).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .integrator import _first_vv, _second_vv, TIMEFACTOR
from .units import BOLTZMANN, PICOSEC2TIMEU

__all__ = ["MetaDynamics"]


def _interp_linear(grid, lo, dx, x):
    """Differentiable linear interpolation of a 1-D grid at x (clamped)."""
    n = grid.shape[0]
    u = jnp.clip((x - lo) / dx, 0.0, n - 1.000001)
    i0 = jnp.floor(u).astype(jnp.int32)
    t = u - i0
    return grid[i0] * (1.0 - t) + grid[i0 + 1] * t


class MetaDynamics:
    """Langevin MD + well-tempered metadynamics on one collective variable.

    system: 1-replica System; forces: a built Forces object (its ef_one is
    the base potential); cv_fn: pure differentiable CV (see torchmd_tpu.cv);
    grid=(lo, hi, nbins) spans the expected CV range; sigma/height are the
    hill width (CV units) and initial height (kcal/mol); stride is the
    deposition period in steps; bias_factor is the well-tempered gamma
    (np.inf -> standard metadynamics).
    """

    def __init__(self, system, forces, cv_fn, timestep, T, gamma=1.0,
                 grid=(0.0, 1.0, 200), sigma=0.1, height=0.2, stride=50,
                 bias_factor=10.0, seed=1):
        if system.nreplicas != 1:
            raise ValueError("MetaDynamics drives one replica")
        self.system = system
        self.forces = forces
        self.cv_fn = cv_fn
        self.dt = timestep / TIMEFACTOR
        self.T = float(T)
        self.gamma = gamma / PICOSEC2TIMEU
        lo, hi, nbins = grid
        self.lo, self.hi, self.nbins = float(lo), float(hi), int(nbins)
        self.dx = (self.hi - self.lo) / (self.nbins - 1)
        self.sigma = float(sigma)
        self.height = float(height)
        self.stride = int(stride)
        self.bias_factor = float(bias_factor)
        self.key = jax.random.PRNGKey(seed)

        ext = getattr(forces, "external", None)
        if ext is not None and not hasattr(ext, "energy_fn"):
            raise ValueError(
                "MetaDynamics needs a jittable external potential "
                "(energy_fn protocol); host-coupled externals cannot run "
                "inside the compiled scan"
            )
        masses = np.asarray(forces.par.masses, dtype=np.float64).reshape(-1, 1)
        dtype = forces.dtype
        self.dtype = dtype
        self.masses = jnp.asarray(masses, dtype)
        self.vcoeff = jnp.sqrt(
            2.0 * self.gamma / self.masses * BOLTZMANN * self.T * self.dt
        ).astype(dtype)
        self.bias = jnp.zeros(self.nbins, dtype)
        self.nhills = 0
        self._scan = self._build_scan()

    # ------------------------------------------------------------------
    def _build_scan(self):
        forces_obj = self.forces
        ef_one = forces_obj.ef_one
        ext_energy = getattr(forces_obj.external, "energy_fn", None)
        cv_fn = self.cv_fn
        dt, gamma_l = self.dt, self.gamma
        masses, vcoeff = self.masses, self.vcoeff
        lo, dx, sigma = self.lo, self.dx, self.sigma
        height = self.height
        kT_dT = None
        if np.isfinite(self.bias_factor):
            dT = (self.bias_factor - 1.0) * self.T
            kT_dT = BOLTZMANN * dT
        stride = self.stride
        xs = jnp.asarray(
            self.lo + self.dx * np.arange(self.nbins), self.dtype
        )
        use_pbc = bool(np.any(np.asarray(self.system.box_diag) != 0))

        def total_e(pos, box, bias):
            pot, frc = ef_one(pos, box if use_pbc else None)
            e = sum(jax.tree_util.tree_leaves(pot))

            def extra(p):
                ee = _interp_linear(bias, lo, dx, cv_fn(p, box))
                if ext_energy is not None:
                    ee = ee + ext_energy(p, box)
                return ee

            eb, gb = jax.value_and_grad(extra)(pos)
            return e + eb, frc - gb

        @partial(jax.jit, static_argnames=("niter",))
        def run(state, bias, key, box, step0, niter: int):
            def body(carry, i):
                pos, vel, frc, bias, key = carry
                pos, vel = _first_vv(pos, vel, frc, masses, dt)
                epot, frc = total_e(pos, box, bias)
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
                vel = vel - gamma_l * vel * dt + noise * vcoeff
                vel = _second_vv(vel, frc, masses, dt)

                def deposit(b):
                    s = cv_fn(pos, box)
                    w = jnp.asarray(height, b.dtype)
                    if kT_dT is not None:
                        w = w * jnp.exp(
                            -_interp_linear(b, lo, dx, s) / kT_dT
                        )
                    return b + w * jnp.exp(
                        -0.5 * ((xs - s) / sigma) ** 2
                    )

                bias = jax.lax.cond(
                    (i + 1) % stride == 0, deposit, lambda b: b, bias
                )
                s_now = cv_fn(pos, box)
                return (pos, vel, frc, bias, key), (epot, s_now)

            # global step index: the deposition cadence must survive
            # chunked run() calls (a chunk-local counter would deposit
            # nothing for niter < stride)
            carry, (epots, cvs) = jax.lax.scan(
                body, (state[0], state[1], state[2], bias, key),
                step0 + jnp.arange(niter), length=niter,
            )
            pos, vel, frc, bias, key = carry
            return pos, vel, frc, bias, key, epots[-1], cvs

        return run

    # ------------------------------------------------------------------
    def run(self, niter):
        """Advance `niter` steps; returns the CV time series of the chunk."""
        s = self.system
        box = jnp.asarray(np.asarray(s.box_diag)[0], self.dtype)
        pos = jnp.asarray(s.pos[0], self.dtype)
        vel = jnp.asarray(s.vel[0], self.dtype)
        frc = jnp.asarray(s.forces[0], self.dtype)
        step0 = getattr(self, "_step_count", 0)
        pos, vel, frc, self.bias, self.key, epot, cvs = self._scan(
            (pos, vel, frc), self.bias, self.key, box,
            jnp.asarray(step0, jnp.int32), int(niter)
        )
        s.pos[0] = np.asarray(pos, dtype=s.pos.dtype)
        s.vel[0] = np.asarray(vel, dtype=s.vel.dtype)
        s.forces[0] = np.asarray(frc, dtype=s.forces.dtype)
        self._step_count = step0 + int(niter)
        self.nhills += (
            self._step_count // self.stride - step0 // self.stride
        )
        return np.asarray(cvs)

    def free_energy(self):
        """(grid x, PMF estimate in kcal/mol, min-shifted). Well-tempered:
        F = -(gamma_b/(gamma_b-1)) B; standard metadynamics: F = -B."""
        b = np.asarray(self.bias, dtype=np.float64)
        if np.isfinite(self.bias_factor):
            f = -self.bias_factor / (self.bias_factor - 1.0) * b
        else:
            f = -b
        xs = self.lo + self.dx * np.arange(self.nbins)
        return xs, f - f.min()

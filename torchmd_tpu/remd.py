"""Temperature replica-exchange MD (parallel tempering).

Capability beyond the reference. TPU-native structure: all replicas of the
ladder integrate inside ONE jitted vmapped scan (the ensemble axis can
also shard over a device mesh via `Integrator(mesh=...)`), so the chip
sees a single batched program; only the O(R) exchange bookkeeping runs on
the host between compiled chunks.

Convention: temperatures stay pinned to replica slots; on an accepted
swap the CONFIGURATIONS (positions, forces) exchange and velocities are
rescaled by sqrt(T_new / T_old) (the standard velocity-rescale exchange
move), so slot r always samples the canonical ensemble at
`temperatures[r]`. `walker_id` tracks which initial walker currently
lives in each slot (demixing diagnostics).

Acceptance (Metropolis on the joint ensemble):
    P = min(1, exp[(beta_i - beta_j)(E_i - E_j)])
for neighbor slots (i, j); even/odd pairs alternate per attempt.
"""

from __future__ import annotations

import numpy as np

from .integrator import Integrator
from .units import BOLTZMANN


class ReplicaExchange:
    """Drive an `Integrator` over a temperature ladder with periodic
    neighbor-swap attempts.

    systems.nreplicas must equal len(temperatures); velocities should be
    initialized per-slot (e.g. maxwell_boltzmann at each ladder T).
    """

    def __init__(self, systems, forces, timestep, temperatures, gamma=1.0,
                 seed=1, **integrator_kwargs):
        self.temps = np.asarray(temperatures, dtype=np.float64)
        if systems.nreplicas != len(self.temps):
            raise ValueError(
                f"nreplicas={systems.nreplicas} != ladder size {len(self.temps)}"
            )
        if np.any(np.diff(self.temps) <= 0):
            raise ValueError("temperatures must be strictly increasing")
        self.systems = systems
        self.integrator = Integrator(
            systems, forces, timestep, gamma=gamma, T=self.temps, seed=seed,
            **integrator_kwargs,
        )
        self.beta = 1.0 / (BOLTZMANN * self.temps)
        self.rng = np.random.RandomState(seed)
        self.phase = 0
        self.walker_id = np.arange(len(self.temps))
        self.n_attempted = np.zeros(len(self.temps) - 1, dtype=np.int64)
        self.n_accepted = np.zeros(len(self.temps) - 1, dtype=np.int64)

    # ------------------------------------------------------------------
    def attempt_exchanges(self, epot):
        """One sweep of neighbor-swap attempts (even pairs, then odd pairs
        on the next call). `epot` is the per-slot potential energy of the
        CURRENT configurations. Returns the boolean accept mask per pair
        index."""
        epot = np.array(epot, dtype=np.float64).reshape(-1)  # owned copy
        R = len(self.temps)
        start = self.phase % 2
        self.phase += 1
        s = self.systems
        accepted = np.zeros(R - 1, dtype=bool)
        for i in range(start, R - 1, 2):
            j = i + 1
            self.n_attempted[i] += 1
            log_p = (self.beta[i] - self.beta[j]) * (epot[i] - epot[j])
            if np.log(max(self.rng.rand(), 1e-300)) < min(log_p, 0.0):
                accepted[i] = True
                self.n_accepted[i] += 1
                # swap configurations; rescale velocities to the slot T
                s.pos[[i, j]] = s.pos[[j, i]]
                s.forces[[i, j]] = s.forces[[j, i]]
                vi = s.vel[i].copy()
                vj = s.vel[j].copy()
                s.vel[i] = vj * np.sqrt(self.temps[i] / self.temps[j])
                s.vel[j] = vi * np.sqrt(self.temps[j] / self.temps[i])
                epot[i], epot[j] = epot[j], epot[i]
                self.walker_id[[i, j]] = self.walker_id[[j, i]]
        return accepted

    # ------------------------------------------------------------------
    def run(self, nsteps, exchange_period=100):
        """Integrate `nsteps` total with an exchange sweep every
        `exchange_period` steps. Returns (Ekin, Epot, T) of the final
        chunk, like Integrator.step."""
        out = None
        done = 0
        while done < nsteps:
            n = min(exchange_period, nsteps - done)
            out = self.integrator.step(niter=n)
            done += n
            if done < nsteps:
                self.attempt_exchanges(out[1])
        return out

    @property
    def acceptance_rates(self):
        """Per-neighbor-pair acceptance fractions (nan where untried)."""
        with np.errstate(invalid="ignore"):
            return self.n_accepted / np.where(
                self.n_attempted > 0, self.n_attempted, np.nan
            )

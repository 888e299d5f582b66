"""Monte Carlo barostat (isotropic NPT), new capability vs the reference
(which is NVE/NVT only -- SURVEY.md §2.5 "no barostat").

Standard MC volume moves (the OpenMM MonteCarloBarostat scheme): every
attempt proposes V' = V + dV with dV ~ U(-dVmax, +dVmax), scales molecule
centers of mass (keeping intramolecular geometry rigid), and accepts with

    exp(-(dE + P dV - N_mol kT ln(V'/V)) / kT)

where N_mol counts independently scaled units. dVmax self-tunes toward a
~50% acceptance rate. Attempts run at the host level between compiled
integration chunks (one extra jitted energy evaluation per attempt), so
they compose with every kernel path.
"""

from __future__ import annotations

import jax
import numpy as np

from .units import BOLTZMANN

# 1 bar * A^3 in kcal/mol
BAR_A3_TO_KCALMOL = 1.0e5 * 1.0e-30 * 6.02214076e23 / 4184.0


class MonteCarloBarostat:
    def __init__(self, pressure_bar, temperature, group_id=None, seed=0,
                 dv_max=None):
        self.pressure = pressure_bar * BAR_A3_TO_KCALMOL  # kcal/mol/A^3
        self.T = temperature
        self.group_id = None if group_id is None else np.asarray(group_id)
        self.key = jax.random.PRNGKey(seed)
        self.dv_max = dv_max  # A^3; initialized on first attempt
        self.n_attempted = 0
        self.n_accepted = 0

    # ------------------------------------------------------------------
    def _scale_positions(self, pos, scale):
        """Scale molecule COMs by `scale`, keeping internal geometry."""
        if self.group_id is None:
            return pos * scale
        gid = self.group_id
        ngroups = gid.max() + 1
        nrep = pos.shape[0]
        sums = np.zeros((nrep, ngroups, 3))
        np.add.at(sums, (slice(None), gid), pos)
        counts = np.bincount(gid, minlength=ngroups).astype(np.float64)
        com = sums / counts[None, :, None]
        return pos + (scale - 1.0) * com[:, gid, :]

    def _n_units(self, natoms):
        if self.group_id is None:
            return natoms
        return int(self.group_id.max()) + 1

    # ------------------------------------------------------------------
    def attempt(self, system, forces):
        """One MC volume move on a System (all replicas share the decision
        of replica 0 is NOT done -- each replica moves independently)."""
        box = system.box_diag
        if np.any(box <= 0):
            raise ValueError("Barostat requires a periodic box")
        V = np.prod(box, axis=1)  # (R,)
        if self.dv_max is None:
            self.dv_max = 0.01 * float(V[0])

        e_old = np.asarray(forces.compute(system.pos, system.box))

        self.key, k1, k2 = jax.random.split(self.key, 3)
        nrep = system.nreplicas
        dv = (np.asarray(jax.random.uniform(k1, (nrep,))) * 2 - 1) * self.dv_max
        V_new = V + dv
        scale = (V_new / V) ** (1.0 / 3.0)

        pos_new = self._scale_positions(
            np.asarray(system.pos, np.float64), scale[:, None, None]
        )
        box_new = box * scale[:, None]
        box_mat = np.zeros((nrep, 3, 3))
        for r in range(nrep):
            np.fill_diagonal(box_mat[r], box_new[r])
        e_new = np.asarray(forces.compute(pos_new, box_mat))

        n_units = self._n_units(system.natoms)
        kT = BOLTZMANN * self.T
        w = (
            (e_new - e_old)
            + self.pressure * dv
            - n_units * kT * np.log(V_new / V)
        )
        u = np.asarray(jax.random.uniform(k2, (nrep,)))
        accept = u < np.exp(np.minimum(-w / kT, 0.0))

        for r in range(nrep):
            self.n_attempted += 1
            if accept[r]:
                self.n_accepted += 1
                system.pos[r] = pos_new[r].astype(system.pos.dtype)
                np.fill_diagonal(system.box[r], box_new[r].astype(system.box.dtype))

        # adapt step size toward ~50% acceptance (OpenMM heuristic)
        if self.n_attempted >= 10:
            rate = self.n_accepted / self.n_attempted
            if rate < 0.25:
                self.dv_max /= 1.1
                self.n_attempted = self.n_accepted = 0
            elif rate > 0.75:
                self.dv_max *= 1.1
                self.n_attempted = self.n_accepted = 0
        return accept

"""Monte Carlo barostats (isotropic, anisotropic, membrane NPT), new
capability vs the reference (which is NVE/NVT only -- SURVEY.md §2.5
"no barostat").

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
    def _propose(self, system, k1):
        """Per-replica (scale (R, 3), dV (R,), extra_work (R,)) for one MC
        move. Subclasses override for anisotropic / membrane moves."""
        box = system.box_diag
        V = np.prod(box, axis=1)
        nrep = system.nreplicas
        dv = (np.asarray(jax.random.uniform(k1, (nrep,))) * 2 - 1) * self.dv_max
        s = ((V + dv) / V) ** (1.0 / 3.0)
        return np.repeat(s[:, None], 3, axis=1), dv, np.zeros(nrep)

    def attempt(self, system, forces):
        """One MC volume move on a System; each replica accepts/rejects
        independently. Acceptance: exp(-(dE + P dV + extra - N kT lnJ)/kT)."""
        box = system.box_diag
        if np.any(box <= 0):
            raise ValueError("Barostat requires a periodic box")
        V = np.prod(box, axis=1)  # (R,)
        if self.dv_max is None:
            self.dv_max = 0.01 * float(V[0])

        e_old = np.asarray(forces.compute(system.pos, system.box))

        self.key, k1, k2 = jax.random.split(self.key, 3)
        nrep = system.nreplicas
        scale, dv, extra = self._propose(system, k1)  # (R,3), (R,), (R,)
        V_new = V + dv

        pos_new = self._scale_positions(
            np.asarray(system.pos, np.float64), scale[:, None, :]
        )
        box_new = box * scale
        box_mat = np.zeros((nrep, 3, 3))
        for r in range(nrep):
            np.fill_diagonal(box_mat[r], box_new[r])
        e_new = np.asarray(forces.compute(pos_new, box_mat))

        n_units = self._n_units(system.natoms)
        kT = BOLTZMANN * self.T
        w = (
            (e_new - e_old)
            + self.pressure * dv
            + extra
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


class MTKBarostat:
    """Martyna-Tobias-Klein extended-system barostat (isotropic): TRUE NPT
    dynamics with a continuously fluctuating box inside the compiled scan,
    vs the MC barostats' NPT *sampling* between chunks.

    The barostat degree of freedom eps = ln(V)/3 has velocity v_eps and
    mass W = (Nf + 3) kT tau_p^2; its equation of motion is driven by

        G_eps = (1 + 3/Nf) * 2K  +  W_vir  -  3 V P_ext

    where the virial W_vir = -dU(s*pos, s*box)/ds|_{s=1} comes from
    autodiff through a uniform scaling (exact for minimum-image pair
    terms, switching, RFA and the box-dependent Ewald reciprocal sum --
    same construction as observables.virial). Particles and the barostat
    each couple to a Nose-Hoover chain; the integrator implements the
    explicit reversible MTK splitting (Martyna et al., Mol. Phys. 87,
    1117 (1996); Tuckerman et al., J. Phys. A 39, 5629 (2006)) with the
    sinh(x)/x position/velocity factors.

    Coupling modes (all share the per-axis formulation: eps_k = ln L_k
    with G_k = 2K_k + 2K/Nf + W_vir,k - V P_ext [+ gamma A on x/y for
    membranes], then mode-projected):
      'iso'      -- all three axes tied (reproduces the scalar MTK
                    equations exactly: summed G and W per DOF),
      'aniso'    -- axes relax independently (crystals, interfaces);
                    `scale_axes` freezes selected axes,
      'membrane' -- x/y tied, z independent, constant surface tension
                    gamma (bar*Angstrom) in the x/y work term (NPgammaT).

    This object only carries the static parameters; the dynamics live in
    Integrator._build_scan_npt (the scan carries box, v_eps and both
    chain states).
    """

    is_dynamic = True

    def __init__(self, pressure_bar, temperature, tau_fs=None, nchain=3,
                 mode="iso", surface_tension=0.0,
                 scale_axes=(True, True, True)):
        if mode not in ("iso", "aniso", "membrane"):
            raise ValueError(f"Unknown MTK mode: {mode}")
        self.pressure = float(pressure_bar) * BAR_A3_TO_KCALMOL
        self.pressure_bar = float(pressure_bar)
        self.T = float(temperature)
        self.tau_fs = None if tau_fs is None else float(tau_fs)
        self.nchain = int(nchain)
        self.mode = mode
        self.gamma_st = float(surface_tension) * BAR_A3_TO_KCALMOL
        self.scale_axes = tuple(bool(b) for b in scale_axes)
        if mode == "aniso" and not any(self.scale_axes):
            raise ValueError("at least one axis must be scalable")


class MonteCarloAnisotropicBarostat(MonteCarloBarostat):
    """Anisotropic NPT: each attempt scales ONE randomly chosen (enabled)
    box axis, so the three box lengths relax independently (crystals,
    interfaces). Same acceptance rule; the volume-change Jacobian term is
    unchanged because only the total volume enters ln(V'/V)."""

    def __init__(self, pressure_bar, temperature, group_id=None, seed=0,
                 dv_max=None, scale_axes=(True, True, True)):
        super().__init__(np.mean(np.atleast_1d(pressure_bar)), temperature,
                         group_id=group_id, seed=seed, dv_max=dv_max)
        p = np.broadcast_to(
            np.atleast_1d(np.asarray(pressure_bar, np.float64)), (3,)
        )
        self.pressure_axes = p * BAR_A3_TO_KCALMOL  # per-axis, kcal/mol/A^3
        self.scale_axes = np.asarray(scale_axes, bool)
        if not self.scale_axes.any():
            raise ValueError("at least one axis must be scalable")

    def _propose(self, system, k1):
        box = system.box_diag
        V = np.prod(box, axis=1)
        nrep = system.nreplicas
        ka, kb = jax.random.split(k1)
        enabled = np.flatnonzero(self.scale_axes)
        pick = np.asarray(
            jax.random.randint(ka, (nrep,), 0, len(enabled))
        )
        axis = enabled[pick]
        dv = (np.asarray(jax.random.uniform(kb, (nrep,))) * 2 - 1) * self.dv_max
        scale = np.ones((nrep, 3))
        scale[np.arange(nrep), axis] = (V + dv) / V
        # per-axis pressure: work term P_axis * dV
        self._last_axis = axis
        extra = (self.pressure_axes[axis] - self.pressure) * dv
        return scale, dv, extra


class MonteCarloMembraneBarostat(MonteCarloBarostat):
    """Semi-isotropic NPT for membranes: x/y scale together (the membrane
    plane), z scales independently, with a constant surface-tension term

        w = dE + P dV - gamma dA - N kT ln(V'/V)

    gamma in bar*Angstrom (1 bar*A = 10 mN/m); zmode:
      'free'   -- z fluctuates under P (default),
      'fixed'  -- z never scales (constant normal dimension),
      'volume' -- z rescales to keep V constant (area/tension moves only).
    """

    def __init__(self, pressure_bar, temperature, surface_tension=0.0,
                 group_id=None, seed=0, dv_max=None, zmode="free"):
        super().__init__(pressure_bar, temperature, group_id=group_id,
                         seed=seed, dv_max=dv_max)
        if zmode not in ("free", "fixed", "volume"):
            raise ValueError(f"Unknown zmode: {zmode}")
        self.gamma = surface_tension * BAR_A3_TO_KCALMOL  # kcal/mol/A^2
        self.zmode = zmode

    def _propose(self, system, k1):
        box = system.box_diag
        V = np.prod(box, axis=1)
        A = box[:, 0] * box[:, 1]
        nrep = system.nreplicas
        ka, kb = jax.random.split(k1)
        dv = (np.asarray(jax.random.uniform(kb, (nrep,))) * 2 - 1) * self.dv_max
        # unphysical proposals (V' <= 0) become identity moves -- symmetric,
        # so detailed balance is preserved (dv_max self-tunes far below V)
        dv = np.where(dv <= -0.9 * V, 0.0, dv)
        scale = np.ones((nrep, 3))
        if self.zmode == "volume":
            # pure area move at constant volume: dV = 0, only -gamma dA
            s_xy = (1.0 + dv / V) ** 0.5
            scale[:, 0] = scale[:, 1] = s_xy
            scale[:, 2] = 1.0 / (s_xy * s_xy)
            dA = A * (s_xy * s_xy - 1.0)
            return scale, np.zeros(nrep), -self.gamma * dA
        # alternate xy-area and z-normal moves per replica
        pick_xy = np.asarray(jax.random.uniform(ka, (nrep,))) < 0.5
        if self.zmode == "fixed":
            pick_xy[:] = True
        s_xy = ((V + dv) / V) ** 0.5  # applied to x and y
        s_z = (V + dv) / V
        scale[:, 0] = np.where(pick_xy, s_xy, 1.0)
        scale[:, 1] = np.where(pick_xy, s_xy, 1.0)
        scale[:, 2] = np.where(pick_xy, 1.0, s_z)
        dA = np.where(pick_xy, A * (s_xy * s_xy - 1.0), 0.0)
        return scale, dv, -self.gamma * dA

"""Velocity-Verlet + Langevin dynamics, compiled as one jitted lax.scan.

Numerics are identical to the reference integrator
(torchmd/integrator.py:61-125): per inner step
    first half-kick + drift  ->  recompute forces  ->  Langevin kick
    -> second half-kick
with dt = timestep_fs / TIMEFACTOR, gamma in ps^-1 converted via
PICOSEC2TIMEU, and Langevin noise coefficient sqrt(2*gamma*kB*T*dt/m).

TPU-first differences:
  - `Integrator.step(niter)` runs all `niter` inner steps inside a single
    jitted `lax.scan` on device -- zero host round-trips per step (the
    reference syncs device->host every step via toNumpy=True,
    integrator.py:117 + forces.py:341-345).
  - Thermostat noise comes from an explicit, checkpointable jax PRNG key.
  - Replicas evaluate batched through vmap instead of a Python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import energy_and_forces_fused
from .systems import SimState
from .units import BOLTZMANN, PICOSEC2TIMEU, TIMEFACTOR

__all__ = [
    "TIMEFACTOR", "BOLTZMAN", "PICOSEC2TIMEU",
    "kinetic_energy", "kinetic_to_temp", "maxwell_boltzmann", "Integrator",
]

BOLTZMAN = BOLTZMANN  # reference-compatible alias


def kinetic_energy(masses, vel, batch=None):
    """KE per replica (nreplicas, 1), or per replica per atom-batch
    (nreplicas, nbatches) when `batch` groups atoms into sub-systems
    (reference: torchmd/integrator.py:8-43)."""
    masses = jnp.asarray(masses).reshape(1, -1, 1)
    vel = jnp.asarray(vel)
    if vel.ndim != 3:
        raise ValueError(f"vel must be 3D (nreplicas, natoms, 3), got {vel.ndim}D")
    e_per_atom = 0.5 * masses[:, :, 0] * jnp.sum(vel * vel, axis=2)
    if batch is None:
        return jnp.sum(e_per_atom, axis=1, keepdims=True)
    batch = jnp.asarray(batch)
    nbatch = int(jnp.max(batch)) + 1
    return jax.vmap(
        lambda e: jax.ops.segment_sum(e, batch, num_segments=nbatch)
    )(e_per_atom)


def kinetic_to_temp(Ekin, natoms):
    return 2.0 / (3.0 * np.asarray(natoms) * BOLTZMANN) * Ekin


def maxwell_boltzmann(masses, T, replicas=1, key=None, seed=1):
    """Draw initial velocities ~ N(0, sqrt(kB*T/m)) per component
    (reference: torchmd/integrator.py:46-54). Massless rows (virtual
    sites) get zero velocity."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    masses = jnp.asarray(masses).reshape(-1, 1)
    natoms = masses.shape[0]
    std = jnp.where(
        masses > 0,
        jnp.sqrt(T * BOLTZMANN / jnp.where(masses > 0, masses, 1.0)),
        0.0,
    )
    return std * jax.random.normal(key, (replicas, natoms, 3), dtype=masses.dtype)


def _safe_accel(force, mass):
    """force/mass with massless (virtual-site) rows pinned to zero."""
    return jnp.where(mass > 0, force / jnp.where(mass > 0, mass, 1.0), 0.0)


def _first_vv(pos, vel, force, mass, dt):
    accel = _safe_accel(force, mass)
    pos = pos + vel * dt + 0.5 * accel * dt * dt
    vel = vel + 0.5 * dt * accel
    return pos, vel


def _second_vv(vel, force, mass, dt):
    return vel + 0.5 * dt * _safe_accel(force, mass)


class Integrator:
    """Drop-in replacement for the reference Integrator
    (torchmd/integrator.py:80-125): same constructor, same
    `step(niter) -> (Ekin, pot, T)` contract (numpy outputs), but the inner
    loop is a single compiled scan over `niter` steps."""

    def __init__(self, systems, forces, timestep, device=None, gamma=None,
                 T=None, batch=None, seed=1, mesh=None, mesh_axis="dp",
                 constraints=None, shard="replica", thermostat=None,
                 tau=None, nchain=3, barostat=None, mts=None,
                 mts_recip=None):
        self.dt = timestep / TIMEFACTOR
        self.systems = systems
        self.forces = forces
        self.device = device
        if gamma is not None:
            gamma = gamma / PICOSEC2TIMEU
        self.gamma = gamma
        self.T = T

        if np.any(np.asarray(systems.masses) != 0):
            masses = np.asarray(systems.masses, dtype=np.float64)
        else:
            masses = np.asarray(forces.par.masses, dtype=np.float64).reshape(-1, 1)
        self._masses_np = masses
        dtype = getattr(forces, "dtype", jnp.asarray(systems.pos).dtype)
        self.dtype = dtype
        self.masses = jnp.asarray(masses, dtype=dtype)
        # massless rows are virtual sites: zero DOF, zero thermostat noise
        n_real = int(np.sum(np.asarray(masses).reshape(-1) > 0))
        self._n_real = n_real
        self.vsites = getattr(
            getattr(forces, "par", None), "vsites", None
        ) or None
        if self.vsites is None and n_real < len(masses):
            raise ValueError(
                "massless atoms present but no virtual-site spec on the "
                "parameters (forces.par.vsites)"
            )

        # T may be a scalar or a per-replica (nreplicas,) vector (replica
        # ladders / REMD): the Langevin noise coefficient broadcasts as
        # (R, 1, 1) * (natoms, 1) inside the scan.
        self._use_langevin_T = T is not None and bool(
            np.any(np.asarray(T) > 0)
        )
        if self._use_langevin_T and gamma is not None:
            _m_safe = jnp.where(self.masses > 0, self.masses, 1.0)
            base = jnp.where(
                self.masses > 0,
                jnp.sqrt(2.0 * gamma / _m_safe * BOLTZMANN * self.dt),
                0.0,
            ).astype(dtype)
            if np.ndim(T) > 0:
                t_arr = np.asarray(T, dtype=np.float64)
                if t_arr.shape != (systems.nreplicas,):
                    raise ValueError(
                        f"T vector shape {t_arr.shape} != (nreplicas,)"
                    )
                self.vcoeff = (
                    jnp.asarray(np.sqrt(t_arr), dtype)[:, None, None]
                    * base[None]
                )
            else:
                self.vcoeff = base * jnp.asarray(np.sqrt(float(T)), dtype)
        self.batch = batch
        if batch is not None:
            self.natoms = np.bincount(np.asarray(batch))
        else:
            self.natoms = n_real

        # Optional SHAKE/RATTLE bond constraints (new vs the reference):
        # temperature then uses the reduced DOF count 3N - C.
        self.constraints = None
        self._dof_scale = 1.0
        if constraints:
            from .constraints import build_constraint_spec

            self.constraints = build_constraint_spec(
                forces.par, masses, mode=constraints
            )
            if self.constraints is not None and batch is None:
                ncon = self.constraints.ncon
                self._dof_scale = (3 * n_real) / max(
                    3 * n_real - ncon, 1
                )

        # Optional non-Langevin thermostat (NHC / CSVR -- capabilities the
        # reference lacks). `thermostat` is a name ('nhc', 'csvr',
        # 'langevin') or a thermostat object; `tau` its time constant in fs
        # (default 100 * timestep). With one set, the Langevin kick is
        # disabled and the scan carries the thermostat aux state.
        self._thermostat = None
        self._thermo_aux = {}
        if thermostat is not None and not isinstance(thermostat, str):
            self._thermostat = thermostat
        elif thermostat and str(thermostat).lower() not in ("langevin", "none"):
            from .thermostats import make_thermostat

            if not (T is not None and np.ndim(T) == 0 and T):
                raise ValueError(f"thermostat='{thermostat}' requires T")
            ncon = self.constraints.ncon if self.constraints is not None else 0
            ndof = 3 * n_real - ncon
            tau_fs = float(tau) if tau is not None else 100.0 * float(timestep)
            self._thermostat = make_thermostat(
                thermostat, T, tau_fs, ndof, nchain=nchain
            )
        if self._thermostat is not None:
            self.gamma = None  # NHC/CSVR replaces the Langevin kick
            self._thermo_aux = self._thermostat.init(systems.nreplicas, dtype)

        # Optional MTK extended-system barostat: TRUE NPT dynamics with the
        # box in the compiled scan carry (vs the host-level MC barostats).
        # The MC barostat objects are driven by the run loop between
        # chunks; only dynamic (MTK) barostats change the scan here.
        self._barostat = None
        self._npt = None
        if barostat is not None and not getattr(barostat, "is_dynamic",
                                                False):
            raise ValueError(
                "Monte Carlo barostats attach at the run-loop level "
                "(call barostat.attempt(system, forces) between chunks, "
                "as run.py does); only dynamic barostats (MTKBarostat) "
                "integrate inside the scan"
            )
        if barostat is not None and getattr(barostat, "is_dynamic", False):
            if np.any(np.asarray(systems.box_diag) <= 0):
                raise ValueError("MTK barostat requires a periodic box")
            if mesh is not None and shard == "spatial" and (
                self.vsites is not None or self.constraints is not None
            ):
                raise NotImplementedError(
                    "MTK + spatial sharding currently integrates "
                    "unconstrained point atoms (no virtual sites / "
                    "SHAKE-SETTLE); use the replica-sharded or "
                    "single-device NPT paths for those"
                )
            if self._thermostat is None:
                if self._use_langevin_T and gamma is not None:
                    raise ValueError(
                        "MTK barostat requires thermostat='nhc' or 'csvr' "
                        "(Langevin piston is not implemented)"
                    )
                from .thermostats import make_thermostat

                ncon_npt = (self.constraints.ncon
                            if self.constraints is not None else 0)
                self._thermostat = make_thermostat(
                    "nhc", barostat.T,
                    float(tau) if tau is not None else 100.0 * float(timestep),
                    3 * n_real - ncon_npt, nchain=nchain,
                )
                self._thermo_aux = self._thermostat.init(
                    systems.nreplicas, dtype
                )
            from .thermostats import NoseHooverChain

            ncon_npt = (self.constraints.ncon
                        if self.constraints is not None else 0)
            ndof = 3 * n_real - ncon_npt
            kT = BOLTZMANN * barostat.T
            taup_fs = barostat.tau_fs or 1000.0 * float(timestep)
            taup = taup_fs / TIMEFACTOR
            mode = getattr(barostat, "mode", "iso")
            scale_axes = np.asarray(
                getattr(barostat, "scale_axes", (True, True, True)), bool
            )
            nbdof = {"iso": 1, "membrane": 2}.get(mode,
                                                  int(scale_axes.sum()))
            chain_b = NoseHooverChain(barostat.T, taup_fs, ndof=nbdof,
                                      nchain=barostat.nchain)
            self._barostat = barostat
            self._npt = {
                # per-axis barostat mass: summed over tied axes this
                # reproduces the scalar-MTK W = (Nf+3) kT taup^2
                "W": (ndof + 3) * kT * taup**2 / 3.0,
                "ndof": ndof,
                "P": barostat.pressure,
                "chain_b": chain_b,
                "mode": mode,
                "gamma_st": getattr(barostat, "gamma_st", 0.0),
                "scale_axes": scale_axes,
            }
            nrep = systems.nreplicas
            self._npt_extra = (
                jnp.zeros((nrep, 3), dtype),           # v_eps per axis
                chain_b.init(nrep, dtype),             # baro-chain aux
                None,                                  # virial (lazy init)
            )

        # T given with nothing coupling to it would silently integrate
        # NVE (the reference fails with a TypeError in the noise-coeff
        # sqrt; be explicit instead)
        if (
            self._use_langevin_T
            and self.gamma is None
            and self._thermostat is None
        ):
            raise ValueError(
                "T (thermostat temperature) set but no coupling: pass "
                "gamma (Langevin friction, ps^-1) or thermostat='nhc'|'csvr'"
            )

        # Optional sharding over a device mesh:
        #   shard="replica" (default): the leading (nreplicas) axis of the
        #     state lives on a mesh axis; the compiled scan runs ensemble-
        #     parallel across chips with no per-step communication.
        #   shard="spatial": ONE large system's atom rows shard over the
        #     mesh axis; each step all_gathers positions over ICI, evaluates
        #     its row block of the pair matrix with the same unified math as
        #     the dense path, and psums energies (strong scaling — a
        #     capability the reference cannot express, SURVEY.md §2.9).
        self._sharding = None
        self._spatial = None
        if mesh is not None and shard == "spatial":
            if systems.nreplicas != 1:
                raise ValueError("spatial sharding supports nreplicas=1")
            self._spatial = (mesh, mesh_axis)
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if systems.nreplicas % mesh.shape[mesh_axis] != 0:
                raise ValueError(
                    f"nreplicas={systems.nreplicas} must divide over "
                    f"mesh axis {mesh_axis}={mesh.shape[mesh_axis]}"
                )
            self._sharding = NamedSharding(mesh, P(mesh_axis))

        # r-RESPA multiple timestepping: `timestep` is the OUTER step at
        # which the expensive nonbonded/reciprocal forces fire; bonded
        # forces integrate on `mts` inner substeps (impulse splitting).
        self.mts = None if mts in (None, 0, False) else int(mts)
        if self.mts is not None:
            if self.mts < 1:
                raise ValueError(f"mts must be >= 1, got {mts}")
            if batch is not None:
                raise NotImplementedError("mts + atom batching")
        # Three-tier r-RESPA: the Ewald/PME RECIPROCAL term (slow, smooth)
        # fires every `mts_recip` outer steps with the R*dt impulse, the
        # real-space kernel nonbonded at every outer step, bonded on the
        # `mts` inner substeps. mts_recip=1/None disables the tier.
        self.mts_recip = (None if mts_recip in (None, 0, False, 1)
                          else int(mts_recip))
        if self.mts_recip is not None:
            if self.mts_recip < 1:
                raise ValueError(
                    f"mts_recip must be >= 1, got {mts_recip}")
            if batch is not None:
                raise NotImplementedError("mts_recip + atom batching")

        self.key = jax.random.PRNGKey(seed)
        # device-state cache (avoids host<->device round trips per step();
        # critical when the TPU is reached through a network tunnel)
        self._dev_state = None
        self._host_snap = None
        self._dev_box = None
        self._box_snap = None
        self._packer = None
        # jitted per-chunk neighbor (re)build; an eager vmap(build) here
        # would dispatch ~30 ops one-at-a-time, each a tunnel round trip
        self._build_jit = None
        self._build_jit_kern = None
        # Host-loop fallback: duck-typed force providers without a jittable
        # energy (mock objects, host-coupled NNPs) are stepped with
        # per-iteration compute() calls, like the reference loop.
        self._host_path = not hasattr(forces, "ffparams") or (
            getattr(forces, "external", None) is not None
            and not hasattr(forces.external, "energy_fn")
        )
        self._use_verlet = False
        if self._host_path:
            self._use_cell = False
        elif hasattr(forces, "wants_cell"):
            if hasattr(forces, "resolve_kernel_for_box"):
                forces.resolve_kernel_for_box(
                    np.asarray(systems.box_diag)[0]
                )
            self._use_cell = forces.wants_cell(
                np.asarray(systems.box_diag)[0]
            )
            if not self._use_cell and hasattr(forces, "wants_verlet"):
                self._use_verlet = forces.wants_verlet(
                    np.asarray(systems.box_diag)[0]
                )
        else:
            self._use_cell = getattr(forces, "cell_requested", False)
        if getattr(forces, "ewald_requested", False) and not self._host_path:
            forces.ensure_ewald(np.asarray(systems.box_diag)[0])
        if self.mts is not None and (
            self._spatial is not None or self._host_path
        ):
            raise NotImplementedError(
                "mts (r-RESPA) supports the dense and cell/column/verlet "
                "jittable force paths (no spatial sharding, no host-loop "
                "providers)"
            )
        if self.mts_recip is not None:
            if not (self._use_cell or self._use_verlet):
                raise NotImplementedError(
                    "mts_recip (reciprocal-outer r-RESPA) rides the "
                    "neighbor-kernel (cell/column/verlet) scan, where the "
                    "real-space/reciprocal split exists; the dense path "
                    "folds the reciprocal term into the nonbonded "
                    "evaluator"
                )
            if self._spatial is not None or self._host_path:
                raise NotImplementedError(
                    "mts_recip + spatial sharding / host-loop providers")
            if self._npt is not None:
                raise NotImplementedError(
                    "mts_recip + MTK barostat (the reciprocal impulse "
                    "has no virial form in the NPT splitting yet)")
            if getattr(forces, "_ewald", None) is None:
                raise ValueError(
                    "mts_recip needs Ewald/PME electrostatics "
                    "(elec='ewald'): there is no reciprocal tier to "
                    "defer otherwise")
        if self._npt is not None:
            if self._host_path:
                raise ValueError("MTK barostat needs a jittable force "
                                 "provider")
            if self._spatial is not None:
                if self._use_cell:
                    raise NotImplementedError(
                        "MTK + spatial sharding runs on the row-block "
                        "path (kernel='dense'); the slab-sharded cell "
                        "kernel has no virial form yet"
                    )
                # spatial state has no replica axis (nreplicas==1):
                # strip it from the thermostat aux and the extended
                # barostat state, as the plain spatial scan does
                if self._thermostat is not None:
                    self._thermo_aux = jax.tree_util.tree_map(
                        lambda a: a[0], self._thermo_aux
                    )
                v0, b0, _ = self._npt_extra
                self._npt_extra = (
                    v0[0],
                    jax.tree_util.tree_map(lambda a: a[0], b0),
                    None,
                )
                self._scan_fn = self._build_scan_spatial_npt()
            elif self._use_cell:
                # large periodic systems: true NPT through the cell /
                # column kernel (analytic pair virial from the kernels +
                # value_and_grad of the cheap box-differentiable terms)
                box_all = np.asarray(systems.box_diag)
                if not np.allclose(box_all, box_all[0]):
                    raise ValueError(
                        "cell-list kernel requires equal replica boxes"
                    )
                self._cell_kernel = forces.ensure_cell_kernel(
                    box_all[0], pos0=np.asarray(systems.pos)[0]
                )
                self._scan_fn = self._build_scan_npt_dispatch(cell=True)
            else:
                self._scan_fn = self._build_scan_npt_dispatch(cell=False)
        elif self._spatial is not None:
            if self._host_path:
                raise ValueError("spatial sharding needs a jittable force "
                                 "provider")
            if self._thermostat is not None:
                # spatial sharding: aux has no replica axis (nreplicas==1);
                # the chain/rescale psums kinetic energy over the mesh axis
                self._thermo_aux = jax.tree_util.tree_map(
                    lambda a: a[0], self._thermo_aux
                )
            if self._use_cell:
                # slab-sharded cell path: each rank evaluates its own
                # range of cell columns (see _build_scan_spatial)
                self._cell_kernel = forces.ensure_cell_kernel(
                    np.asarray(systems.box_diag)[0],
                    pos0=np.asarray(systems.pos)[0],
                    # the slab split drives cell_nonbonded_energy_forces
                    # directly; the column kernel has no slab form yet
                    allow_column=False,
                )
            self._scan_fn = self._build_scan_spatial()
        elif self._use_cell:
            box_all = np.asarray(systems.box_diag)
            if not np.allclose(box_all, box_all[0]):
                raise ValueError("cell-list kernel requires equal replica boxes")
            self._cell_kernel = forces.ensure_cell_kernel(
                box_all[0], pos0=np.asarray(systems.pos)[0]
            )
            self._scan_fn = self._build_scan_cell_dispatch()
        elif self._use_verlet:
            # `_cell_kernel` is the generic neighbor-kernel slot: the
            # VerletKernel duck-types CellKernel, so the kernel-carrying
            # scan and the overflow grow/retry machinery are shared.
            box_all = np.asarray(systems.box_diag)
            if not np.allclose(box_all, box_all[0]):
                raise ValueError("verlet kernel requires equal replica boxes")
            self._cell_kernel = forces.ensure_verlet_kernel(
                box_all[0], pos0=np.asarray(systems.pos)[0]
            )
            self._scan_fn = self._build_scan_cell_dispatch()
        elif self.mts is not None and not self._host_path:
            self._scan_fn = self._build_scan_mts()
        elif not self._host_path:
            self._scan_fn = self._build_scan()

    # ------------------------------------------------------------------
    def _build_scan(self):
        forces_obj = self.forces
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        from .external import external_ef

        ext_ef = external_ef(forces_obj.external)
        dt = self.dt
        gamma = self.gamma
        use_thermostat = self._use_langevin_T and gamma is not None
        vcoeff = self.vcoeff if use_thermostat else None
        masses = self.masses
        thermo = self._thermostat
        nreplicas = self.systems.nreplicas
        if thermo is not None:
            thermo_pre = jax.vmap(
                lambda v, a: thermo.pre(v, a, masses, dt)
            )
            if thermo.stochastic:
                thermo_post = jax.vmap(
                    lambda v, a, k: thermo.post(v, a, masses, dt, key=k)
                )
            else:
                thermo_post = jax.vmap(
                    lambda v, a: thermo.post(v, a, masses, dt)
                )

        # Fused analytic (or Pallas) nonbonded + AD bonded: the hot path.
        fused_one = getattr(
            forces_obj, "ef_one",
            lambda pos, box: energy_and_forces_fused(ffp, pos, box, cfg),
        )
        # virtual sites: keep the carried positions snapped onto the
        # reconstructed geometry (force spreading happens inside ef_one)
        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

            apply_vs_v = jax.vmap(lambda p, b: _apply_vs(vsg, p, b))
        # static no-PBC specialization: compile out the minimum-image wrap
        use_pbc = bool(np.any(np.asarray(self.systems.box_diag) != 0))

        def ef_one(pos, box):
            pot, frc = fused_one(pos, box if use_pbc else None)
            e = sum(jax.tree_util.tree_leaves(pot))
            if ext_ef is not None:
                ee, ef = ext_ef(pos, box)
                e = e + ee
                frc = frc + ef
            return e, frc

        e_and_f = jax.vmap(ef_one, in_axes=(0, 0))

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

            shake_v = jax.vmap(
                lambda pn, pr: apply_position_constraints(cs, pn, pr)
            )
            rattle_v = jax.vmap(
                lambda p, v: apply_velocity_constraints(cs, p, v)
            )

        # donate the carry: XLA aliases the state buffers across step()
        # calls instead of copying pos/vel/forces at every chunk boundary
        @partial(jax.jit, static_argnames=("niter",), donate_argnums=(0,))
        def run(carry, box, niter: int):
            def body(c, _):
                st, aux = c
                vel0 = st.vel
                if thermo is not None:
                    vel0, aux = thermo_pre(vel0, aux)
                pos, vel = _first_vv(st.pos, vel0, st.forces, masses, dt)
                if cs is not None:
                    pos_c = shake_v(pos, st.pos)
                    vel = vel + (pos_c - pos) / dt
                    pos = pos_c
                if vsg is not None:
                    pos = apply_vs_v(pos, box)
                epot, frc = e_and_f(pos, box)
                key = st.key
                if use_thermostat:
                    key, sub = jax.random.split(key)
                    noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
                    vel = vel - gamma * vel * dt + noise * vcoeff
                vel = _second_vv(vel, frc, masses, dt)
                if cs is not None:
                    vel = rattle_v(pos, vel)
                if thermo is not None:
                    if thermo.stochastic:
                        key, sub = jax.random.split(key)
                        subs = jax.random.split(sub, nreplicas)
                        vel, aux = thermo_post(vel, aux, subs)
                    else:
                        vel, aux = thermo_post(vel, aux)
                return (SimState(pos, vel, frc, key), aux), epot

            carry, epots = jax.lax.scan(body, carry, None, length=niter)
            return carry, epots[-1]

        return run

    def _build_scan_mts(self):
        """r-RESPA multiple-timestep scan (impulse/Verlet-I splitting,
        Tuckerman, Berne & Martyna 1992 -- capability the reference
        lacks): the expensive slow forces (nonbonded + Ewald reciprocal +
        external) kick the velocities at the OUTER timestep, while the
        stiff bonded forces integrate on `mts` inner substeps. With
        mts=1 the trajectory is exactly the standard velocity-Verlet
        scan's. The scan carry's `forces` slot holds the SLOW component
        (a one-time startup impulse error of dt/2 x F_bonded occurs if
        the seeded System.forces held totals).

        Langevin: friction + noise apply on the inner substeps with the
        substep-scaled noise coefficient. NHC/CSVR couple at the OUTER
        step boundary (XO-RESPA: chain half-updates bracket the full
        r-RESPA step). SHAKE/RATTLE project every inner position/velocity
        update plus the outer kicks. Virtual sites: the fast and slow
        evaluators each snap sites and vjp-spread their own site forces;
        the carried positions re-snap once per outer step."""
        forces_obj = self.forces
        dt = self.dt
        n = int(self.mts)
        ddt = dt / n
        gamma = self.gamma
        use_thermostat = self._use_langevin_T and gamma is not None
        # vcoeff was built for the OUTER dt; inner noise scales as
        # sqrt(ddt/dt) = 1/sqrt(n)
        vcoeff = (self.vcoeff / np.sqrt(n)) if use_thermostat else None
        masses = self.masses
        from .external import external_ef

        ext_ef = external_ef(forces_obj.external)
        use_pbc = bool(np.any(np.asarray(self.systems.box_diag) != 0))

        bonded_one = forces_obj.bonded_ef_one
        nb_one = forces_obj.nb_ef_one

        def fast_one(pos, box):
            pot, frc = bonded_one(pos, box if use_pbc else None)
            leaves = jax.tree_util.tree_leaves(pot)
            e = sum(leaves) if leaves else jnp.zeros((), pos.dtype)
            return e, frc

        def slow_one(pos, box):
            if nb_one is None:
                e = jnp.zeros((), pos.dtype)
                frc = jnp.zeros_like(pos)
            else:
                pot, frc = nb_one(pos, box if use_pbc else None)
                e = sum(jax.tree_util.tree_leaves(pot))
            if ext_ef is not None:
                ee, ef = ext_ef(pos, box)
                e = e + ee
                frc = frc + ef
            return e, frc

        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

            apply_vs_v = jax.vmap(lambda p, b: _apply_vs(vsg, p, b))

            def _vs_wrap(ef):
                def wrapped(pos, box):
                    p2, vjp = jax.vjp(
                        lambda p: _apply_vs(vsg, p, box), pos
                    )
                    e, frc = ef(p2, box)
                    (frc2,) = vjp(frc)
                    return e, frc2

                return wrapped

            fast_one = _vs_wrap(fast_one)
            slow_one = _vs_wrap(slow_one)

        fast_v = jax.vmap(fast_one, in_axes=(0, 0))
        slow_v = jax.vmap(slow_one, in_axes=(0, 0))

        thermo = self._thermostat
        nreplicas = self.systems.nreplicas
        if thermo is not None:
            thermo_pre = jax.vmap(
                lambda v, a: thermo.pre(v, a, masses, dt)
            )
            if thermo.stochastic:
                thermo_post = jax.vmap(
                    lambda v, a, k: thermo.post(v, a, masses, dt, key=k)
                )
            else:
                thermo_post = jax.vmap(
                    lambda v, a: thermo.post(v, a, masses, dt)
                )

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

            shake_v = jax.vmap(
                lambda pn, pr: apply_position_constraints(cs, pn, pr)
            )
            rattle_v = jax.vmap(
                lambda p, v: apply_velocity_constraints(cs, p, v)
            )

        @partial(jax.jit, static_argnames=("niter",), donate_argnums=(0,))
        def run(carry, box, niter: int):
            state0, aux0 = carry
            # fast forces at the chunk's starting positions: computed once
            # here and then carried through the scan (the last inner
            # substep of each body evaluates them at the next body's
            # starting positions already)
            _, ffrc0 = fast_v(state0.pos, box)

            def body(c, _):
                st, ffrc, aux = c
                vel = st.vel
                if thermo is not None:
                    vel, aux = thermo_pre(vel, aux)
                # outer half-kick with the carried slow forces
                vel = vel + 0.5 * dt * _safe_accel(st.forces, masses)
                pos = st.pos
                key = st.key
                e_fast = jnp.zeros(pos.shape[0], pos.dtype)
                for _i in range(n):  # static unroll (n is small)
                    pos_new, vel = _first_vv(pos, vel, ffrc, masses, ddt)
                    if cs is not None:
                        pos_c = shake_v(pos_new, pos)
                        vel = vel + (pos_c - pos_new) / ddt
                        pos_new = pos_c
                    pos = pos_new
                    e_fast, ffrc = fast_v(pos, box)
                    if use_thermostat:
                        key, sub = jax.random.split(key)
                        noise = jax.random.normal(sub, vel.shape,
                                                  dtype=vel.dtype)
                        vel = vel - gamma * vel * ddt + noise * vcoeff
                    vel = _second_vv(vel, ffrc, masses, ddt)
                    if cs is not None:
                        vel = rattle_v(pos, vel)
                if vsg is not None:
                    # evaluators snap internally; re-snap the carry once
                    # per outer step so output positions stay consistent
                    pos = apply_vs_v(pos, box)
                e_slow, sfrc = slow_v(pos, box)
                vel = vel + 0.5 * dt * _safe_accel(sfrc, masses)
                if cs is not None:
                    vel = rattle_v(pos, vel)
                if thermo is not None:
                    if thermo.stochastic:
                        key, sub = jax.random.split(key)
                        subs = jax.random.split(sub, nreplicas)
                        vel, aux = thermo_post(vel, aux, subs)
                    else:
                        vel, aux = thermo_post(vel, aux)
                    if cs is not None:
                        vel = rattle_v(pos, vel)
                epot = e_fast + e_slow
                return (SimState(pos, vel, sfrc, key), ffrc, aux), epot

            (state, _, aux1), epots = jax.lax.scan(
                body, (state0, ffrc0, aux0), None, length=niter
            )
            return (state, aux1), epots[-1]

        return run

    def _build_scan_cell(self):
        """Scan variant carrying per-replica cell lists in the loop state;
        rebuilds (one lax.cond for the whole batch) when any atom moved
        further than skin/2."""
        forces_obj = self.forces
        kern = self._cell_kernel
        dt = self.dt
        gamma = self.gamma
        use_thermostat = self._use_langevin_T and gamma is not None
        vcoeff = self.vcoeff if use_thermostat else None
        masses = self.masses
        thermo = self._thermostat
        nreplicas = self.systems.nreplicas
        if thermo is not None:
            thermo_pre = jax.vmap(
                lambda v, a: thermo.pre(v, a, masses, dt)
            )
            if thermo.stochastic:
                thermo_post = jax.vmap(
                    lambda v, a, k: thermo.post(v, a, masses, dt, key=k)
                )
            else:
                thermo_post = jax.vmap(
                    lambda v, a: thermo.post(v, a, masses, dt)
                )
        from .external import external_ef

        ext_ef = external_ef(forces_obj.external)
        # Ewald reciprocal/self/exclusion terms: the cell kernel only covers
        # the erfc-damped real-space part, so fold the rest in exactly as
        # Forces._build_evaluators does (without it, elec='ewald' +
        # kernel='cell' would integrate wrong energies AND forces).
        ewald = getattr(forces_obj, "_ewald", None)
        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

            apply_vs_v = jax.vmap(lambda p, b: _apply_vs(vsg, p, b))

        build_v = jax.vmap(kern.build)

        def update_all(pos_b, cl_b, box_b):
            pred = jnp.any(
                jax.vmap(
                    lambda c, p, b: kern.needs_rebuild(c, p, b)
                )(cl_b, pos_b, box_b)
            )

            def rebuild():
                new = build_v(pos_b, box_b)
                # keep the overflow flag sticky across rebuilds
                return new._replace(overflow=new.overflow | cl_b.overflow)

            return jax.lax.cond(pred, rebuild, lambda: cl_b)

        def ef_one(pos, box, cl):
            pot, frc = forces_obj.bonded_ef_one(pos, box)
            nb_pot, nb_f = kern.energy_forces(pos, box, cl)
            e = sum(jax.tree_util.tree_leaves(pot)) + sum(
                jax.tree_util.tree_leaves(nb_pot)
            )
            frc = frc + nb_f
            if ewald is not None:
                er, erf_ = ewald.energy_forces(pos, box)
                e = e + er
                frc = frc + erf_
            if ext_ef is not None:
                ee, ef = ext_ef(pos, box)
                e = e + ee
                frc = frc + ef
            return e, frc

        if vsg is not None:
            _inner_cell_ef = ef_one

            def ef_one(pos, box, cl):  # noqa: F811 -- vsite wrap
                p2, vjp = jax.vjp(lambda p: _apply_vs(vsg, p, box), pos)
                e, frc = _inner_cell_ef(p2, box, cl)
                (frc2,) = vjp(frc)
                return e, frc2

        e_and_f = jax.vmap(ef_one, in_axes=(0, 0, 0))

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

            shake_v = jax.vmap(
                lambda pn, pr: apply_position_constraints(cs, pn, pr)
            )
            rattle_v = jax.vmap(
                lambda p, v: apply_velocity_constraints(cs, p, v)
            )

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, box, niter: int):
            def body(c, _):
                st, cl, aux = c
                vel0 = st.vel
                if thermo is not None:
                    vel0, aux = thermo_pre(vel0, aux)
                pos, vel = _first_vv(st.pos, vel0, st.forces, masses, dt)
                if cs is not None:
                    pos_c = shake_v(pos, st.pos)
                    vel = vel + (pos_c - pos) / dt
                    pos = pos_c
                if vsg is not None:
                    pos = apply_vs_v(pos, box)
                cl = update_all(pos, cl, box)
                epot, frc = e_and_f(pos, box, cl)
                key = st.key
                if use_thermostat:
                    key, sub = jax.random.split(key)
                    noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
                    vel = vel - gamma * vel * dt + noise * vcoeff
                vel = _second_vv(vel, frc, masses, dt)
                if cs is not None:
                    vel = rattle_v(pos, vel)
                if thermo is not None:
                    if thermo.stochastic:
                        key, sub = jax.random.split(key)
                        subs = jax.random.split(sub, nreplicas)
                        vel, aux = thermo_post(vel, aux, subs)
                    else:
                        vel, aux = thermo_post(vel, aux)
                return (SimState(pos, vel, frc, key), cl, aux), epot

            carry, epots = jax.lax.scan(body, carry, None, length=niter)
            return carry, epots[-1]

        return run

    def _build_scan_mts_cell(self):
        """r-RESPA on the neighbor-kernel path (cell/column/verlet).

        Same impulse splitting as `_build_scan_mts` -- bonded forces
        integrate on `mts` inner substeps, the expensive kernel
        nonbonded + Ewald reciprocal + external forces kick at the OUTER
        step -- but the slow stage evaluates through the carried
        neighbor structure. The skin-criterion rebuild fires once per
        outer step, right before the slow impulse (the fast bonded
        forces never touch the neighbor tables, so inner-substep drift
        only matters at the next slow evaluation, which the skin/2
        criterion already covers). This is exactly where MTS pays:
        large-N systems whose nonbonded stage dominates the step.
        Carry/return signature matches `_build_scan_cell` so step()'s
        grow/retry loop is shared.

        Three-tier variant (`mts_recip` = R > 1): the Ewald/PME
        RECIPROCAL term — smooth and slowly varying by construction —
        leaves the slow stage and fires every R outer steps as an R*dt
        impulse with symmetric half-kicks bracketing each R-cycle
        (Verlet-I/impulse splitting, one tier up). The real-space kernel
        stays on the outer dt (it carries the stiff short-range core and
        must see every neighbor-scale move), bonded on the `mts` inner
        substeps. Chunks must close a full cycle (niter % R == 0) so the
        closing half-kick lands inside the scan; the reported potential
        is exact at chunk ends (the last body evaluates the reciprocal
        term fresh)."""
        forces_obj = self.forces
        kern = self._cell_kernel
        dt = self.dt
        n = int(self.mts or 1)
        R = int(self.mts_recip or 1)
        ddt = dt / n
        gamma = self.gamma
        use_thermostat = self._use_langevin_T and gamma is not None
        # inner-substep noise scales as sqrt(ddt/dt) = 1/sqrt(n)
        vcoeff = (self.vcoeff / np.sqrt(n)) if use_thermostat else None
        masses = self.masses
        thermo = self._thermostat
        nreplicas = self.systems.nreplicas
        if thermo is not None:
            thermo_pre = jax.vmap(
                lambda v, a: thermo.pre(v, a, masses, dt)
            )
            if thermo.stochastic:
                thermo_post = jax.vmap(
                    lambda v, a, k: thermo.post(v, a, masses, dt, key=k)
                )
            else:
                thermo_post = jax.vmap(
                    lambda v, a: thermo.post(v, a, masses, dt)
                )
        ewald = getattr(forces_obj, "_ewald", None)
        # R > 1: the reciprocal term gets its own (outermost) tier;
        # otherwise it folds into the slow stage as before
        ewald_in_slow = ewald if R == 1 else None
        from .external import external_ef

        ext_ef = external_ef(forces_obj.external)

        def fast_one(pos, box):
            pot, frc = forces_obj.bonded_ef_one(pos, box)
            leaves = jax.tree_util.tree_leaves(pot)
            e = sum(leaves) if leaves else jnp.zeros((), pos.dtype)
            return e, frc

        def slow_one(pos, box, cl):
            nb_pot, nb_f = kern.energy_forces(pos, box, cl)
            e = sum(jax.tree_util.tree_leaves(nb_pot))
            frc = nb_f
            if ewald_in_slow is not None:
                er, erf_ = ewald_in_slow.energy_forces(pos, box)
                e = e + er
                frc = frc + erf_
            if ext_ef is not None:
                ee, ef = ext_ef(pos, box)
                e = e + ee
                frc = frc + ef
            return e, frc

        def recip_one(pos, box):
            return ewald.energy_forces(pos, box)

        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

            apply_vs_v = jax.vmap(lambda p, b: _apply_vs(vsg, p, b))

            _inner_fast = fast_one
            _inner_slow = slow_one
            _inner_recip = recip_one

            def fast_one(pos, box):  # noqa: F811 -- vsite wrap
                p2, vjp = jax.vjp(lambda p: _apply_vs(vsg, p, box), pos)
                e, frc = _inner_fast(p2, box)
                (frc2,) = vjp(frc)
                return e, frc2

            def slow_one(pos, box, cl):  # noqa: F811 -- vsite wrap
                p2, vjp = jax.vjp(lambda p: _apply_vs(vsg, p, box), pos)
                e, frc = _inner_slow(p2, box, cl)
                (frc2,) = vjp(frc)
                return e, frc2

            def recip_one(pos, box):  # noqa: F811 -- vsite wrap
                p2, vjp = jax.vjp(lambda p: _apply_vs(vsg, p, box), pos)
                e, frc = _inner_recip(p2, box)
                (frc2,) = vjp(frc)
                return e, frc2

        fast_v = jax.vmap(fast_one, in_axes=(0, 0))
        slow_v = jax.vmap(slow_one, in_axes=(0, 0, 0))
        recip_v = jax.vmap(recip_one, in_axes=(0, 0)) if R > 1 else None

        build_v = jax.vmap(kern.build)

        def update_all(pos_b, cl_b, box_b):
            pred = jnp.any(
                jax.vmap(
                    lambda c, p, b: kern.needs_rebuild(c, p, b)
                )(cl_b, pos_b, box_b)
            )

            def rebuild():
                new = build_v(pos_b, box_b)
                return new._replace(overflow=new.overflow | cl_b.overflow)

            return jax.lax.cond(pred, rebuild, lambda: cl_b)

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

            shake_v = jax.vmap(
                lambda pn, pr: apply_position_constraints(cs, pn, pr)
            )
            rattle_v = jax.vmap(
                lambda p, v: apply_velocity_constraints(cs, p, v)
            )

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, box, niter: int):
            state0, cl0, aux0 = carry
            _, ffrc0 = fast_v(state0.pos, box)
            if R > 1:
                if niter % R:
                    raise ValueError(
                        f"mts_recip={R}: step()/chunk length must close "
                        f"full reciprocal cycles (niter % {R} == 0), got "
                        f"{niter}")
                # chunk prologue: the cycle-opening half-kick needs the
                # reciprocal forces at the entry positions (identical to
                # the previous chunk's closing evaluation)
                e_rec0, rfrc0 = recip_v(state0.pos, box)

            def body(c, _):
                if R > 1:
                    st, cl, ffrc, rfrc, e_rec, cnt, aux = c
                else:
                    st, cl, ffrc, aux = c
                vel = st.vel
                if thermo is not None:
                    vel, aux = thermo_pre(vel, aux)
                if R > 1:
                    # opening reciprocal half-impulse at cycle starts
                    w_open = jnp.where(cnt == 0, 0.5 * R * dt, 0.0)
                    vel = vel + w_open * _safe_accel(rfrc, masses)
                # outer half-kick with the carried slow forces
                vel = vel + 0.5 * dt * _safe_accel(st.forces, masses)
                pos = st.pos
                key = st.key
                e_fast = jnp.zeros(pos.shape[0], pos.dtype)
                for _i in range(n):  # static unroll (n is small)
                    pos_new, vel = _first_vv(pos, vel, ffrc, masses, ddt)
                    if cs is not None:
                        pos_c = shake_v(pos_new, pos)
                        vel = vel + (pos_c - pos_new) / ddt
                        pos_new = pos_c
                    pos = pos_new
                    e_fast, ffrc = fast_v(pos, box)
                    if use_thermostat:
                        key, sub = jax.random.split(key)
                        noise = jax.random.normal(sub, vel.shape,
                                                  dtype=vel.dtype)
                        vel = vel - gamma * vel * ddt + noise * vcoeff
                    vel = _second_vv(vel, ffrc, masses, ddt)
                    if cs is not None:
                        vel = rattle_v(pos, vel)
                if vsg is not None:
                    # evaluators snap internally; re-snap the carry once
                    # per outer step (the neighbor rebuild below must bin
                    # the true site geometry)
                    pos = apply_vs_v(pos, box)
                cl = update_all(pos, cl, box)
                e_slow, sfrc = slow_v(pos, box, cl)
                vel = vel + 0.5 * dt * _safe_accel(sfrc, masses)
                if R > 1:
                    # closing half-impulse: evaluate the reciprocal term
                    # only on the cycle's last step (the saved work)
                    at_close = cnt == R - 1
                    e_rec, rfrc = jax.lax.cond(
                        at_close,
                        lambda: recip_v(pos, box),
                        lambda: (e_rec, rfrc),
                    )
                    w_close = jnp.where(at_close, 0.5 * R * dt, 0.0)
                    vel = vel + w_close * _safe_accel(rfrc, masses)
                    cnt = jnp.where(at_close, 0, cnt + 1)
                if cs is not None:
                    vel = rattle_v(pos, vel)
                if thermo is not None:
                    if thermo.stochastic:
                        key, sub = jax.random.split(key)
                        subs = jax.random.split(sub, nreplicas)
                        vel, aux = thermo_post(vel, aux, subs)
                    else:
                        vel, aux = thermo_post(vel, aux)
                    if cs is not None:
                        vel = rattle_v(pos, vel)
                epot = e_fast + e_slow
                if R > 1:
                    # e_rec is fresh on cycle-closing steps (incl. the
                    # chunk's last body, since niter % R == 0) and at most
                    # R-1 steps stale in between
                    epot = epot + e_rec
                    out = (SimState(pos, vel, sfrc, key), cl, ffrc,
                           rfrc, e_rec, cnt, aux)
                else:
                    out = (SimState(pos, vel, sfrc, key), cl, ffrc, aux)
                return out, epot

            if R > 1:
                init = (state0, cl0, ffrc0, rfrc0, e_rec0,
                        jnp.zeros((), jnp.int32), aux0)
                (state, cl, _, _, _, _, aux1), epots = jax.lax.scan(
                    body, init, None, length=niter
                )
            else:
                (state, cl, _, aux1), epots = jax.lax.scan(
                    body, (state0, cl0, ffrc0, aux0), None, length=niter
                )
            return (state, cl, aux1), epots[-1]

        return run

    def _build_scan_cell_dispatch(self):
        """Neighbor-kernel scan: r-RESPA variant when mts/mts_recip set."""
        if self.mts is not None or self.mts_recip is not None:
            return self._build_scan_mts_cell()
        return self._build_scan_cell()

    def _build_scan_npt(self):
        """MTK isotropic NPT scan: the box, the barostat velocity v_eps and
        both Nose-Hoover chains live in the scan carry; each step advances
        the explicit reversible MTK splitting (see barostat.MTKBarostat).

        Forces AND the scaling virial come from ONE value_and_grad over
        (pos, s) of E(s*pos, s*box) through the pure-jnp potential path --
        exact for every term including the box-dependent Ewald reciprocal
        sum; the virial is carried between steps so each step does a single
        energy evaluation.
        """
        forces_obj = self.forces
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        ewald = forces_obj._ewald
        ext_energy = getattr(forces_obj.external, "energy_fn", None)
        dt = self.dt
        dt2 = 0.5 * dt
        masses = self.masses
        thermo = self._thermostat
        npt = self._npt
        W = npt["W"]           # per-axis barostat mass
        ndof = npt["ndof"]
        P = npt["P"]
        chain_b = npt["chain_b"]
        mode = npt["mode"]
        gamma_st = npt["gamma_st"]
        axes_mask = jnp.asarray(npt["scale_axes"], self.dtype)
        nreplicas = self.systems.nreplicas

        from .potentials import compute_potentials

        # virtual sites: reconstruct inside the pure energy so ONE
        # value_and_grad over (pos, s) both spreads site forces onto the
        # hosts (vjp of the reconstruction) and carries the rigid-geometry
        # contribution into the scaling virial dU/ds — the site offsets
        # (fixed lengths in A) do NOT scale with the box, and AD accounts
        # for that exactly.
        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

        def etot_pure(pos, box):
            if vsg is not None:
                pos = _apply_vs(vsg, pos, box)
            pot = compute_potentials(ffp, pos, box, cfg)
            e = sum(jax.tree_util.tree_leaves(pot))
            if ewald is not None:
                e = e + ewald.energy(pos, box)
            if ext_energy is not None:
                e = e + ext_energy(pos, box)
            return e

        def ef_vir(pos, box):
            def e2(p, s):
                return etot_pure(p * s, box * s)

            one = jnp.ones((3,), pos.dtype)
            e, (gp, dUds) = jax.value_and_grad(e2, argnums=(0, 1))(pos, one)
            return e, -gp, -dUds  # (epot, forces, per-axis virial (3,))

        def phi(x):
            # sinh(x)/x with the series for small arguments
            x2 = x * x
            small = jnp.abs(x) < 1e-3
            safe = jnp.where(small, 1.0, x)
            return jnp.where(
                small, 1.0 + x2 / 6.0 + x2 * x2 / 120.0,
                jnp.sinh(safe) / safe,
            )

        def project(g):
            """Mode coupling of the per-axis barostat forces/velocities."""
            if mode == "iso":
                return jnp.full((3,), jnp.mean(g), g.dtype)
            if mode == "membrane":
                gxy = 0.5 * (g[0] + g[1])
                return jnp.stack([gxy, gxy, g[2]])
            return g * axes_mask  # aniso (+ frozen axes)

        def baro_half(v_eps, aux_b):
            vb = v_eps[None, :]
            mb = jnp.full((1, 1), W, v_eps.dtype)
            vb, xi, vxi = chain_b._chain_half(
                vb, aux_b["xi"], aux_b["vxi"], mb, 0.5 * dt
            )
            return vb[0], {"xi": xi, "vxi": vxi}

        def eps_kick(v_eps, vel, vir, box):
            K2ax = jnp.sum(masses * vel * vel, axis=0)     # (3,) 2K_k
            V = box[0] * box[1] * box[2]
            G = K2ax + jnp.sum(K2ax) / ndof + vir - V * P
            if mode == "membrane" and gamma_st != 0.0:
                A = box[0] * box[1]
                G = G + gamma_st * A * jnp.asarray(
                    [1.0, 1.0, 0.0], v_eps.dtype
                )
            return project(v_eps + dt2 * project(G) / W)

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

        def step_one(pos, vel, frc, vir, box, v_eps, aux_p, aux_b, kr):
            # (1) half chain updates: barostat DOF, then particles
            v_eps, aux_b = baro_half(v_eps, aux_b)
            vel, aux_p = thermo.pre(vel, aux_p, masses, dt)
            # (2) barostat velocity half kick
            v_eps = eps_kick(v_eps, vel, vir, box)
            # (3) particle velocity update with box-coupling factors
            x = (v_eps + jnp.sum(v_eps) / ndof) * dt2     # (3,)
            vel = (
                vel * jnp.exp(-x)
                + dt2 * _safe_accel(frc, masses)
                * jnp.exp(-0.5 * x) * phi(0.5 * x)
            )
            # (4) position + box update (component-wise)
            u = v_eps * dt
            drift = dt * jnp.exp(0.5 * u) * phi(0.5 * u)   # (3,)
            pos_prev = pos
            pos = pos * jnp.exp(u) + vel * drift
            box = box * jnp.exp(u)
            if cs is not None:
                # SHAKE/SETTLE-ROLL: project the barostat-scaled drift
                # back onto the constraint manifold (gradients from the
                # scaled previous geometry), fold the projection into the
                # velocities through the drift factor, and account the
                # implied constraint force in the virial (without it the
                # barostat sees a biased internal pressure and the
                # density drifts).
                ref = pos_prev * jnp.exp(u)
                pos_c = apply_position_constraints(cs, pos, ref)
                delta = pos_c - pos
                vel = vel + delta / drift
                pos = pos_c
            if vsg is not None:
                # carried site rows were box-scaled like real atoms above;
                # re-snap onto the reconstructed geometry (ef_vir snaps
                # internally for forces/virial — this keeps the carry and
                # any trajectory output consistent with it)
                pos = _apply_vs(vsg, pos, box)
            # (5) energy / forces / virial at the new phase point
            epot, frc, vir = ef_vir(pos, box)
            if cs is not None:
                f_con = 2.0 * masses * delta / (drift * drift)
                vir = vir + jnp.sum(f_con * pos, axis=0)
            # (6) mirror velocity update
            vel = (
                vel * jnp.exp(-x)
                + dt2 * _safe_accel(frc, masses)
                * jnp.exp(-0.5 * x) * phi(0.5 * x)
            )
            # (7) mirror barostat kick, (8) half chain updates (reverse order)
            v_eps = eps_kick(v_eps, vel, vir, box)
            if thermo.stochastic:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt, key=kr)
            else:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt)
            v_eps, aux_b = baro_half(v_eps, aux_b)
            if cs is not None:
                # RATTLE-ROLL: project all velocity modifications (mirror
                # kick, thermostat noise) back onto the manifold
                vel = apply_velocity_constraints(cs, pos, vel)
            return pos, vel, frc, vir, box, v_eps, aux_p, aux_b, epot

        step_v = jax.vmap(step_one)

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, niter: int):
            def body(c, _):
                st, box, v_eps, aux_p, aux_b, vir = c
                key = st.key
                if thermo.stochastic:
                    key, sub = jax.random.split(key)
                    krs = jax.random.split(sub, nreplicas)
                else:
                    krs = jnp.zeros((nreplicas, 2), jnp.uint32)
                pos, vel, frc, vir, box, v_eps, aux_p, aux_b, epot = step_v(
                    st.pos, st.vel, st.forces, vir, box, v_eps, aux_p,
                    aux_b, krs,
                )
                return (
                    (SimState(pos, vel, frc, key), box, v_eps, aux_p,
                     aux_b, vir),
                    epot,
                )

            carry, epots = jax.lax.scan(body, carry, None, length=niter)
            return carry, epots[-1]

        self._npt_ef_vir = jax.jit(jax.vmap(ef_vir))
        return run

    def _build_scan_npt_cell(self):
        """MTK NPT scan on the cell/column kernel path (large periodic
        systems).

        Same reversible MTK splitting as `_build_scan_npt`, but the
        O(N^2) dense value_and_grad is replaced by:
          - pair terms: the neighbor kernel's `energy_forces_virial`
            (analytic per-axis pair virial accumulated in the Pallas
            kernels / jnp cell math — exact, no AD double-evaluation),
          - bonded + Ewald reciprocal/self/exclusion + external terms:
            ONE value_and_grad over (pos, s) of the cheap
            box-differentiable energy E(s*pos, s*box)
            (`compute_potentials(..., nonbonded=False)` keeps 1-4 terms
            and their LJ/elec want-flags intact).
        The neighbor structure lives in the scan carry and rebuilds
        in-scan by the skin criterion with the CURRENT (traced) box —
        both kernels evaluate with box-traced ghost shifts, so in-scan
        box changes stay exact between rebuilds."""
        forces_obj = self.forces
        kern = self._cell_kernel
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        ewald = forces_obj._ewald
        ext_energy = getattr(forces_obj.external, "energy_fn", None)
        dt = self.dt
        dt2 = 0.5 * dt
        masses = self.masses
        thermo = self._thermostat
        npt = self._npt
        W = npt["W"]
        ndof = npt["ndof"]
        P = npt["P"]
        chain_b = npt["chain_b"]
        mode = npt["mode"]
        gamma_st = npt["gamma_st"]
        axes_mask = jnp.asarray(npt["scale_axes"], self.dtype)
        nreplicas = self.systems.nreplicas

        from .potentials import compute_potentials

        # virtual sites on the kernel NPT path: the cheap terms
        # reconstruct sites INSIDE the (pos, s) value_and_grad (AD spreads
        # site forces onto hosts and carries the rigid-geometry dU/ds
        # exactly, as on the dense path); the kernel's analytic pair
        # virial treats every row as a real atom scaling with the box, so
        # its site-row forces are (a) vjp-spread onto hosts and (b) the
        # per-axis virial is corrected by sum_i F_i*(r_i - dr_i/ds),
        # where dr/ds comes from ONE jvp of the reconstruction -- the
        # fixed-length site offsets do NOT scale with the box.
        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

        def e_cheap(pos, box):
            def inner(p, s):
                ps = p * s
                if vsg is not None:
                    ps = _apply_vs(vsg, ps, box * s)
                pot = compute_potentials(ffp, ps, box * s, cfg,
                                         nonbonded=False)
                # explicit zero: a bonded-term-free system (pure LJ gas)
                # yields an empty dict, and sum([]) is an int
                e = sum(jax.tree_util.tree_leaves(pot),
                        jnp.zeros((), p.dtype))
                if ewald is not None:
                    e = e + ewald.energy(ps, box * s)
                if ext_energy is not None:
                    e = e + ext_energy(ps, box * s)
                return e

            return inner

        def ef_vir(pos, box, cl):
            inner = e_cheap(pos, box)
            one = jnp.ones((3,), pos.dtype)
            e_ch, (gp, dUds) = jax.value_and_grad(
                inner, argnums=(0, 1)
            )(pos, one)
            if vsg is not None:
                # evaluate the kernel at the SNAPPED geometry (in-scan
                # positions are already snapped; entry-state positions
                # may not be -- the dense NPT path snaps inside its AD
                # energy, and vir0 must agree or v_eps picks up a
                # permanent offset at the first step)
                p2, vjp_fn = jax.vjp(
                    lambda p: _apply_vs(vsg, p, box), pos
                )
                nb_pot, nb_f, nb_vir = kern.energy_forces_virial(
                    p2, box, cl
                )
                (nb_f_spread,) = vjp_fn(nb_f)
                # dr/ds of the snapped geometry (tangents = (pos, box)
                # since r(s) = snap(s*pos, s*box)); host rows give
                # T == r exactly, site rows differ by the rigid offset
                _, T = jax.jvp(
                    lambda p, b: _apply_vs(vsg, p, b),
                    (pos, box), (pos, box),
                )
                nb_vir = nb_vir - jnp.sum(nb_f * (p2 - T), axis=0)
                nb_f = nb_f_spread
            else:
                nb_pot, nb_f, nb_vir = kern.energy_forces_virial(
                    pos, box, cl
                )
            e = e_ch + sum(jax.tree_util.tree_leaves(nb_pot))
            return e, -gp + nb_f, -dUds + nb_vir

        def phi(x):
            x2 = x * x
            small = jnp.abs(x) < 1e-3
            safe = jnp.where(small, 1.0, x)
            return jnp.where(
                small, 1.0 + x2 / 6.0 + x2 * x2 / 120.0,
                jnp.sinh(safe) / safe,
            )

        def project(g):
            if mode == "iso":
                return jnp.full((3,), jnp.mean(g), g.dtype)
            if mode == "membrane":
                gxy = 0.5 * (g[0] + g[1])
                return jnp.stack([gxy, gxy, g[2]])
            return g * axes_mask

        def baro_half(v_eps, aux_b):
            vb = v_eps[None, :]
            mb = jnp.full((1, 1), W, v_eps.dtype)
            vb, xi, vxi = chain_b._chain_half(
                vb, aux_b["xi"], aux_b["vxi"], mb, 0.5 * dt
            )
            return vb[0], {"xi": xi, "vxi": vxi}

        def eps_kick(v_eps, vel, vir, box):
            K2ax = jnp.sum(masses * vel * vel, axis=0)
            V = box[0] * box[1] * box[2]
            G = K2ax + jnp.sum(K2ax) / ndof + vir - V * P
            if mode == "membrane" and gamma_st != 0.0:
                A = box[0] * box[1]
                G = G + gamma_st * A * jnp.asarray(
                    [1.0, 1.0, 0.0], v_eps.dtype
                )
            return project(v_eps + dt2 * project(G) / W)

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

        # --- first half: barostat/thermostat chains + kick + drift ----
        def pre_one(pos, vel, frc, vir, box, v_eps, aux_p, aux_b):
            v_eps, aux_b = baro_half(v_eps, aux_b)
            vel, aux_p = thermo.pre(vel, aux_p, masses, dt)
            v_eps = eps_kick(v_eps, vel, vir, box)
            x = (v_eps + jnp.sum(v_eps) / ndof) * dt2
            vel = (
                vel * jnp.exp(-x)
                + dt2 * _safe_accel(frc, masses)
                * jnp.exp(-0.5 * x) * phi(0.5 * x)
            )
            u = v_eps * dt
            drift = dt * jnp.exp(0.5 * u) * phi(0.5 * u)
            pos_prev = pos
            pos = pos * jnp.exp(u) + vel * drift
            box = box * jnp.exp(u)
            if cs is not None:
                ref = pos_prev * jnp.exp(u)
                pos_c = apply_position_constraints(cs, pos, ref)
                delta = pos_c - pos
                vel = vel + delta / drift
                pos = pos_c
            else:
                delta = jnp.zeros_like(pos)
            if vsg is not None:
                # site rows were box-scaled like real atoms above; re-snap
                # onto the reconstructed geometry before the neighbor
                # rebuild bins them and ef_vir evaluates
                pos = _apply_vs(vsg, pos, box)
            return pos, vel, box, v_eps, aux_p, aux_b, x, drift, delta

        # --- evaluation at the new phase point (+ constraint virial) --
        def ef_one(pos, box, cl, delta, drift):
            epot, frc, vir = ef_vir(pos, box, cl)
            if cs is not None:
                f_con = 2.0 * masses * delta / (drift * drift)
                vir = vir + jnp.sum(f_con * pos, axis=0)
            return epot, frc, vir

        # --- second half: mirror kick + chains (reverse order) --------
        def post_one(pos, vel, frc, vir, box, v_eps, aux_p, aux_b, x, kr):
            vel = (
                vel * jnp.exp(-x)
                + dt2 * _safe_accel(frc, masses)
                * jnp.exp(-0.5 * x) * phi(0.5 * x)
            )
            v_eps = eps_kick(v_eps, vel, vir, box)
            if thermo.stochastic:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt, key=kr)
            else:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt)
            v_eps, aux_b = baro_half(v_eps, aux_b)
            if cs is not None:
                vel = apply_velocity_constraints(cs, pos, vel)
            return vel, v_eps, aux_p, aux_b

        pre_v = jax.vmap(pre_one)
        ef_v = jax.vmap(ef_one, in_axes=(0, 0, 0, 0, 0))
        post_v = jax.vmap(post_one)

        build_v = jax.vmap(kern.build)

        def update_all(pos_b, cl_b, box_b):
            pred = jnp.any(
                jax.vmap(
                    lambda c, p, b: kern.needs_rebuild(c, p, b)
                )(cl_b, pos_b, box_b)
            )

            def rebuild():
                new = build_v(pos_b, box_b)
                return new._replace(overflow=new.overflow | cl_b.overflow)

            return jax.lax.cond(pred, rebuild, lambda: cl_b)

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, niter: int):
            def body(c, _):
                st, box, v_eps, aux_p, aux_b, vir, cl = c
                key = st.key
                if thermo.stochastic:
                    key, sub = jax.random.split(key)
                    krs = jax.random.split(sub, nreplicas)
                else:
                    krs = jnp.zeros((nreplicas, 2), jnp.uint32)
                pos, vel, box, v_eps, aux_p, aux_b, x, drift, delta = (
                    pre_v(st.pos, st.vel, st.forces, vir, box,
                          v_eps, aux_p, aux_b)
                )
                cl = update_all(pos, cl, box)
                epot, frc, vir = ef_v(pos, box, cl, delta, drift)
                vel, v_eps, aux_p, aux_b = post_v(
                    pos, vel, frc, vir, box, v_eps, aux_p, aux_b, x, krs
                )
                return (
                    (SimState(pos, vel, frc, key), box, v_eps, aux_p,
                     aux_b, vir, cl),
                    epot,
                )

            carry, epots = jax.lax.scan(body, carry, None, length=niter)
            return carry, epots[-1]

        self._npt_ef_vir_cell = jax.jit(
            jax.vmap(ef_vir, in_axes=(0, 0, 0))
        )
        return run

    def _build_scan_npt_dispatch(self, cell: bool):
        """MTK NPT scan: r-RESPA variant when mts is set."""
        if self.mts is not None:
            return self._build_scan_npt_mts(cell)
        return self._build_scan_npt_cell() if cell else self._build_scan_npt()

    def _build_scan_npt_mts(self, use_cell: bool):
        """r-RESPA + MTK NPT (XO-RESPA-style composition).

        Splitting per outer step (dt, n = mts inner substeps, ddt = dt/n):
          baro-chain half + particle-chain half (outer)
          -> eps half-kick with the carried TOTAL virial
          -> slow impulse dt/2 (plain kick; the v_eps decay factors ride
             the inner propagator)
          -> n x [MTK core at ddt with the FAST (bonded) forces:
               exp-coupled fast half-kick, box+position drift,
               SHAKE-ROLL, vsite re-snap, fast force eval (last substep
               adds the fast dU/ds), mirror fast half-kick, RATTLE]
          -> neighbor rebuild + slow evaluation at the new phase point
             (kernel analytic virial on the cell/column path, dense
             nonbonded (p, s) AD otherwise; + Ewald recip + external)
          -> slow impulse dt/2 -> eps half-kick -> chains (reverse).
        At n=1 this is the same reversible MTK splitting as
        `_build_scan_npt(_cell)` up to where the exp(v_eps*dt) decay
        factors multiply the slow kick (an O(dt^3) rearrangement), so
        trajectories agree in the dt->0 limit rather than bitwise.
        Langevin friction is rejected with MTK (thermostats couple at
        the outer boundary via NHC/CSVR as in the plain NPT scans)."""
        forces_obj = self.forces
        kern = self._cell_kernel if use_cell else None
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        ewald = forces_obj._ewald
        ext_energy = getattr(forces_obj.external, "energy_fn", None)
        dt = self.dt
        dt2 = 0.5 * dt
        n = int(self.mts)
        ddt = dt / n
        ddt2 = 0.5 * ddt
        masses = self.masses
        thermo = self._thermostat
        npt = self._npt
        W = npt["W"]
        ndof = npt["ndof"]
        P = npt["P"]
        chain_b = npt["chain_b"]
        mode = npt["mode"]
        gamma_st = npt["gamma_st"]
        axes_mask = jnp.asarray(npt["scale_axes"], self.dtype)
        nreplicas = self.systems.nreplicas

        from .potentials import compute_potentials, nonbonded_energies

        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs

        def fast_energy(p, s, box):
            ps = p * s
            if vsg is not None:
                ps = _apply_vs(vsg, ps, box * s)
            pot = compute_potentials(ffp, ps, box * s, cfg,
                                     nonbonded=False)
            return sum(jax.tree_util.tree_leaves(pot),
                       jnp.zeros((), p.dtype))

        def fast_ef(pos, box):
            e, g = jax.value_and_grad(fast_energy)(
                pos, jnp.ones((3,), pos.dtype), box
            )
            return e, -g

        def fast_ef_vir(pos, box):
            e, (g, dUds) = jax.value_and_grad(
                fast_energy, argnums=(0, 1)
            )(pos, jnp.ones((3,), pos.dtype), box)
            return e, -g, -dUds

        def slow_extra_energy(p, s, box):
            """Box-differentiable slow terms outside the pair kernel."""
            ps = p * s
            if vsg is not None:
                ps = _apply_vs(vsg, ps, box * s)
            e = jnp.zeros((), p.dtype)
            if ewald is not None:
                e = e + ewald.energy(ps, box * s)
            if ext_energy is not None:
                e = e + ext_energy(ps, box * s)
            return e

        has_extra = ewald is not None or ext_energy is not None

        if use_cell:
            def slow_ef_vir(pos, box, cl):
                if has_extra:
                    e_x, (gx, dUds_x) = jax.value_and_grad(
                        slow_extra_energy, argnums=(0, 1)
                    )(pos, jnp.ones((3,), pos.dtype), box)
                else:
                    e_x = jnp.zeros((), pos.dtype)
                    gx = jnp.zeros_like(pos)
                    dUds_x = jnp.zeros((3,), pos.dtype)
                if vsg is not None:
                    p2, vjp_fn = jax.vjp(
                        lambda p: _apply_vs(vsg, p, box), pos
                    )
                    nb_pot, nb_f, nb_vir = kern.energy_forces_virial(
                        p2, box, cl
                    )
                    (nb_f_spread,) = vjp_fn(nb_f)
                    _, T = jax.jvp(
                        lambda p, b: _apply_vs(vsg, p, b),
                        (pos, box), (pos, box),
                    )
                    nb_vir = nb_vir - jnp.sum(nb_f * (p2 - T), axis=0)
                    nb_f = nb_f_spread
                else:
                    nb_pot, nb_f, nb_vir = kern.energy_forces_virial(
                        pos, box, cl
                    )
                e = e_x + sum(jax.tree_util.tree_leaves(nb_pot))
                return e, -gx + nb_f, -dUds_x + nb_vir
        else:
            def slow_energy_dense(p, s, box):
                ps = p * s
                if vsg is not None:
                    ps = _apply_vs(vsg, ps, box * s)
                pot = nonbonded_energies(ffp, ps, box * s, cfg)
                e = sum(jax.tree_util.tree_leaves(pot),
                        jnp.zeros((), p.dtype))
                if ewald is not None:
                    e = e + ewald.energy(ps, box * s)
                if ext_energy is not None:
                    e = e + ext_energy(ps, box * s)
                return e

            def slow_ef_vir(pos, box):
                e, (g, dUds) = jax.value_and_grad(
                    slow_energy_dense, argnums=(0, 1)
                )(pos, jnp.ones((3,), pos.dtype), box)
                return e, -g, -dUds

        def phi(x):
            x2 = x * x
            small = jnp.abs(x) < 1e-3
            safe = jnp.where(small, 1.0, x)
            return jnp.where(
                small, 1.0 + x2 / 6.0 + x2 * x2 / 120.0,
                jnp.sinh(safe) / safe,
            )

        def project(g):
            if mode == "iso":
                return jnp.full((3,), jnp.mean(g), g.dtype)
            if mode == "membrane":
                gxy = 0.5 * (g[0] + g[1])
                return jnp.stack([gxy, gxy, g[2]])
            return g * axes_mask

        def baro_half(v_eps, aux_b):
            vb = v_eps[None, :]
            mb = jnp.full((1, 1), W, v_eps.dtype)
            vb, xi, vxi = chain_b._chain_half(
                vb, aux_b["xi"], aux_b["vxi"], mb, 0.5 * dt
            )
            return vb[0], {"xi": xi, "vxi": vxi}

        def eps_kick(v_eps, vel, vir, box):
            K2ax = jnp.sum(masses * vel * vel, axis=0)
            V = box[0] * box[1] * box[2]
            G = K2ax + jnp.sum(K2ax) / ndof + vir - V * P
            if mode == "membrane" and gamma_st != 0.0:
                A = box[0] * box[1]
                G = G + gamma_st * A * jnp.asarray(
                    [1.0, 1.0, 0.0], v_eps.dtype
                )
            return project(v_eps + dt2 * project(G) / W)

        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints,
                apply_velocity_constraints,
            )

        def inner_one(pos, vel, box, v_eps, ffrc):
            """One full r-RESPA outer step minus the slow evaluation:
            outer slow impulse is applied by the caller; this advances
            the fast MTK core n times and returns the new phase point,
            the fast energy/forces/virial at it, and the last substep's
            constraint data for the virial accounting."""
            e_fast = jnp.zeros((), pos.dtype)
            vir_f = jnp.zeros((3,), pos.dtype)
            delta = jnp.zeros_like(pos)
            drift = jnp.full((3,), 1.0, pos.dtype)
            for i in range(n):  # static unroll (n is small)
                x = (v_eps + jnp.sum(v_eps) / ndof) * ddt2
                vel = (
                    vel * jnp.exp(-x)
                    + ddt2 * _safe_accel(ffrc, masses)
                    * jnp.exp(-0.5 * x) * phi(0.5 * x)
                )
                u = v_eps * ddt
                drift = ddt * jnp.exp(0.5 * u) * phi(0.5 * u)
                pos_prev = pos
                pos = pos * jnp.exp(u) + vel * drift
                box = box * jnp.exp(u)
                if cs is not None:
                    ref = pos_prev * jnp.exp(u)
                    pos_c = apply_position_constraints(cs, pos, ref)
                    delta = pos_c - pos
                    vel = vel + delta / drift
                    pos = pos_c
                if vsg is not None:
                    pos = _apply_vs(vsg, pos, box)
                if i == n - 1:
                    e_fast, ffrc, vir_f = fast_ef_vir(pos, box)
                else:
                    e_fast, ffrc = fast_ef(pos, box)
                vel = (
                    vel * jnp.exp(-x)
                    + ddt2 * _safe_accel(ffrc, masses)
                    * jnp.exp(-0.5 * x) * phi(0.5 * x)
                )
                if cs is not None:
                    vel = apply_velocity_constraints(cs, pos, vel)
            return pos, vel, box, e_fast, ffrc, vir_f, delta, drift

        def pre_one(pos, vel, sfrc, ffrc, vir, box, v_eps, aux_p, aux_b):
            v_eps, aux_b = baro_half(v_eps, aux_b)
            vel, aux_p = thermo.pre(vel, aux_p, masses, dt)
            v_eps = eps_kick(v_eps, vel, vir, box)
            # outer slow impulse (carried slow forces)
            vel = vel + dt2 * _safe_accel(sfrc, masses)
            pos, vel, box, e_fast, ffrc, vir_f, delta, drift = inner_one(
                pos, vel, box, v_eps, ffrc
            )
            return (pos, vel, box, v_eps, aux_p, aux_b, e_fast, ffrc,
                    vir_f, delta, drift)

        def post_one(pos, vel, sfrc, vir, box, v_eps, aux_p, aux_b, kr):
            vel = vel + dt2 * _safe_accel(sfrc, masses)
            if cs is not None:
                vel = apply_velocity_constraints(cs, pos, vel)
            v_eps = eps_kick(v_eps, vel, vir, box)
            if thermo.stochastic:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt, key=kr)
            else:
                vel, aux_p = thermo.post(vel, aux_p, masses, dt)
            v_eps, aux_b = baro_half(v_eps, aux_b)
            if cs is not None:
                vel = apply_velocity_constraints(cs, pos, vel)
            return vel, v_eps, aux_p, aux_b

        pre_v = jax.vmap(pre_one)
        post_v = jax.vmap(post_one)

        if use_cell:
            slow_v = jax.vmap(slow_ef_vir, in_axes=(0, 0, 0))
            build_v = jax.vmap(kern.build)

            def update_all(pos_b, cl_b, box_b):
                pred = jnp.any(
                    jax.vmap(
                        lambda c, p, b: kern.needs_rebuild(c, p, b)
                    )(cl_b, pos_b, box_b)
                )

                def rebuild():
                    new = build_v(pos_b, box_b)
                    return new._replace(
                        overflow=new.overflow | cl_b.overflow
                    )

                return jax.lax.cond(pred, rebuild, lambda: cl_b)
        else:
            slow_v = jax.vmap(slow_ef_vir, in_axes=(0, 0))

        def con_vir_v(delta, drift, pos):
            """Constraint-force virial of the LAST inner substep (the
            instantaneous estimate entering the outer eps kick)."""
            f_con = 2.0 * masses * delta / (drift * drift)
            return jnp.sum(f_con * pos, axis=0)

        con_v = jax.vmap(con_vir_v)

        # total-virial evaluator for the entry state (step() calls this
        # once per chunk start / resume)
        if use_cell:
            def ef_vir_total(pos, box, cl):
                e_f, f_f, vir_f = fast_ef_vir(pos, box)
                e_s, f_s, vir_s = slow_ef_vir(pos, box, cl)
                return e_f + e_s, f_f + f_s, vir_f + vir_s

            self._npt_ef_vir_cell = jax.jit(
                jax.vmap(ef_vir_total, in_axes=(0, 0, 0))
            )
        else:
            def ef_vir_total(pos, box):
                e_f, f_f, vir_f = fast_ef_vir(pos, box)
                e_s, f_s, vir_s = slow_ef_vir(pos, box)
                return e_f + e_s, f_f + f_s, vir_f + vir_s

            self._npt_ef_vir = jax.jit(jax.vmap(ef_vir_total))

        @partial(jax.jit, static_argnames=("niter",))
        def run(carry, niter: int):
            if use_cell:
                state0, box0, v_eps0, aux_p0, aux_b0, vir0, cl0 = carry
            else:
                state0, box0, v_eps0, aux_p0, aux_b0, vir0 = carry
                cl0 = None
            # fast forces at the chunk's starting positions (the carry's
            # forces slot holds the SLOW component between outer steps)
            _, ffrc0 = jax.vmap(fast_ef)(state0.pos, box0)

            def body(c, _):
                if use_cell:
                    st, box, v_eps, aux_p, aux_b, vir, cl, ffrc = c
                else:
                    st, box, v_eps, aux_p, aux_b, vir, ffrc = c
                key = st.key
                if thermo.stochastic:
                    key, sub = jax.random.split(key)
                    krs = jax.random.split(sub, nreplicas)
                else:
                    krs = jnp.zeros((nreplicas, 2), jnp.uint32)
                (pos, vel, box, v_eps, aux_p, aux_b, e_fast, ffrc, vir_f,
                 delta, drift) = pre_v(
                    st.pos, st.vel, st.forces, ffrc, vir, box, v_eps,
                    aux_p, aux_b,
                )
                if use_cell:
                    cl = update_all(pos, cl, box)
                    e_slow, sfrc, vir_s = slow_v(pos, box, cl)
                else:
                    e_slow, sfrc, vir_s = slow_v(pos, box)
                vir = vir_f + vir_s
                if cs is not None:
                    vir = vir + con_v(delta, drift, pos)
                vel, v_eps, aux_p, aux_b = post_v(
                    pos, vel, sfrc, vir, box, v_eps, aux_p, aux_b, krs
                )
                epot = e_fast + e_slow
                if use_cell:
                    out = (SimState(pos, vel, sfrc, key), box, v_eps,
                           aux_p, aux_b, vir, cl, ffrc)
                else:
                    out = (SimState(pos, vel, sfrc, key), box, v_eps,
                           aux_p, aux_b, vir, ffrc)
                return out, epot

            carry0 = ((state0, box0, v_eps0, aux_p0, aux_b0, vir0, cl0,
                       ffrc0) if use_cell else
                      (state0, box0, v_eps0, aux_p0, aux_b0, vir0, ffrc0))
            out, epots = jax.lax.scan(body, carry0, None, length=niter)
            if use_cell:
                st, box, v_eps, aux_p, aux_b, vir, cl, _ = out
                return (st, box, v_eps, aux_p, aux_b, vir, cl), epots[-1]
            st, box, v_eps, aux_p, aux_b, vir, _ = out
            return (st, box, v_eps, aux_p, aux_b, vir), epots[-1]

        return run

    def _build_scan_spatial_npt(self):
        """MTK NPT with ONE system's atom rows sharded over the mesh.

        Every rank advances an identical copy of the extended state
        (box, v_eps, particle + barostat chains): the barostat force
        needs only psum-reduced scalars -- the per-axis twice-kinetic
        energy and the virial -- so the extended dynamics stays
        replicated-deterministic across ranks (same flops, same order,
        bitwise-identical updates). Cost of the virial: one extra
        backward through the LOCAL row-block nonbonded energy wrt the
        per-axis scaling (psummed over the mesh, the 'one extra psum'
        of SURVEY §2.9's strong-scaling obligation) plus the replicated
        cheap-term (pos, s) value_and_grad that the dense NPT scan
        already does. v1 scope: row-block nonbonded path, no
        constraints/vsites (rejected at construction)."""
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        from functools import partial as _partial

        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.spatial import (
            pad_ffparams_rows,
            rowblock_energy_forces,
        )
        from .potentials import NONBONDED_TERMS, compute_potentials

        mesh, ax = self._spatial
        forces_obj = self.forces
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        natoms = int(ffp.charges.shape[0])
        sp = mesh.shape[ax]
        npad = -(-natoms // sp) * sp
        rows = npad // sp
        self._spatial_npad = npad

        has_nb = any(t in cfg.terms for t in NONBONDED_TERMS) and (
            ffp.nb_mask is not None
            or getattr(forces_obj, "_nb_mask_deferred", False)
        )
        if has_nb and ffp.nb_mask is None:
            # the row-block path consumes the dense mask: materialize the
            # large-N deferral (Forces.require_nb_mask)
            ffp = forces_obj.require_nb_mask()
        ffp_pad = pad_ffparams_rows(ffp, npad) if has_nb else ffp
        ewald = getattr(forces_obj, "_ewald", None)
        ext_energy = getattr(forces_obj.external, "energy_fn", None)

        dt = self.dt
        dt2 = 0.5 * dt
        masses = self.masses
        thermo = self._thermostat
        npt = self._npt
        W = npt["W"]
        ndof = npt["ndof"]
        Pext = npt["P"]
        chain_b = npt["chain_b"]
        mode = npt["mode"]
        gamma_st = npt["gamma_st"]
        axes_mask = jnp.asarray(npt["scale_axes"], self.dtype)

        def pad_rows_h(a, value=0.0):
            return jnp.pad(a, ((0, npad - a.shape[0]), (0, 0)),
                           constant_values=value)

        masses_pad = pad_rows_h(self.masses, 1.0)
        self._spatial_masses_pad = masses_pad
        self._spatial_sharding = NamedSharding(mesh, P(ax))

        def phi(x):
            x2 = x * x
            small = jnp.abs(x) < 1e-3
            safe = jnp.where(small, 1.0, x)
            return jnp.where(
                small, 1.0 + x2 / 6.0 + x2 * x2 / 120.0,
                jnp.sinh(safe) / safe,
            )

        def project(g):
            if mode == "iso":
                return jnp.full((3,), jnp.mean(g), g.dtype)
            if mode == "membrane":
                gxy = 0.5 * (g[0] + g[1])
                return jnp.stack([gxy, gxy, g[2]])
            return g * axes_mask

        def baro_half(v_eps, aux_b):
            vb = v_eps[None, :]
            mb = jnp.full((1, 1), W, v_eps.dtype)
            vb, xi, vxi = chain_b._chain_half(
                vb, aux_b["xi"], aux_b["vxi"], mb, 0.5 * dt
            )
            return vb[0], {"xi": xi, "vxi": vxi}

        @_partial(jax.jit, static_argnames=("niter",))
        def run(state: SimState, aux_p0, aux_b0, v_eps0, box0,
                niter: int):
            @_partial(
                shard_map, mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(), P(), P(), P(), P()),
                out_specs=(P(ax), P(ax), P(ax), P(), P(), P(), P(), P(),
                           P()),
                check_vma=False,
            )
            def inner(pos_l, vel_l, frc_l, key, a_p, a_b, v_eps, boxv):
                row0 = jax.lax.axis_index(ax) * rows
                m_l = jax.lax.dynamic_slice_in_dim(
                    masses_pad, row0, rows, 0
                )

                def eps_kick(v_eps_, vel_, vir_, box_):
                    # per-axis 2K over ALL atoms: psum of the local rows
                    K2ax = jax.lax.psum(
                        jnp.sum(m_l * vel_ * vel_, axis=0), ax
                    )
                    V = box_[0] * box_[1] * box_[2]
                    G = K2ax + jnp.sum(K2ax) / ndof + vir_ - V * Pext
                    if mode == "membrane" and gamma_st != 0.0:
                        A = box_[0] * box_[1]
                        G = G + gamma_st * A * jnp.asarray(
                            [1.0, 1.0, 0.0], v_eps_.dtype
                        )
                    return project(v_eps_ + dt2 * project(G) / W)

                def e_cheap_inner(p, s, box_):
                    pot = compute_potentials(ffp, p * s, box_ * s, cfg,
                                             nonbonded=False)
                    e = sum(jax.tree_util.tree_leaves(pot),
                            jnp.zeros((), p.dtype))
                    if ewald is not None:
                        e = e + ewald.energy(p * s, box_ * s)
                    if ext_energy is not None:
                        e = e + ext_energy(p * s, box_ * s)
                    return e

                def ef_vir_rows(p_l, box_):
                    p_f = jax.lax.all_gather(p_l, ax, axis=0, tiled=True)
                    e_loc = jnp.zeros((), p_l.dtype)
                    f_rows = jnp.zeros_like(p_l)
                    one = jnp.ones((3,), p_l.dtype)
                    if has_nb:
                        def e_nb_s(s):
                            pot_s, _ = rowblock_energy_forces(
                                ffp_pad, cfg, p_l * s, p_f * s,
                                box_ * s, row0,
                            )
                            return sum(
                                jax.tree_util.tree_leaves(pot_s),
                                jnp.zeros((), p_l.dtype),
                            )

                        pot_nb, f_nb = rowblock_energy_forces(
                            ffp_pad, cfg, p_l, p_f, box_, row0
                        )
                        e_loc = e_loc + sum(
                            jax.tree_util.tree_leaves(pot_nb)
                        )
                        f_rows = f_rows + f_nb
                        dUds_nb = jax.grad(e_nb_s)(one)
                    else:
                        dUds_nb = jnp.zeros((3,), p_l.dtype)
                    p_n = p_f[:natoms]
                    e_ch, (g_ch, dUds_ch) = jax.value_and_grad(
                        e_cheap_inner, argnums=(0, 1)
                    )(p_n, one, box_)
                    f_rows = f_rows + jax.lax.dynamic_slice_in_dim(
                        pad_rows_h(-g_ch), row0, rows, 0
                    )
                    e_tot = jax.lax.psum(e_loc, ax) + e_ch
                    vir = jax.lax.psum(-dUds_nb, ax) - dUds_ch
                    return e_tot, f_rows, vir

                # fresh virial at the chunk's entry state (identical to
                # the last eval of the previous chunk, so nothing stale
                # is carried across host boundaries)
                _, _, vir0 = ef_vir_rows(pos_l, boxv)

                def body(carry, _):
                    p_l, v_l, f_l, k, ap, ab, ve, vir, box_ = carry
                    ve, ab = baro_half(ve, ab)
                    v_l, ap = thermo.pre(v_l, ap, m_l, dt, axis_name=ax)
                    ve = eps_kick(ve, v_l, vir, box_)
                    x = (ve + jnp.sum(ve) / ndof) * dt2
                    v_l = (
                        v_l * jnp.exp(-x)
                        + dt2 * _safe_accel(f_l, m_l)
                        * jnp.exp(-0.5 * x) * phi(0.5 * x)
                    )
                    u = ve * dt
                    drift = dt * jnp.exp(0.5 * u) * phi(0.5 * u)
                    p_l = p_l * jnp.exp(u) + v_l * drift
                    box_ = box_ * jnp.exp(u)
                    e, f_l, vir = ef_vir_rows(p_l, box_)
                    v_l = (
                        v_l * jnp.exp(-x)
                        + dt2 * _safe_accel(f_l, m_l)
                        * jnp.exp(-0.5 * x) * phi(0.5 * x)
                    )
                    ve = eps_kick(ve, v_l, vir, box_)
                    if thermo.stochastic:
                        # UN-folded key: every rank must draw the same
                        # global rescale factor
                        k, sub = jax.random.split(k)
                        v_l, ap = thermo.post(v_l, ap, m_l, dt, key=sub,
                                              axis_name=ax)
                    else:
                        v_l, ap = thermo.post(v_l, ap, m_l, dt,
                                              axis_name=ax)
                    ve, ab = baro_half(ve, ab)
                    return (p_l, v_l, f_l, k, ap, ab, ve, vir, box_), e

                carry, epots = jax.lax.scan(
                    body,
                    (pos_l, vel_l, frc_l, key, a_p, a_b, v_eps, vir0,
                     boxv),
                    None, length=niter,
                )
                p_l, v_l, f_l, k, ap, ab, ve, vir, box_ = carry
                return p_l, v_l, f_l, k, ap, ab, ve, box_, epots[-1]

            pos, vel, frc, key, aux_p, aux_b, v_eps, box_out, epot = (
                inner(state.pos, state.vel, state.forces, state.key,
                      aux_p0, aux_b0, v_eps0,
                      jnp.reshape(box0, (-1,))[:3])
            )
            return (SimState(pos, vel, frc, key), aux_p, aux_b, v_eps,
                    box_out, epot)

        return run

    def _build_scan_spatial(self):
        """Scan variant for ONE large system sharded over a mesh axis.

        State rows (atoms) live split across chips; each inner step:
          first VV half-kick/drift on local rows
          -> all_gather positions over ICI
          -> row block of the pair matrix via the SAME unified block math
             as the dense path (parallel.spatial.rowblock_energy_forces:
             NBFIX/RFA/switching/Ewald real-space all supported)
          -> bonded + Ewald reciprocal + external evaluated replicated,
             local force rows sliced out
          -> per-rank thermostat noise (key folded with the axis index)
          -> second VV half-kick.
        Energies are psum-reduced, so every rank returns the exact total.
        """
        from functools import partial as _partial

        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        from .parallel.spatial import (
            pad_ffparams_rows,
            rowblock_energy_forces,
        )
        from .potentials import NONBONDED_TERMS

        mesh, ax = self._spatial
        forces_obj = self.forces
        ffp = forces_obj.ffparams
        cfg = forces_obj.config
        natoms = int(ffp.charges.shape[0])
        sp = mesh.shape[ax]
        npad = -(-natoms // sp) * sp
        rows = npad // sp
        self._spatial_npad = npad

        has_nb = any(t in cfg.terms for t in NONBONDED_TERMS) and (
            ffp.nb_mask is not None
            or getattr(forces_obj, "_nb_mask_deferred", False)
        )
        if has_nb and ffp.nb_mask is None and not self._use_cell:
            # the dense row-block path consumes the (N,N) mask; the
            # slab-sharded cell branch below does not (exclusion pairs)
            ffp = forces_obj.require_nb_mask()
        ffp_pad = (pad_ffparams_rows(ffp, npad)
                   if has_nb and ffp.nb_mask is not None else ffp)
        ewald = getattr(forces_obj, "_ewald", None)
        ext_energy = getattr(forces_obj.external, "energy_fn", None)
        bonded_ef = forces_obj.bonded_ef_one

        # virtual sites: positions snap on the gathered full array (the
        # per-step all_gather already exists on this path), and site
        # forces spread to hosts via the vjp of the reconstruction over
        # ONE extra force all_gather — sites and hosts can land on
        # different ranks, so the spread needs the full force vector.
        vsg = self.vsites
        if vsg is not None:
            from .vsites import apply_vsites as _apply_vs
            from .vsites import spread_vsite_forces as _spread_vs

        # SHAKE/RATTLE/SETTLE on sharded rows: constraint clusters can
        # straddle rank boundaries, so the projection runs REPLICATED on
        # gathered full arrays (like the bonded terms on this path) and
        # the local rows are re-sliced. Costs extra all_gathers per step;
        # the halo path is the comm-scalable alternative.
        cs = self.constraints
        if cs is not None:
            from .constraints import (
                apply_position_constraints as _shake_full,
                apply_velocity_constraints as _rattle_full,
            )

        dt = self.dt
        gamma = self.gamma
        use_thermostat = self._use_langevin_T and self.gamma is not None
        use_pbc = bool(np.any(np.asarray(self.systems.box_diag) != 0))

        def pad_rows(a, value=0.0):
            return jnp.pad(a, ((0, npad - a.shape[0]), (0, 0)),
                           constant_values=value)

        # padded masses (1.0 on padding: harmless divisor, zero velocity);
        # padded noise coefficient 0.0 (padding rows stay frozen)
        masses_pad = pad_rows(self.masses, 1.0)
        vcoeff_pad = None
        if use_thermostat:
            vc = self.vcoeff
            if vc.ndim == 3:  # per-replica vector T; spatial has R == 1
                vc = vc[0]
            vcoeff_pad = pad_rows(vc, 0.0)
        self._spatial_masses_pad = masses_pad
        self._spatial_sharding = NamedSharding(mesh, P(ax))
        thermo = self._thermostat

        # slab-sharded cell path: rank r evaluates cell columns
        # [r*nloc, r*nloc + nloc) along x of the shared cell grid
        use_cell = bool(self._use_cell)
        kern = self._cell_kernel if use_cell else None
        if use_cell:
            from .neighbors import cell_nonbonded_energy_forces

            ncx = kern.clcfg.ncells[0]
            nloc = min(-(-ncx // sp), ncx)

        @_partial(jax.jit, static_argnames=("niter",))
        def run(state: SimState, thermo_aux, box, niter: int):
            @_partial(
                shard_map, mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(), P(), P()),
                out_specs=(P(ax), P(ax), P(ax), P(), P(), P(), P()),
                check_vma=False,
            )
            def inner(pos_l, vel_l, frc_l, key, aux, boxv):
                row0 = jax.lax.axis_index(ax) * rows
                m_l = jax.lax.dynamic_slice_in_dim(masses_pad, row0, rows, 0)
                vc_l = (
                    jax.lax.dynamic_slice_in_dim(vcoeff_pad, row0, rows, 0)
                    if use_thermostat else None
                )
                boxe = boxv if use_pbc else None

                def e_replicated(p):
                    er = jnp.zeros((), p.dtype)
                    if ewald is not None:
                        er = er + ewald.energy(p, boxv)
                    if ext_energy is not None:
                        er = er + ext_energy(p, boxv)
                    return er

                def bonded_part(pos_n):
                    """Replicated bonded (+Ewald recip/external) energy and
                    the local slice of its full-system forces."""
                    pot_b, f_b = bonded_ef(pos_n, boxe)
                    e = sum(jax.tree_util.tree_leaves(pot_b))
                    f_full = f_b
                    if ewald is not None or ext_energy is not None:
                        er, eg = jax.value_and_grad(e_replicated)(pos_n)
                        e = e + er
                        f_full = f_full - eg
                    return e, jax.lax.dynamic_slice_in_dim(
                        pad_rows(f_full), row0, rows, 0
                    )

                def snap_full(pos_full, boxv_):
                    """Snapped full positions (padded) at gathered geometry."""
                    pos_n = _apply_vs(vsg, pos_full[:natoms], boxv_)
                    return pad_rows(pos_n)

                def spread_rows(pos_full, f_rows):
                    """Site forces -> hosts: gather the distributed rows,
                    vjp-spread on the replicated array, re-slice."""
                    f_full = jax.lax.all_gather(f_rows, ax, axis=0,
                                                tiled=True)
                    f_spread = _spread_vs(
                        vsg, pos_full[:natoms], f_full[:natoms], boxe
                    )
                    return jax.lax.dynamic_slice_in_dim(
                        pad_rows(f_spread), row0, rows, 0
                    )

                def ef_rows(pos_loc):
                    pos_full = jax.lax.all_gather(pos_loc, ax, axis=0,
                                                  tiled=True)
                    if vsg is not None:
                        pos_full = snap_full(pos_full, boxe)
                        pos_loc = jax.lax.dynamic_slice_in_dim(
                            pos_full, row0, rows, 0
                        )
                    e = jnp.zeros((), pos_loc.dtype)
                    f_rows = jnp.zeros_like(pos_loc)
                    if has_nb:
                        pot_nb, f_nb = rowblock_energy_forces(
                            ffp_pad, cfg, pos_loc, pos_full, boxe, row0
                        )
                        e = e + jax.lax.psum(
                            sum(jax.tree_util.tree_leaves(pot_nb)), ax
                        )
                        f_rows = f_rows + f_nb
                    eb, fb_rows = bonded_part(pos_full[:natoms])
                    f_rows = f_rows + fb_rows
                    if vsg is not None:
                        f_rows = spread_rows(pos_full, f_rows)
                    return e + eb, f_rows, pos_loc

                def ef_rows_cell(pos_loc, cl):
                    """Slab-sharded cell evaluation: this rank's cell
                    columns only; psum combines slab forces/energies."""
                    pos_full = jax.lax.all_gather(pos_loc, ax, axis=0,
                                                  tiled=True)
                    if vsg is not None:
                        pos_full = snap_full(pos_full, boxv)
                        pos_loc = jax.lax.dynamic_slice_in_dim(
                            pos_full, row0, rows, 0
                        )
                    pos_n = pos_full[:natoms]
                    cl_n = kern.update(pos_n, cl, boxv)
                    cl = cl_n._replace(overflow=cl_n.overflow | cl.overflow)
                    cx0 = jax.lax.axis_index(ax).astype(jnp.int32) * nloc
                    pot_nb, f_nb = cell_nonbonded_energy_forces(
                        ffp, cfg, kern.clcfg, cl, kern.excl_table,
                        pos_n, boxv, slab=(cx0, nloc),
                    )
                    e = jax.lax.psum(
                        sum(jax.tree_util.tree_leaves(pot_nb)), ax
                    )
                    # reduce-scatter instead of all-reduce + slice: each
                    # rank only needs ITS row block of the slab forces,
                    # so psum_scatter moves half the bytes over the ring
                    f_rows = jax.lax.psum_scatter(
                        pad_rows(f_nb), ax, scatter_dimension=0, tiled=True
                    )
                    eb, fb_rows = bonded_part(pos_n)
                    f_rows = f_rows + fb_rows
                    if vsg is not None:
                        f_rows = spread_rows(pos_full, f_rows)
                    return e + eb, f_rows, pos_loc, cl

                def thermo_and_kicks(p_l, v_l, f_l, k, a, e_f):
                    """Shared VV/thermostat sequence around a force eval.
                    e_f returns (e, forces, possibly-snapped positions,
                    extra) — with virtual sites the local position rows
                    come back snapped onto the reconstructed geometry."""
                    if thermo is not None:
                        # psum-reduced KE; identical chain on every rank
                        v_l, a = thermo.pre(v_l, a, m_l, dt, axis_name=ax)
                    p_ref = p_l
                    p_l, v_l = _first_vv(p_l, v_l, f_l, m_l, dt)
                    if cs is not None:
                        p_new_f = jax.lax.all_gather(p_l, ax, axis=0,
                                                     tiled=True)
                        p_ref_f = jax.lax.all_gather(p_ref, ax, axis=0,
                                                     tiled=True)
                        p_c = _shake_full(cs, p_new_f[:natoms],
                                          p_ref_f[:natoms])
                        p_c_l = jax.lax.dynamic_slice_in_dim(
                            pad_rows(p_c), row0, rows, 0
                        )
                        v_l = v_l + (p_c_l - p_l) / dt
                        p_l = p_c_l
                    e, f_l, p_l, extra = e_f(p_l)
                    if use_thermostat:
                        k, sub = jax.random.split(k)
                        sub = jax.random.fold_in(sub, jax.lax.axis_index(ax))
                        noise = jax.random.normal(sub, v_l.shape,
                                                  dtype=v_l.dtype)
                        v_l = v_l - gamma * v_l * dt + noise * vc_l
                    v_l = _second_vv(v_l, f_l, m_l, dt)
                    if cs is not None:
                        p_f = jax.lax.all_gather(p_l, ax, axis=0,
                                                 tiled=True)
                        v_f = jax.lax.all_gather(v_l, ax, axis=0,
                                                 tiled=True)
                        v_c = _rattle_full(cs, p_f[:natoms], v_f[:natoms])
                        v_l = jax.lax.dynamic_slice_in_dim(
                            pad_rows(v_c), row0, rows, 0
                        )
                    if thermo is not None:
                        if thermo.stochastic:
                            # UN-folded key: the same global rescale factor
                            # must be drawn on every rank
                            k, sub = jax.random.split(k)
                            v_l, a = thermo.post(v_l, a, m_l, dt, key=sub,
                                                 axis_name=ax)
                        else:
                            v_l, a = thermo.post(v_l, a, m_l, dt,
                                                 axis_name=ax)
                    return p_l, v_l, f_l, k, a, e, extra

                if use_cell:
                    def body(carry, _):
                        p_l, v_l, f_l, k, a, cl = carry

                        def e_f(p):
                            return ef_rows_cell(p, cl)

                        p_l, v_l, f_l, k, a, e, cl = thermo_and_kicks(
                            p_l, v_l, f_l, k, a, e_f
                        )
                        return (p_l, v_l, f_l, k, a, cl), e

                    pos_full0 = jax.lax.all_gather(pos_l, ax, axis=0,
                                                   tiled=True)
                    if vsg is not None:
                        pos_full0 = snap_full(pos_full0, boxv)
                    cl0 = kern.build(pos_full0[:natoms], boxv)
                    carry, epots = jax.lax.scan(
                        body, (pos_l, vel_l, frc_l, key, aux, cl0),
                        None, length=niter,
                    )
                    p_l, v_l, f_l, k, a, cl = carry
                    overflow = cl.overflow | cl0.overflow
                else:
                    def body(carry, _):
                        p_l, v_l, f_l, k, a = carry

                        def e_f(p):
                            e, f_r, p_s = ef_rows(p)
                            return e, f_r, p_s, None

                        p_l, v_l, f_l, k, a, e, _unused = thermo_and_kicks(
                            p_l, v_l, f_l, k, a, e_f
                        )
                        return (p_l, v_l, f_l, k, a), e

                    carry, epots = jax.lax.scan(
                        body, (pos_l, vel_l, frc_l, key, aux),
                        None, length=niter,
                    )
                    p_l, v_l, f_l, k, a = carry
                    overflow = jnp.zeros((), jnp.bool_)
                return p_l, v_l, f_l, k, a, epots[-1], overflow

            pos, vel, frc, key, aux_out, epot, overflow = inner(
                state.pos, state.vel, state.forces, state.key, thermo_aux,
                jnp.reshape(box, (-1,))[:3],
            )
            return SimState(pos, vel, frc, key), aux_out, epot, overflow

        return run

    def _spatial_state_from_system(self) -> SimState:
        s = self.systems
        snap = (s.pos, s.vel, s.forces)
        if (
            self._dev_state is not None
            and self._host_snap is not None
            and all(np.array_equal(a, b)
                    for a, b in zip(self._host_snap, snap))
        ):
            return self._dev_state._replace(key=self.key)
        npad = self._spatial_npad

        def put(x):
            x = np.asarray(x)[0]  # (natoms, 3)
            x = np.pad(x, ((0, npad - x.shape[0]), (0, 0)))
            return jax.device_put(
                jnp.asarray(x, self.dtype), self._spatial_sharding
            )

        state = SimState(pos=put(s.pos), vel=put(s.vel),
                         forces=put(s.forces), key=self.key)
        self._dev_state = state
        self._host_snap = tuple(a.copy() for a in snap)
        return state

    def _spatial_sync_to_host(self, state: SimState, epot):
        s = self.systems
        self.key = state.key
        self._dev_state = state
        if self._packer is None:
            masses_pad = self._spatial_masses_pad

            @jax.jit
            def pack(st: SimState, e):
                ke = 0.5 * jnp.sum(masses_pad * st.vel * st.vel)
                aux = jnp.zeros_like(st.pos)
                aux = aux.at[0, 0].set(ke).at[0, 1].set(
                    jnp.asarray(e, st.pos.dtype)
                )
                return jnp.stack([st.pos, st.vel, st.forces, aux])

            self._packer = pack
        packed = np.asarray(self._packer(state, epot))
        n = s.pos.shape[1]
        s.pos[0] = packed[0, :n].astype(s.pos.dtype)
        s.vel[0] = packed[1, :n].astype(s.vel.dtype)
        s.forces[0] = packed[2, :n].astype(s.forces.dtype)
        self._host_snap = (s.pos.copy(), s.vel.copy(), s.forces.copy())
        return (
            np.asarray([packed[3, 0, 0]]),
            np.asarray([packed[3, 0, 1]]),
        )

    def _chunk_build(self, pos_b, box_b):
        """Jitted per-chunk neighbor-structure rebuild (cached across
        chunks, invalidated when grow() swaps the kernel). Eagerly
        vmapping build here would dispatch each of its ~30 ops as a
        separate tunnel round trip (~0.6 s/chunk measured at 24k)."""
        if (self._build_jit is None
                or self._build_jit_kern is not self._cell_kernel):
            self._build_jit = jax.jit(jax.vmap(self._cell_kernel.build))
            self._build_jit_kern = self._cell_kernel
        return self._build_jit(pos_b, box_b)

    # ------------------------------------------------------------------
    # Host<->device state movement. The TPU may sit behind a network
    # tunnel where every transfer costs a full round trip (~20 ms
    # measured), so step() (a) reuses the cached device state when the
    # numpy System buffers are unchanged since our last sync, and (b)
    # pulls pos/vel/forces/KE/Epot back in ONE packed transfer.
    def _state_from_system(self) -> SimState:
        s = self.systems
        dtype = self.dtype
        snap = (s.pos, s.vel, s.forces)
        if (
            self._dev_state is not None
            and self._host_snap is not None
            and all(np.array_equal(a, b)
                    for a, b in zip(self._host_snap, snap))
        ):
            self._state_was_cached = True
            return self._dev_state._replace(key=self.key)
        self._state_was_cached = False

        if self._sharding is not None:
            def put(x):
                return jax.device_put(jnp.asarray(x, dtype=dtype),
                                      self._sharding)

            state = SimState(pos=put(s.pos), vel=put(s.vel),
                             forces=put(s.forces), key=self.key)
        else:
            packed = jnp.asarray(
                np.stack([s.pos, s.vel, s.forces]), dtype=dtype
            )  # one host->device transfer
            state = SimState(pos=packed[0], vel=packed[1],
                             forces=packed[2], key=self.key)
        self._dev_state = state
        self._host_snap = tuple(a.copy() for a in snap)
        return state

    def _make_packer(self):
        masses = self.masses
        batch = None if self.batch is None else jnp.asarray(self.batch)

        @jax.jit
        def pack(state: SimState, epot, overflow):
            ke = kinetic_energy(masses, state.vel, batch)  # (R, nb)
            epot = jnp.reshape(jnp.asarray(epot, state.pos.dtype), (-1, 1))
            ov = jnp.full_like(epot, overflow.astype(state.pos.dtype))
            aux = jnp.concatenate([ke.astype(state.pos.dtype), epot, ov], 1)
            r, n = state.pos.shape[0], state.pos.shape[1]
            aux = jnp.pad(aux, ((0, 0), (0, 3 * n - aux.shape[1])))
            return jnp.stack(
                [state.pos, state.vel, state.forces, aux.reshape(r, n, 3)]
            )

        return pack

    def _sync_to_host(self, state: SimState, epot, overflow=None):
        """One packed device->host pull; returns (Ekin, epot, overflow)."""
        s = self.systems
        self.key = state.key
        self._dev_state = state
        if overflow is None:
            overflow = jnp.zeros((), jnp.bool_)
        if self._packer is None:
            self._packer = self._make_packer()
        packed = np.asarray(self._packer(state, epot, overflow))
        s.pos[:] = packed[0].astype(s.pos.dtype)
        s.vel[:] = packed[1].astype(s.vel.dtype)
        s.forces[:] = packed[2].astype(s.forces.dtype)
        self._host_snap = (s.pos.copy(), s.vel.copy(), s.forces.copy())
        r = packed.shape[1]
        aux = packed[3].reshape(r, -1)
        nb = 1 if self.batch is None else int(np.max(self.batch)) + 1
        ekin = aux[:, :nb]
        return ekin, aux[:, nb], bool(aux[0, nb + 1] != 0)

    def thermostat_energy(self):
        """Thermostat contribution to the conserved (extended) energy per
        replica -- add to Ekin + Epot to monitor NHC drift (zero for
        Langevin/CSVR/no thermostat)."""
        nrep = self.systems.nreplicas
        if self._thermostat is None:
            return np.zeros(nrep)
        e = np.asarray(
            jnp.atleast_1d(self._thermostat.conserved(self._thermo_aux))
        ).reshape(-1)
        return np.broadcast_to(e, (nrep,)).copy() if e.size == 1 else e

    def npt_energy(self):
        """Barostat contribution to the NPT conserved quantity per replica:
        P_ext*V + sum_k W v_eps_k^2/2 [- gamma*A for membranes] +
        barostat-chain terms. Add to Ekin + Epot + thermostat_energy() to
        monitor MTK drift (zero without MTK)."""
        nrep = self.systems.nreplicas
        if self._npt is None:
            return np.zeros(nrep)
        v_eps, aux_b, _ = self._npt_extra
        boxd = np.asarray(self.systems.box_diag)
        V = np.prod(boxd, axis=1)
        e = (
            self._npt["P"] * V
            + 0.5 * self._npt["W"]
            * np.sum(np.asarray(v_eps, np.float64) ** 2, axis=-1)
            + np.asarray(
                jnp.atleast_1d(self._npt["chain_b"].conserved(aux_b)),
                np.float64,
            ).reshape(-1)
        )
        if self._npt["mode"] == "membrane":
            e = e - self._npt["gamma_st"] * boxd[:, 0] * boxd[:, 1]
        return e

    def compiled_collective_counts(self, niter=1):
        """Cross-device collective ops in the COMPILED step, by op kind
        (lowered without executing). The DCN-safety property SURVEY §2.9
        demands: replica (dp) sharding must show ZERO per-step
        collectives -- ensemble members never talk during MD stepping,
        so the dp axis can ride a slow DCN link; spatial (sp) sharding
        shows the all-gather/psum pattern and must stay on ICI.
        dryrun_multichip prints and asserts these counts."""
        import re

        box = jnp.asarray(np.asarray(self.systems.box_diag), self.dtype)
        if self._sharding is not None:
            box = jax.device_put(box, self._sharding)
        if self._spatial is not None:
            state0 = self._spatial_state_from_system()
            if self._npt is not None:
                v_eps0, aux_b0, _ = self._npt_extra
                box_d = jnp.asarray(
                    np.asarray(self.systems.box_diag), self.dtype
                )[0]
                lowered = self._scan_fn.lower(
                    state0, self._thermo_aux, aux_b0, v_eps0, box_d,
                    int(niter)
                )
            else:
                lowered = self._scan_fn.lower(
                    state0, self._thermo_aux, box, int(niter)
                )
        elif self._npt is not None:
            state0 = self._state_from_system()
            box_d = jnp.asarray(np.asarray(self.systems.box_diag),
                                self.dtype)
            v_eps, aux_b, vir = self._npt_extra
            if self._use_cell:
                cl = self._chunk_build(state0.pos, box_d)
                if vir is None:
                    _, _, vir = self._npt_ef_vir_cell(
                        state0.pos, box_d, cl
                    )
                lowered = self._scan_fn.lower(
                    (state0, box_d, v_eps, self._thermo_aux, aux_b, vir,
                     cl),
                    int(niter),
                )
            else:
                if vir is None:
                    _, _, vir = self._npt_ef_vir(state0.pos, box_d)
                lowered = self._scan_fn.lower(
                    (state0, box_d, v_eps, self._thermo_aux, aux_b, vir),
                    int(niter),
                )
        elif self._use_cell or self._use_verlet:
            state0 = self._state_from_system()
            cl = self._chunk_build(state0.pos, box)
            lowered = self._scan_fn.lower(
                (state0, cl, self._thermo_aux), box, int(niter)
            )
        else:
            state0 = self._state_from_system()
            lowered = self._scan_fn.lower(
                (state0, self._thermo_aux), box, int(niter)
            )
        txt = lowered.compile().as_text()
        counts = {}
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            n = len(re.findall(rf"{op}(?:-start)?\(", txt))
            if n:
                counts[op] = n
        return counts

    # kept for checkpoint/compat callers
    def _state_to_system(self, state: SimState):
        s = self.systems
        s.pos[:] = np.asarray(state.pos, dtype=s.pos.dtype)
        s.vel[:] = np.asarray(state.vel, dtype=s.vel.dtype)
        s.forces[:] = np.asarray(state.forces, dtype=s.forces.dtype)
        self._host_snap = (s.pos.copy(), s.vel.copy(), s.forces.copy())
        self._dev_state = state
        self.key = state.key

    def step(self, niter=1):
        systems = self.systems
        box_np = np.asarray(systems.box_diag)
        if self._box_snap is None or not np.array_equal(self._box_snap, box_np):
            box = jnp.asarray(box_np, dtype=self.dtype)
            if self._sharding is not None:
                box = jax.device_put(box, self._sharding)
            self._dev_box = box
            self._box_snap = box_np.copy()
            # barostat box changes: the cell grid bins by the traced box,
            # so only a box that no longer hosts rc-wide cells forces a
            # kernel rebuild (rare -- large cumulative volume drift)
            if (
                self._use_cell
                and self._cell_kernel is not None
                and not self._cell_kernel.covers(box_np)
            ):
                self._cell_kernel = self._cell_kernel.with_box(
                    box_np.min(axis=0), pos0=np.asarray(systems.pos)[0]
                )
                self.forces._cell_kernel = self._cell_kernel
                self.forces._build_evaluators()
                # rebuild the scan matching this integrator's dispatch
                # (the spatial scan also re-derives its slab split from
                # the new grid)
                if self._spatial is not None:
                    self._scan_fn = self._build_scan_spatial()
                elif self._npt is not None:
                    self._scan_fn = self._build_scan_npt_dispatch(cell=True)
                else:
                    self._scan_fn = self._build_scan_cell_dispatch()
        box = self._dev_box

        if self._host_path:
            # Host-coupled external potential (e.g. a torch NNP): step with
            # per-iteration compute() calls, like the reference loop.
            pot = None
            for _ in range(niter):
                accel = systems.forces / self._masses_np
                systems.pos[:] += systems.vel * self.dt + 0.5 * accel * self.dt**2
                systems.vel[:] += 0.5 * self.dt * accel
                pot = self.forces.compute(systems.pos, systems.box, systems.forces)
                if self._use_langevin_T and self.gamma is not None:
                    self.key, sub = jax.random.split(self.key)
                    noise = np.asarray(
                        jax.random.normal(sub, systems.vel.shape)
                    ).astype(systems.vel.dtype)
                    systems.vel[:] += (
                        -self.gamma * systems.vel * self.dt
                        + noise * np.asarray(self.vcoeff)
                    )
                systems.vel[:] += 0.5 * self.dt * systems.forces / self._masses_np
            epot = np.asarray(pot) if pot is not None else np.zeros(systems.nreplicas)
            ke = kinetic_energy(self.masses, systems.vel, self.batch)
            Ekin = np.asarray(ke).flatten()
            T = kinetic_to_temp(Ekin, self.natoms) * self._dof_scale
            return Ekin, epot, T

        if self._npt is not None and self._spatial is not None:
            state0 = self._spatial_state_from_system()
            v_eps0, aux_b0, _ = self._npt_extra
            box_d = jnp.asarray(
                np.asarray(systems.box_diag), self.dtype
            )[0]
            state, aux_p, aux_b, v_eps, box_out, epot_dev = self._scan_fn(
                state0, self._thermo_aux, aux_b0, v_eps0, box_d,
                int(niter)
            )
            self._thermo_aux = aux_p
            self._npt_extra = (v_eps, aux_b, None)
            ekin, epot = self._spatial_sync_to_host(state, epot_dev)
            box_h = np.asarray(box_out, dtype=np.float64).reshape(-1)[:3]
            for r in range(systems.nreplicas):
                np.fill_diagonal(systems.box[r], box_h)
            self._box_snap = None  # box evolved on device
            Ekin = np.asarray(ekin, dtype=np.float64).flatten()
            T = kinetic_to_temp(Ekin, self.natoms) * self._dof_scale
            return Ekin, np.asarray(epot, dtype=np.float64), T

        if self._npt is not None:
            state0 = self._state_from_system()
            box_d = jnp.asarray(np.asarray(systems.box_diag), self.dtype)
            v_eps0, aux_b0, vir0 = self._npt_extra
            if self._sharding is not None:
                # replica-sharded NPT: every extended-state leaf has a
                # leading replica axis; place them like the SimState so
                # GSPMD keeps the scan ensemble-parallel
                box_d, v_eps0, aux_b0, vir0, self._thermo_aux = (
                    jax.device_put(
                        (box_d, v_eps0, aux_b0, vir0, self._thermo_aux),
                        self._sharding,
                    )
                )
            if self._use_cell:
                # cell/column-kernel NPT: the neighbor structure rides in
                # the scan carry; capacity overflow redoes the chunk with
                # a grown kernel (box drift raises local density)
                for _attempt in range(4):
                    cl = self._chunk_build(state0.pos, box_d)
                    vir = vir0
                    if vir is None or not self._state_was_cached:
                        _, _, vir = self._npt_ef_vir_cell(
                            state0.pos, box_d, cl
                        )
                    carry = (state0, box_d, v_eps0, self._thermo_aux,
                             aux_b0, vir, cl)
                    (state, box_out, v_eps, aux_p, aux_b, vir, cl), \
                        epot_dev = self._scan_fn(carry, int(niter))
                    ekin, epot, overflowed = self._sync_to_host(
                        state, epot_dev, jnp.any(cl.overflow)
                    )
                    if not overflowed:
                        self._thermo_aux = aux_p
                        break
                    self._cell_kernel = self._cell_kernel.grow()
                    self.forces._cell_kernel = self._cell_kernel
                    self.forces._build_evaluators()
                    self._scan_fn = self._build_scan_npt_dispatch(cell=True)
                else:
                    raise RuntimeError(
                        "cell list capacity kept overflowing"
                    )
                box_d = box_out
            else:
                vir = vir0
                if vir is None or not self._state_was_cached:
                    # (re)compute the scaling virial at the entry state:
                    # first chunk, resume, or host-side position edits
                    # between chunks (the carried virial would be stale)
                    _, _, vir = self._npt_ef_vir(state0.pos, box_d)
                carry = (state0, box_d, v_eps0, self._thermo_aux, aux_b0,
                         vir)
                (state, box_d, v_eps, aux_p, aux_b, vir), epot_dev = (
                    self._scan_fn(carry, int(niter))
                )
                self._thermo_aux = aux_p
                ekin, epot, _ = self._sync_to_host(state, epot_dev)
            self._npt_extra = (v_eps, aux_b, vir)
            box_h = np.asarray(box_d, dtype=np.float64)
            for r in range(systems.nreplicas):
                np.fill_diagonal(systems.box[r], box_h[r])
            self._box_snap = None  # box evolved on device
            Ekin = np.asarray(ekin, dtype=np.float64).flatten()
            T = kinetic_to_temp(Ekin, self.natoms) * self._dof_scale
            return Ekin, np.asarray(epot, dtype=np.float64), T

        if self._spatial is not None:
            state0 = self._spatial_state_from_system()
            for _attempt in range(4):
                state, aux, epot_dev, overflow = self._scan_fn(
                    state0, self._thermo_aux, box, int(niter)
                )
                if not bool(np.asarray(overflow)):
                    self._thermo_aux = aux
                    break
                # a cell overflowed on the sharded cell path: grow + retry
                self._cell_kernel = self._cell_kernel.grow()
                self.forces._cell_kernel = self._cell_kernel
                self.forces._build_evaluators()
                self._scan_fn = self._build_scan_spatial()
            else:
                raise RuntimeError("cell list capacity kept overflowing")
            ekin, epot = self._spatial_sync_to_host(state, epot_dev)
            Ekin = np.asarray(ekin, dtype=np.float64).flatten()
            T = kinetic_to_temp(Ekin, self.natoms) * self._dof_scale
            return Ekin, np.asarray(epot, dtype=np.float64), T

        if self._use_cell or self._use_verlet:
            state0 = self._state_from_system()
            for _attempt in range(4):
                cl = self._chunk_build(state0.pos, box)
                (state, cl, aux), epot_dev = self._scan_fn(
                    (state0, cl, self._thermo_aux), box, int(niter)
                )
                ekin, epot, overflowed = self._sync_to_host(
                    state, epot_dev, jnp.any(cl.overflow)
                )
                if not overflowed:
                    self._thermo_aux = aux
                    break
                # capacity overflowed: grow the kernel and redo this chunk
                self._cell_kernel = self._cell_kernel.grow()
                if self._use_cell:
                    self.forces._cell_kernel = self._cell_kernel
                else:
                    self.forces._verlet_kernel = self._cell_kernel
                # rebuild the Forces closures too, or compute()/ef_one keep
                # referencing the old smaller-capacity kernel
                self.forces._build_evaluators()
                self._scan_fn = self._build_scan_cell_dispatch()
            else:
                raise RuntimeError("neighbor kernel capacity kept overflowing")
        else:
            state0 = self._state_from_system()
            (state, self._thermo_aux), epot_dev = self._scan_fn(
                (state0, self._thermo_aux), box, int(niter)
            )
            ekin, epot, _ = self._sync_to_host(state, epot_dev)

        Ekin = np.asarray(ekin, dtype=np.float64).flatten()
        T = kinetic_to_temp(Ekin, self.natoms) * self._dof_scale
        return Ekin, np.asarray(epot, dtype=np.float64), T

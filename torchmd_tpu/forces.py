"""User-facing force/energy evaluator.

`Forces` mirrors the reference class surface (torchmd/forces.py:7-346) --
same constructor arguments, same `compute(pos, box, forces, returnDetails,
explicit_forces, toNumpy, calculateForces)` signature and return shapes --
but is a thin object shell over the pure-functional JAX core in
`torchmd_tpu.potentials`:

  - the whole per-replica evaluation is one jitted vmap (no Python loop
    over replicas, cf. forces.py:116),
  - forces always come from -grad(E) (the reference's autograd path,
    forces.py:328-336); there is no separate analytic branch to keep in
    sync, and cutoffs work under vmap because shapes are static,
  - `explicit_forces` is accepted for API parity and ignored.

External potentials (NNPs) plug in as any object with
`calculate(pos, box) -> (energy[nreplicas], forces[nreplicas, natoms, 3])`
(reference protocol, forces.py:321-326). If the external object exposes
`energy_fn(pos, box) -> energy` as a JAX-traceable function it is folded
into the jitted evaluation instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import (
    BONDED_TERMS,
    NONBONDED_TERMS,
    TERMS,
    ForceTermConfig,
    compute_potentials,
    make_ffparams,
)
from .systems import resolve_precision


def _box_to_diag(box, nreplicas, dtype):
    """Accept (R,3,3), (R,3), (3,3), (3,) or None -> (R,3) diagonal."""
    if box is None:
        return jnp.zeros((nreplicas, 3), dtype=dtype)
    box = jnp.asarray(box, dtype=dtype)
    if box.ndim == 3:
        return jnp.diagonal(box, axis1=1, axis2=2)
    if box.ndim == 2 and box.shape == (3, 3):
        return jnp.tile(jnp.diag(box)[None], (nreplicas, 1))
    if box.ndim == 2:
        return box
    return jnp.tile(box[None], (nreplicas, 1))


class Forces:
    bonded = list(BONDED_TERMS)
    nonbonded = list(NONBONDED_TERMS)
    terms = list(TERMS)

    def __init__(
        self,
        parameters,
        terms=None,
        external=None,
        cutoff=None,
        rfa=False,
        solventDielectric=78.5,
        switch_dist=None,
        exclusions=("bonds", "angles", "1-4"),
        precision=None,
        kernel="auto",
        nbfix=False,
        elec="auto",
    ):
        self.par = parameters
        if terms is None:
            raise RuntimeError(
                'Set force terms or leave empty brackets [].\nAvailable options: '
                '"bonds", "angles", "dihedrals", "impropers", "1-4", '
                '"electrostatics", "lj", "repulsion", "repulsioncg".'
            )
        self.energies = [t.lower() for t in terms]
        for t in self.energies:
            if t not in TERMS:
                raise ValueError(f"Force term {t} is not implemented.")
        if "1-4" in self.energies and "dihedrals" not in self.energies:
            raise RuntimeError(
                "You cannot enable 1-4 interactions without enabling dihedrals"
            )

        self.natoms = len(parameters.masses)
        self.external = external
        self.cutoff = cutoff
        self.rfa = rfa
        self.solventDielectric = solventDielectric
        self.switch_dist = switch_dist
        self.exclusions = exclusions

        dtype = resolve_precision(
            precision if precision is not None else getattr(parameters, "precision", None)
        )
        self.dtype = jnp.float64 if dtype == np.float64 else jnp.float32

        def _amber(tbl):
            return bool(tbl is not None and len(tbl["params"]) and
                        np.all(np.asarray(tbl["params"])[:, 2] > 0))

        self.config = ForceTermConfig(
            terms=tuple(self.energies),
            cutoff=None if cutoff is None else float(cutoff),
            rfa=bool(rfa),
            solvent_dielectric=float(solventDielectric),
            switch_dist=None if switch_dist is None else float(switch_dist),
            dihedrals_amber=_amber(parameters.dihedral_params),
            impropers_amber=_amber(parameters.improper_params),
        )
        # Large-N systems headed for a neighbor-kernel path never consult
        # the dense (natoms, natoms) exclusion mask (3.9 GB at 62.5k,
        # 65 GB at 256k): defer it. Any path that genuinely needs it
        # (dense/Pallas fallback when no cell grid is feasible, Verlet
        # lists, spatial row blocks, alchemy) materializes on demand via
        # require_nb_mask().
        import os as _os_m

        _nb_terms = any(t in self.energies for t in NONBONDED_TERMS)
        self._nb_mask_deferred = bool(
            _nb_terms
            and (
                kernel == "cell"
                or (kernel == "auto" and self.natoms >= int(
                    _os_m.environ.get("TMD_AUTO_CELL_N", "12000")))
            )
        )
        self.ffparams = make_ffparams(
            parameters, exclusions, dtype=self.dtype, nbfix=nbfix,
            dense_mask=not self._nb_mask_deferred,
        )

        # Full Ewald electrostatics (new capability: the reference is
        # RFA-only for periodic systems). The reciprocal-space kernel needs
        # a concrete box, so it is built lazily like the cell list.
        # 'ewald' auto-upgrades to PME (B-spline mesh + FFT) above
        # TMD_PME_N atoms; 'pme' forces the mesh method.
        if elec not in ("auto", "ewald", "pme"):
            raise ValueError(f"Unknown elec mode: {elec}")
        self.elec_mode = elec
        self.ewald_requested = elec in ("ewald", "pme")
        self._ewald = None
        if self.ewald_requested and cutoff is None:
            raise ValueError(f"elec='{elec}' requires a cutoff")

        self.kernel = kernel
        self._build_evaluators()

    def _build_evaluators(self):
        """(Re)build the fused/jitted evaluation functions from the current
        static config (called at construction and after ensure_ewald)."""
        parameters = self.par
        external = self.external
        # Kernel selection for the fused energy+forces hot path: the Pallas
        # TPU kernel handles the dense nonbonded block when running f32 on
        # TPU; everything else uses the fused jnp path.
        from .ops import (
            pallas_available,
            pallas_supported_terms,
            prepare_nb_data,
            pallas_nonbonded_energy_forces,
        )
        has_nb = (
            any(t in self.energies for t in NONBONDED_TERMS)
            and (self.ffparams.nb_mask is not None
                 or getattr(self, "_nb_mask_deferred", False))
        )
        # Cell-list path: requested explicitly, or selected automatically
        # for large periodic systems (the dense O(N^2) path stops being
        # viable around ~10k atoms). The kernel is built lazily once a
        # concrete box is known (Integrator init or first compute).
        import os as _os_sel

        self.cell_requested = (
            getattr(self, "cell_requested", False)
            or (self.kernel == "cell" and has_nb)
        )
        self.cell_auto_size = (
            self.kernel == "auto"
            and has_nb
            and self.natoms >= int(_os_sel.environ.get("TMD_AUTO_CELL_N",
                                                       "12000"))
        )
        # the size trigger is provisional: resolve_kernel_for_box drops it
        # (re-enabling the dense Pallas kernel) once a concrete box shows
        # no cell grid is feasible (open boundaries / tiny box). A mask
        # edited by alchemy is authoritative: the cell path (which never
        # consults nb_mask) stays off for good.
        self.cell_auto = (
            self.cell_auto_size
            and not getattr(self, "_cell_infeasible", False)
            and not getattr(self, "_nb_mask_authoritative", False)
        )
        self.cell_skin = getattr(self, "cell_skin", 2.0)
        self._cell_kernel = getattr(self, "_cell_kernel", None)
        # Verlet (padded neighbor-list) path: explicit kernel="verlet", or
        # automatic for mid-size cutoff systems where the dense O(N^2)
        # kernel wastes pair work but the box is too small (or absent) for
        # a cell grid. See neighbors.VerletKernel.
        self.verlet_requested = (
            getattr(self, "verlet_requested", False)
            or (self.kernel == "verlet" and has_nb)
        )
        # NOTE: intentionally independent of cell_auto -- wants_verlet()
        # defers to wants_cell(box) at selection time, so the cell grid
        # wins when it is actually feasible and the verlet path catches
        # large-N systems the grid cannot cover (no/too-small box).
        self.verlet_auto = (
            self.kernel == "auto"
            and has_nb
            and self.cutoff is not None
            and self.natoms >= int(_os_sel.environ.get("TMD_AUTO_VERLET_N",
                                                       "100000"))
        )
        self._verlet_kernel = getattr(self, "_verlet_kernel", None)
        kernel = self.kernel
        self.use_pallas = (
            kernel in ("auto", "pallas")
            and has_nb
            and not self.cell_auto        # large-N auto -> cell path; the
            and not self.cell_requested   # dense O(N^2) mask wouldn't fit
            and not self.verlet_auto
            and not self.verlet_requested
            and pallas_available()
            and self.dtype == jnp.float32
            and pallas_supported_terms(self.config)
            # NBFIX A/B tables ride the kernel's one-hot MXU gather up
            # to a practical type-count cap (VMEM blocks scale with Tp)
            and (
                self.ffparams.lj_ab is None
                or int(self.ffparams.lj_ab[0].shape[0]) <= 512
            )
            # below ~2k atoms the fixed kernel cost loses to XLA's fused
            # dense path (measured on v5e); "pallas" forces it on
            and (kernel == "pallas" or self.natoms >= 2048)
        )
        from .bonded import bonded_energy_forces, build_bonded_plan
        from .potentials import nonbonded_energy_forces

        ffp_ = self.ffparams
        config = self.config
        self._bonded_plan = build_bonded_plan(ffp_, config)
        plan = self._bonded_plan

        # Pallas fused bonded kernels (gather + physics + scatter in VMEM):
        # XLA's row-serialized gather/segment-sum ops cost ~2 ms at thrombin
        # scale; the kernels cut that to ~0.7 ms (ops/pallas_bonded.py).
        import os as _os

        self.use_pallas_bonded = (
            plan is not None
            and pallas_available()
            and self.dtype == jnp.float32
            and kernel in ("auto", "pallas")
            and _os.environ.get("TMD_PALLAS_BONDED", "1") != "0"
        )
        self._pallas_bonded_plan = None
        if self.use_pallas_bonded:
            from .ops.pallas_bonded import (
                build_pallas_bonded_plan,
                pallas_bonded_energy_forces,
            )

            self._pallas_bonded_plan = build_pallas_bonded_plan(ffp_, config)

        if self._pallas_bonded_plan is not None:
            pplan = self._pallas_bonded_plan

            def bonded_ef_one(pos, box):
                return pallas_bonded_energy_forces(pplan, pos, box)

        else:

            def bonded_ef_one(pos, box):
                """(per-term bonded potentials, bonded forces): fused analytic
                formulas with one sorted segment-sum scatter (torchmd_tpu.bonded)."""
                if plan is None:
                    return {}, jnp.zeros_like(pos)
                return bonded_energy_forces(ffp_, plan, pos, box, config)

        if "cmap" in self.energies and ffp_.cmap is not None:
            # CMAP rides on the bonded stage in every path (fused, Pallas,
            # cell, sharded): tiny term (one gather + degree-3 polynomial),
            # forces via AD of the spline surface.
            from .cmap import cmap_energy

            inner_bonded = bonded_ef_one
            cmt = ffp_.cmap

            def bonded_ef_one(pos, box):
                pot, frc = inner_bonded(pos, box)
                ec, gc = jax.value_and_grad(
                    lambda p: cmap_energy(cmt, p, box)
                )(pos)
                pot = dict(pot)
                pot["cmap"] = pot.get("cmap", 0.0) + ec
                return pot, frc - gc

        _g96_want_b = ("bonds" in self.energies
                       and ffp_.bonds_g96 is not None)
        _g96_want_a = ("angles" in self.energies
                       and ffp_.angles_g96 is not None)
        if _g96_want_b or _g96_want_a:
            # GROMOS-96 bonded forms ride on the bonded stage in every
            # path (fused, Pallas, cell, sharded) via AD, like CMAP:
            # tiny term counts, not worth kernel variants. Gated on the
            # active term set so inactive tables don't pay a no-op
            # value_and_grad every evaluation.
            from .potentials import g96_angle_energy, g96_bond_energy

            inner_bonded_g96 = bonded_ef_one
            bt_, at_ = ffp_.bonds_g96, ffp_.angles_g96
            want_b, want_a = _g96_want_b, _g96_want_a

            def bonded_ef_one(pos, box):
                pot, frc = inner_bonded_g96(pos, box)
                pot = dict(pot)

                def e_g96(p):
                    eb = (g96_bond_energy(bt_, p, box) if want_b
                          else jnp.zeros((), p.dtype))
                    ea = (g96_angle_energy(at_, p, box) if want_a
                          else jnp.zeros((), p.dtype))
                    return eb + ea, (eb, ea)

                (_, (eb, ea)), g = jax.value_and_grad(
                    e_g96, has_aux=True
                )(pos)
                if want_b:
                    pot["bonds"] = pot.get("bonds", 0.0) + eb
                if want_a:
                    pot["angles"] = pot.get("angles", 0.0) + ea
                return pot, frc - g

        self.bonded_ef_one = bonded_ef_one

        # The "slow" (nonbonded + reciprocal) evaluator -- kept separate
        # from the bonded part so the r-RESPA multiple-timestep scan can
        # split the force field (Integrator(mts=n)). NOTE: nb_ef_one and
        # bonded_ef_one are pre-vsite-wrap; the composed ef_one below is
        # the vsite-correct full evaluator.
        nb_ef_one = None
        if self.use_pallas:
            self._nb_data = prepare_nb_data(self.ffparams)
            nb_data = self._nb_data

            def nb_ef_one(pos, box):
                return pallas_nonbonded_energy_forces(
                    nb_data, config, pos, box
                )

        elif has_nb and ffp_.nb_mask is not None:

            def nb_ef_one(pos, box):
                return nonbonded_energy_forces(ffp_, pos, box, config)

        elif has_nb:
            # mask deferred (large-N kernel path pending): the dense
            # evaluator must not trace with nb_mask=None. The cell/verlet
            # overrides below replace this once a kernel exists.
            def nb_ef_one(pos, box):
                raise RuntimeError(
                    "dense nonbonded evaluator unavailable: the (N,N) "
                    "exclusion mask is deferred for this large-N system; "
                    "build the neighbor kernel (ensure_cell_kernel) or "
                    "materialize the mask (require_nb_mask) first"
                )

        if self.cell_requested and self._cell_kernel is not None and has_nb:
            kern = self._cell_kernel

            def nb_ef_one(pos, box):  # noqa: F811 -- cell-path override
                cl = kern.build(pos, box)
                return kern.energy_forces(pos, box, cl)

        elif self.verlet_requested and self._verlet_kernel is not None and has_nb:
            vkern = self._verlet_kernel

            def nb_ef_one(pos, box):  # noqa: F811 -- verlet-path override
                nlv = vkern.build(pos, box)
                return vkern.energy_forces(pos, box, nlv)

        if self._ewald is not None:
            rec = self._ewald
            inner_nb = nb_ef_one

            def nb_ef_one(pos, box):
                pot, frc = inner_nb(pos, box)
                # analytic PME gather forces (ewald.PmeRecip.energy_forces)
                # -- AD's backward re-runs the spread matmuls + an extra FFT
                er, ef = rec.energy_forces(pos, box)
                pot = dict(pot)
                pot["electrostatics"] = pot.get("electrostatics", 0.0) + er
                return pot, frc + ef

        self.nb_ef_one = nb_ef_one

        if nb_ef_one is not None:
            nb_local = nb_ef_one

            def ef_one(pos, box):
                pot, frc = bonded_ef_one(pos, box)
                nb_pot, nb_f = nb_local(pos, box)
                pot = dict(pot)
                for k, v in nb_pot.items():
                    pot[k] = pot.get(k, 0.0) + v
                return pot, frc + nb_f

        else:
            ef_one = bonded_ef_one

        # Virtual sites (TIP4P-family waters, GROMACS [virtual_sitesN]):
        # outermost wrap -- every inner path (dense/Pallas/cell/verlet/
        # Ewald) evaluates at the reconstructed site geometry and the
        # site forces chain-rule back onto the hosts (vsites.py).
        self.vsites = getattr(self.par, "vsites", None) or None
        if self.vsites:
            from .vsites import wrap_energy_forces

            ef_one = wrap_energy_forces(self.vsites, ef_one)

        self.ef_one = ef_one

        ext_energy_fn = getattr(external, "energy_fn", None)

        # deferred-mask systems report nonbonded energies through the
        # neighbor kernel (compute_potentials skips nb when nb_mask is
        # None, which must not silently drop terms)
        _kern_nb_details = (
            self._cell_kernel
            if (has_nb and self.ffparams.nb_mask is None
                and self.cell_requested and self._cell_kernel is not None)
            else None
        )
        _nb_details_missing = (
            has_nb and self.ffparams.nb_mask is None
            and _kern_nb_details is None
        )

        def _potentials_one(ffp, pos, box):
            if self.vsites:
                from .vsites import apply_vsites

                pos = apply_vsites(self.vsites, pos, box)
            if _nb_details_missing:
                raise RuntimeError(
                    "energy decomposition unavailable: the (N,N) "
                    "exclusion mask is deferred and no neighbor kernel "
                    "is built; call ensure_cell_kernel or "
                    "require_nb_mask first"
                )
            pot = compute_potentials(ffp, pos, box, self.config)
            if _kern_nb_details is not None:
                nb_pot, _ = _kern_nb_details.energy_forces(
                    pos, box, _kern_nb_details.build(pos, box))
                for k, v in nb_pot.items():
                    pot[k] = pot.get(k, 0.0) + v
            if self._ewald is not None:
                pot["electrostatics"] = (
                    pot.get("electrostatics", 0.0) + self._ewald.energy(pos, box)
                )
            if ext_energy_fn is not None:
                pot["external"] = ext_energy_fn(pos, box)
            return pot

        from .external import external_ef

        _ext_ef = external_ef(external)

        def _pot_and_forces(pos, box):
            # fused analytic (or Pallas) nonbonded + AD bonded -- identical
            # numbers to the pure-AD path (tests/test_fused.py) and far
            # cheaper to compile/execute
            pot, frc = ef_one(pos, box)
            if _ext_ef is not None:
                ee, ef = _ext_ef(pos, box)
                pot = dict(pot)
                pot["external"] = ee
                frc = frc + ef
            return pot, frc

        self._potentials_one = _potentials_one
        self._jit_pot = jax.jit(jax.vmap(_potentials_one, in_axes=(None, 0, 0)))
        self._jit_pot_forces = jax.jit(jax.vmap(_pot_and_forces, in_axes=(0, 0)))

    # ------------------------------------------------------------------
    def ensure_ewald(self, box, tol=1e-5):
        """Build (once) the reciprocal-space kernel for a concrete box and
        rebuild the evaluators with erfc-damped real-space electrostatics.
        Small systems get the exact separable Ewald sum; above TMD_PME_N
        atoms (default 4096, or elec='pme') the O(N + K^3 log K) smooth-PME
        mesh replaces the O(N*K^3) sum."""
        if not self.ewald_requested or self._ewald is not None:
            return self._ewald
        import os as _os

        from .ewald import EwaldRecip, PmeRecip

        use_pme = self.elec_mode == "pme" or (
            self.natoms >= int(_os.environ.get("TMD_PME_N", "4096"))
        )
        cls = PmeRecip if use_pme else EwaldRecip
        excl = self.par.get_exclusions(types=self.exclusions)
        self._ewald = cls(
            self.ffparams.charges, np.asarray(box).reshape(-1)[:3],
            self.cutoff, excl_pairs=excl, tol=tol, dtype=self.dtype,
        )
        self.config = self.config._replace(ewald_alpha=self._ewald.cfg.alpha)
        # neighbor kernels bake the term config at construction; refresh so
        # a kernel built before ensure_ewald picks up the erfc damping
        if self._cell_kernel is not None:
            self._cell_kernel.cfg = self.config
        if self._verlet_kernel is not None:
            self._verlet_kernel.cfg = self.config
        self._build_evaluators()
        return self._ewald

    # ------------------------------------------------------------------
    def _grid_feasible(self, box) -> bool:
        """Can this concrete box host a 27-stencil cell grid?"""
        if self.cutoff is None or box is None:
            return False
        b = np.asarray(box, dtype=np.float64).reshape(-1)[:3]
        if not np.all(b > 0):
            return False
        rc = float(self.cutoff) + float(self.cell_skin)
        return bool(np.min(b) // rc >= 3)

    def wants_cell(self, box) -> bool:
        """True when evaluation should run on the cell-list path for this
        concrete box: explicitly requested, or auto-selected for a large
        periodic system whose box can host a cell grid."""
        if self.cell_requested:
            return True
        if not getattr(self, "cell_auto", False):
            return False
        return self._grid_feasible(box)

    def require_nb_mask(self):
        """Materialize the deferred dense (natoms, natoms) exclusion mask
        (O(N^2) host+device memory -- 3.9 GB at 62.5k atoms) and rebuild
        the evaluators. Called by every path that genuinely consumes the
        dense mask: the dense/Pallas fallback when no cell grid is
        feasible, Verlet lists, spatial row blocks, and alchemy edits."""
        if getattr(self, "_nb_mask_deferred", False):
            excl = self.par.get_exclusions(
                types=self.exclusions, fullarray=True)
            m = ~excl
            np.fill_diagonal(m, False)
            self.ffparams = self.ffparams._replace(nb_mask=jnp.asarray(m))
            self._nb_mask_deferred = False
            self._build_evaluators()
        return self.ffparams

    def resolve_kernel_for_box(self, box):
        """Finalize auto kernel selection for a concrete box: the cell
        veto on the dense Pallas kernel only stands while a grid is
        actually feasible (a large open-boundary system must not fall to
        the pure-jnp dense path)."""
        infeasible = bool(
            self.cell_auto_size
            and not self.cell_requested
            and not self._grid_feasible(box)
        )
        if infeasible != getattr(self, "_cell_infeasible", False):
            self._cell_infeasible = infeasible
            if infeasible:
                # falling back to a dense-mask path (Pallas/verlet/jnp)
                self.require_nb_mask()  # no-op unless deferred
            self._build_evaluators()

    def wants_verlet(self, box=None) -> bool:
        """True when evaluation should run on the Verlet neighbor-list
        path: explicitly requested, or auto-selected for a mid-size cutoff
        system that the cell grid does not cover (no/too-small box)."""
        if self.verlet_requested:
            return True
        if not getattr(self, "verlet_auto", False):
            return False
        return not self.wants_cell(box)

    def ensure_verlet_kernel(self, box=None, pos0=None):
        """Build (once) the Verlet-list kernel. `pos0` (optional starting
        coordinates) sizes the neighbor capacity from real occupancy.
        Marks the verlet path as the active kernel."""
        if self._verlet_kernel is None:
            from .neighbors import VerletKernel

            self._verlet_kernel = VerletKernel(
                self.require_nb_mask(), self.config, box=box,
                skin=self.cell_skin, pos0=pos0,
            )
        self.verlet_requested = True
        return self._verlet_kernel

    def ensure_cell_kernel(self, box, pos0=None, allow_column=True):
        """Build (once) the large-N neighbor kernel for a concrete box
        diagonal. On TPU/f32 this prefers the z-sorted column kernel
        (torchmd_tpu.columns) -- ~4x less padded pair work than the
        27-stencil cell grid at gas density, full 128-lane tiles --
        falling back to the ghost-cell `CellKernel` when the column
        kernel cannot serve the system (NBFIX tables, f64/CPU, grids the
        column layout cannot host, or the slab-sharded spatial path which
        needs the cell structure). `pos0` (optional starting coordinates)
        sizes the capacities from real occupancy. Marks the cell path as
        the active kernel."""
        if getattr(self, "_nb_mask_authoritative", False):
            raise NotImplementedError(
                "the nonbonded mask carries alchemical edits the cell "
                "kernel cannot honor; use the dense/Pallas/verlet path"
            )
        _prev_kern = self._cell_kernel
        if self._cell_kernel is not None and not allow_column:
            from .columns import ColumnKernel as _CK

            if isinstance(self._cell_kernel, _CK):
                self._cell_kernel = None  # caller needs the cell structure
        if self._cell_kernel is None:
            import os as _os

            from .ops import pallas_available

            use_column = False
            # Default on TPU/f32 (TMD_COLUMN=0 opts out): with the Newton
            # half-stencil the column kernel measures 192 vs 96 steps/s
            # against the ghost-cell kernel at 24k-atom gas density on
            # v5e (docs/PERF.md)
            if (
                allow_column
                and _os.environ.get("TMD_COLUMN", "1") == "1"
                and self.dtype == jnp.float32
                and pallas_available()
            ):
                from .columns import column_supported

                use_column = column_supported(
                    self.config, self.ffparams, np.asarray(box),
                    skin=self.cell_skin,
                )
            if use_column:
                from .columns import ColumnKernel

                self._cell_kernel = ColumnKernel(
                    self.ffparams, self.config, self.par, np.asarray(box),
                    skin=self.cell_skin, exclusions=self.exclusions,
                    pos0=pos0,
                )
            else:
                from .neighbors import CellKernel

                self._cell_kernel = CellKernel(
                    self.ffparams, self.config, self.par, np.asarray(box),
                    skin=self.cell_skin, exclusions=self.exclusions,
                    pos0=pos0,
                )
        if not self.cell_requested or self._cell_kernel is not _prev_kern:
            # re-point nb_ef_one / ef_one / compute() at the kernel path:
            # without this the dense closures built at construction stay
            # live and (a) capture the O(N^2) mask as a 3.9 GB jit
            # constant at 62.5k atoms, (b) cannot evaluate at all when
            # the mask is deferred. Also re-binds after a column->cell
            # kernel swap (allow_column=False).
            self.cell_requested = True
            self._build_evaluators()
        return self._cell_kernel

    # ------------------------------------------------------------------
    def compute(
        self,
        pos,
        box,
        forces=None,
        returnDetails=False,
        explicit_forces=True,
        toNumpy=True,
        calculateForces=True,
    ):
        """Evaluate potentials (and forces) for a batch of replicas.

        pos: (nreplicas, natoms, 3); box: (nreplicas, 3, 3) or (nreplicas, 3).
        If `forces` is a numpy array it is filled in place (reference
        in-place semantics); the computed forces are also available as
        `self.last_forces`.
        """
        pos_j = jnp.asarray(np.asarray(pos), dtype=self.dtype)
        nreplicas = pos_j.shape[0]
        box_j = _box_to_diag(box, nreplicas, self.dtype)
        self.resolve_kernel_for_box(np.asarray(box_j)[0])
        if self.ewald_requested and self._ewald is None:
            self.ensure_ewald(np.asarray(box_j)[0])
        if self._cell_kernel is None and self.wants_cell(np.asarray(box_j)[0]):
            self.ensure_cell_kernel(np.asarray(box_j)[0],
                                    pos0=np.asarray(pos_j)[0])
            self._build_evaluators()
        if (
            self._verlet_kernel is None
            and not self.cell_requested
            and self.wants_verlet(np.asarray(box_j)[0])
        ):
            self.ensure_verlet_kernel(np.asarray(box_j)[0],
                                      pos0=np.asarray(pos_j)[0])
            self._build_evaluators()
        if (
            self.verlet_requested
            and self._verlet_kernel is not None
            and not self.cell_requested
        ):
            # Same silent-overflow guard as the cell path: a clamped
            # neighbor capacity drops pairs, so grow + rebuild until the
            # list fits.
            for _attempt in range(6):
                nl = jax.vmap(self._verlet_kernel.build)(pos_j, box_j)
                if not bool(np.any(np.asarray(nl.overflow))):
                    break
                self._verlet_kernel = self._verlet_kernel.grow()
                self._build_evaluators()
            else:
                raise RuntimeError("verlet list capacity kept overflowing")
        if self.cell_requested and self._cell_kernel is not None:
            # barostat-evolved boxes: rebox the grid when it no longer
            # hosts rc-wide cells (binning itself follows the traced box)
            if not self._cell_kernel.covers(np.asarray(box_j)):
                self._cell_kernel = self._cell_kernel.with_box(
                    np.asarray(box_j).min(axis=0), pos0=np.asarray(pos_j)[0]
                )
                self._build_evaluators()
            # Guard against silent cell-capacity overflow (which clamps atom
            # ranks and corrupts energies): grow + rebuild until it fits,
            # mirroring Integrator.step's retry loop. (The guard build is
            # separate from the one inside the jitted evaluator -- an
            # accepted ~2x build cost on this non-scan entry point.)
            for _attempt in range(4):
                cl = jax.vmap(self._cell_kernel.build)(pos_j, box_j)
                if not bool(np.any(np.asarray(cl.overflow))):
                    break
                self._cell_kernel = self._cell_kernel.grow()
                self._build_evaluators()
            else:
                raise RuntimeError("cell list capacity kept overflowing")

        if calculateForces:
            pot, frc = self._jit_pot_forces(pos_j, box_j)
        else:
            pot = self._jit_pot(self.ffparams, pos_j, box_j)
            frc = None

        # Host-side external potential (e.g. a torch NNP): batched call,
        # added after the internal terms (reference forces.py:321-326).
        if self.external is not None and not hasattr(self.external, "energy_fn"):
            ext_ene, ext_force = self.external.calculate(np.asarray(pos_j), box)
            pot = dict(pot)
            pot["external"] = jnp.asarray(np.asarray(ext_ene), self.dtype).reshape(
                nreplicas
            )
            if frc is not None:
                frc = frc + jnp.asarray(np.asarray(ext_force), self.dtype)

        if frc is not None:
            self.last_forces = frc
            if forces is not None and isinstance(forces, np.ndarray):
                forces[:] = np.asarray(frc, dtype=forces.dtype)

        # pot is a dict of (nreplicas,) arrays -> per-replica views
        keys = list(pot.keys())
        if "external" not in keys:
            pot = dict(pot)
            pot["external"] = jnp.zeros(nreplicas, dtype=self.dtype)
            keys.append("external")

        if returnDetails:
            if toNumpy:
                return [
                    {k: float(np.asarray(pot[k]).reshape(nreplicas)[i]) for k in keys}
                    for i in range(nreplicas)
                ]
            return [
                {k: jnp.reshape(pot[k], (nreplicas,))[i] for k in keys}
                for i in range(nreplicas)
            ]

        total = sum(jnp.reshape(pot[k], (nreplicas,)) for k in keys)
        if toNumpy:
            return [float(x) for x in np.asarray(total)]
        return total

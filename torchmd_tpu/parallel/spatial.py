"""Spatially-sharded energy evaluation: atom rows of the O(N^2) pair matrix
split over a mesh axis, positions all-gathered over ICI, partial energies
psum-reduced.

This is new capability relative to the reference (single device only,
SURVEY.md §2.9): one large system's nonbonded evaluation scales across
chips with `shard_map` + `all_gather`/`psum`, while bonded terms (cheap)
are computed replicated and divided by the axis size before the reduction.

The result is numerically identical to `potentials.compute_potentials`
(equivalence is tested on a virtual 8-device CPU mesh), and `jax.grad`
flows through the collectives (all_gather transposes to reduce-scatter),
so the same function serves sharded force evaluation and force-field
training.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..potentials import (
    FFParams,
    ForceTermConfig,
    NONBONDED_TERMS,
    compute_potentials,
    wrap_displacement,
)
from ..units import ELEC_FACTOR


def _pad_axis(arr, n, axis=0, value=0):
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=value)


def _rowblock_nonbonded(cfg, pos_rows, pos_full, box, mask_rows,
                        q_rows, q_all, sig_rows, sig_all, eps_rows, eps_all):
    """Nonbonded energy contribution of one block of atom rows against all
    atoms. Mirrors potentials.nonbonded_energies with the 0.5 symmetric
    factor, so summing blocks over the full row range gives the same total."""
    dv = pos_rows[:, None, :] - pos_full[None, :, :]
    dv = wrap_displacement(dv, box)
    d2 = jnp.sum(dv * dv, axis=-1)
    d2 = jnp.where(mask_rows, d2, 1.0)
    dist = jnp.sqrt(d2)
    rinv = 1.0 / dist
    mask = mask_rows
    if cfg.cutoff is not None:
        mask = jnp.logical_and(mask, dist <= cfg.cutoff)
    fmask = mask.astype(pos_rows.dtype)

    e = jnp.asarray(0.0, pos_rows.dtype)
    needs_ab = any(t in cfg.terms for t in ("lj", "repulsion", "repulsioncg"))
    if needs_ab:
        sig_ij = 0.5 * (sig_rows[:, None] + sig_all[None, :])
        eps_ij = jnp.sqrt(jnp.abs(eps_rows[:, None] * eps_all[None, :]))
        s6 = sig_ij**6
        B_ij = 4.0 * eps_ij * s6
        A_ij = B_ij * s6
        rinv6 = rinv**6
    if "lj" in cfg.terms:
        pot = A_ij * rinv6 * rinv6 - B_ij * rinv6
        if cfg.switch_dist is not None and cfg.cutoff is not None:
            t = (dist - cfg.switch_dist) / (cfg.cutoff - cfg.switch_dist)
            sw = 1.0 + t * t * t * (-10.0 + t * (15.0 - t * 6.0))
            pot = jnp.where(dist > cfg.switch_dist, pot * sw, pot)
        e = e + 0.5 * jnp.sum(pot * fmask)
    if "repulsion" in cfg.terms:
        e = e + 0.5 * jnp.sum(A_ij * rinv6 * rinv6 * fmask)
    if "repulsioncg" in cfg.terms:
        e = e + 0.5 * jnp.sum(B_ij * rinv6 * fmask)
    if "electrostatics" in cfg.terms:
        qq = ELEC_FACTOR * q_rows[:, None] * q_all[None, :]
        if cfg.rfa and cfg.cutoff is not None:
            denom = 2.0 * cfg.solvent_dielectric + 1.0
            krf = (1.0 / cfg.cutoff**3) * (cfg.solvent_dielectric - 1.0) / denom
            crf = (1.0 / cfg.cutoff) * (3.0 * cfg.solvent_dielectric) / denom
            pot = qq * (rinv + krf * dist * dist - crf)
        else:
            pot = qq * rinv
        e = e + 0.5 * jnp.sum(pot * fmask)
    return e


def sharded_energy_fn(ffp: FFParams, cfg: ForceTermConfig, mesh: Mesh,
                      dp_axis: str = "dp", sp_axis: str = "sp"):
    """Build `efn(pos_batch (B, N, 3), box_batch (B, 3)) -> (B,)` where the
    batch shards over `dp_axis` and each conformation's pair-matrix rows
    shard over `sp_axis`. B must divide by mesh.shape[dp_axis]."""
    if ffp.lj_ab is not None:
        raise NotImplementedError(
            "NBFIX override tables are not yet supported on the spatially "
            "sharded path; use the dense/cell kernels"
        )
    if cfg.ewald_alpha is not None:
        raise NotImplementedError(
            "Ewald real-space damping is not yet supported on the spatially "
            "sharded path; use the dense/cell kernels"
        )
    natoms = ffp.charges.shape[0]
    sp = mesh.shape[sp_axis]
    npad = -(-natoms // sp) * sp

    has_nb = any(t in cfg.terms for t in NONBONDED_TERMS) and ffp.nb_mask is not None
    if has_nb:
        charges_p = _pad_axis(ffp.charges, npad)
        sig_at = ffp.lj_params[:, 0][ffp.mapped_atom_types] if ffp.lj_params is not None else jnp.zeros(natoms, ffp.charges.dtype)
        eps_at = ffp.lj_params[:, 1][ffp.mapped_atom_types] if ffp.lj_params is not None else jnp.zeros(natoms, ffp.charges.dtype)
        sig_p = _pad_axis(sig_at, npad)
        eps_p = _pad_axis(eps_at, npad)
        mask_p = _pad_axis(_pad_axis(ffp.nb_mask, npad, 0), npad, 1)

    # Bonded terms (incl. 1-4) evaluate replicated on every sp rank; setting
    # nb_mask=None makes compute_potentials skip the dense nonbonded block.
    bonded_cfg = cfg
    ffp_bonded = ffp._replace(nb_mask=None)
    rows_per = npad // sp

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(dp_axis, sp_axis), P(dp_axis)),
        out_specs=P(dp_axis),
        check_vma=False,
    )
    def inner(pos_bs, box_b):
        # pos_bs: (B/dp, npad/sp, 3); box_b: (B/dp, 3)
        pos_full = jax.lax.all_gather(pos_bs, sp_axis, axis=1, tiled=True)
        row0 = jax.lax.axis_index(sp_axis) * rows_per

        def one(pos_rows, pos_all, box):
            e = jnp.asarray(0.0, pos_rows.dtype)
            if has_nb:
                mask_rows = jax.lax.dynamic_slice_in_dim(mask_p, row0, rows_per, 0)
                q_rows = jax.lax.dynamic_slice_in_dim(charges_p, row0, rows_per, 0)
                s_rows = jax.lax.dynamic_slice_in_dim(sig_p, row0, rows_per, 0)
                e_rows = jax.lax.dynamic_slice_in_dim(eps_p, row0, rows_per, 0)
                e = e + _rowblock_nonbonded(
                    cfg, pos_rows, pos_all, box, mask_rows,
                    q_rows, charges_p, s_rows, sig_p, e_rows, eps_p,
                )
            pot_b = compute_potentials(
                ffp_bonded, pos_all[:natoms], box, bonded_cfg
            )
            e = e + sum(jax.tree_util.tree_leaves(pot_b)) / sp
            return e

        e_part = jax.vmap(one, in_axes=(0, 0, 0))(pos_bs, pos_full, box_b)
        return jax.lax.psum(e_part, sp_axis)

    def efn(pos_batch, box_batch):
        pos_p = _pad_axis(pos_batch, npad, axis=1)
        return inner(pos_p, box_batch)

    return efn

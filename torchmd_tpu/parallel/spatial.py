"""Spatially-sharded energy evaluation: atom rows of the O(N^2) pair matrix
split over a mesh axis, positions all-gathered over ICI, partial energies
psum-reduced.

This is new capability relative to the reference (single device only,
SURVEY.md §2.9): one large system's nonbonded evaluation scales across
chips with `shard_map` + `all_gather`/`psum`, while bonded terms (cheap)
are computed replicated and divided by the axis size before the reduction.

The per-pair math is `potentials.nonbonded_block_energy_forces` — the SAME
function the dense single-device path uses — so NBFIX A/B tables, LJ
switching, RFA and Ewald-damped real-space electrostatics behave
identically on the sharded path (the Ewald reciprocal/self/exclusion sum
is evaluated replicated and divided by the axis size). `jax.grad` flows
through the collectives (all_gather transposes to reduce-scatter), so the
same function serves sharded force evaluation and force-field training.
Numerical equivalence with `potentials.compute_potentials` is tested on a
virtual 8-device CPU mesh (tests/test_parallel.py).
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
    nonbonded_block_energy_forces,
    pair_coefficients,
    wrap_displacement,
)


def _pad_axis(arr, n, axis=0, value=0):
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=value)


def pad_ffparams_rows(ffp: FFParams, npad: int) -> FFParams:
    """Pad the per-atom arrays (and the pair mask) to `npad` rows so atom
    rows divide evenly over a mesh axis. Padding atoms carry zero charge /
    LJ type 0 and a fully-masked pair row, so they contribute nothing."""
    nb_mask = ffp.nb_mask
    if nb_mask is not None:
        nb_mask = _pad_axis(_pad_axis(nb_mask, npad, 0), npad, 1)
    return ffp._replace(
        charges=_pad_axis(ffp.charges, npad),
        mapped_atom_types=_pad_axis(ffp.mapped_atom_types, npad),
        nb_mask=nb_mask,
    )


def rowblock_energy_forces(ffp_pad: FFParams, cfg: ForceTermConfig,
                           pos_rows, pos_full, box, row0):
    """Nonbonded energies + row forces for rows [row0, row0+nrows) of the
    pair matrix against all atoms — the unified dense block math applied
    to a dynamic row slice. Energies carry the 0.5 symmetric factor, so
    psum over a full row partition reproduces the dense totals and row
    forces are complete per-atom forces."""
    nrows = pos_rows.shape[0]
    dv = pos_rows[:, None, :] - pos_full[None, :, :]
    dv = wrap_displacement(dv, box)
    mask_rows = jax.lax.dynamic_slice_in_dim(ffp_pad.nb_mask, row0, nrows, 0)
    qq, A_ij, B_ij = pair_coefficients(ffp_pad, cfg, rows=(row0, nrows))
    return nonbonded_block_energy_forces(cfg, dv, mask_rows, qq, A_ij, B_ij)


def sharded_energy_fn(ffp: FFParams, cfg: ForceTermConfig, mesh: Mesh,
                      dp_axis: str = "dp", sp_axis: str = "sp",
                      ewald=None):
    """Build `efn(pos_batch (B, N, 3), box_batch (B, 3)) -> (B,)` where the
    batch shards over `dp_axis` and each conformation's pair-matrix rows
    shard over `sp_axis`. B must divide by mesh.shape[dp_axis].

    `ewald`: optional EwaldRecip whose reciprocal/self/exclusion energy is
    added (evaluated replicated on every sp rank, divided by sp)."""
    natoms = ffp.charges.shape[0]
    sp = mesh.shape[sp_axis]
    npad = -(-natoms // sp) * sp
    rows_per = npad // sp

    has_nb = any(t in cfg.terms for t in NONBONDED_TERMS) and ffp.nb_mask is not None
    ffp_pad = pad_ffparams_rows(ffp, npad) if has_nb else ffp

    # Bonded terms (incl. 1-4) evaluate replicated on every sp rank; setting
    # nb_mask=None makes compute_potentials skip the dense nonbonded block.
    ffp_bonded = ffp._replace(nb_mask=None)

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
                pot_nb, _ = rowblock_energy_forces(
                    ffp_pad, cfg, pos_rows, pos_all, box, row0
                )
                e = e + sum(jax.tree_util.tree_leaves(pot_nb))
            pot_b = compute_potentials(ffp_bonded, pos_all[:natoms], box, cfg)
            e_rep = sum(jax.tree_util.tree_leaves(pot_b))
            if ewald is not None:
                e_rep = e_rep + ewald.energy(pos_all[:natoms], box)
            e = e + e_rep / sp
            return e

        e_part = jax.vmap(one, in_axes=(0, 0, 0))(pos_bs, pos_full, box_b)
        return jax.lax.psum(e_part, sp_axis)

    def efn(pos_batch, box_batch):
        pos_p = _pad_axis(pos_batch, npad, axis=1)
        return inner(pos_p, box_batch)

    return efn

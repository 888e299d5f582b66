"""Equivalence tests for the fused Pallas PME kernels (interpret mode).

The fused spread/gather kernels (ops/pallas_pme.py) must reproduce the
XLA einsum formulation of PmeRecip.energy_forces (ewald.py) — same tap
rows, same contraction, different execution. Reference values are
computed with f64 numpy einsums from identical (f32-valued) inputs, so
the asserted tolerance is the kernels' own bf16-split arithmetic
(~1e-5 relative), not formulation drift.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchmd_tpu.ewald import PmeRecip
from torchmd_tpu.ops import pallas_pme as ppme


def _case(n_atoms=97, seed=0, kmesh=(16, 12, 8), order=4):
    rng = np.random.default_rng(seed)
    box = np.array([13.0, 11.0, 9.5])
    pos = (rng.random((n_atoms, 3)) * box).astype(np.float32)
    q = (rng.random(n_atoms) - 0.5).astype(np.float32)
    q[-1] -= q.sum()
    rec = PmeRecip(q, box, cutoff=4.0, order=order, dtype=jnp.float32)
    # pin the mesh: the test pins contraction equivalence, not parameter
    # selection, and a small non-cubic mesh exercises the x/y padding
    rec.cfg = rec.cfg._replace(kmax=kmesh)
    rec._b2 = tuple(
        jnp.asarray(rec._spline_b2(K), jnp.float64).astype(jnp.float32)
        for K in kmesh
    )
    pos_j = jnp.asarray(pos)
    box_j = jnp.asarray(box, jnp.float32)
    (Rx, Ry, Rz), (dRx, dRy, dRz) = rec._tap_rows_d(pos_j, box_j)
    Rzq = Rz * jnp.asarray(q)[:, None]
    dRzq = dRz * jnp.asarray(q)[:, None]
    return rec, pos_j, box_j, (Rx, Ry, Rzq, dRx, dRy, dRzq)


def test_spread_kernel_matches_einsum():
    _, _, _, (Rx, Ry, Rzq, _, _, _) = _case()
    mesh = np.asarray(ppme.pme_spread(
        Rx, Ry, Rzq, (16, 12, 8), interpret=True))
    ref = np.einsum(
        "ax,ay,az->xyz",
        np.asarray(Rx, np.float64), np.asarray(Ry, np.float64),
        np.asarray(Rzq, np.float64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(mesh, ref, atol=3e-5 * scale)


def test_gather_kernel_matches_einsum():
    rng = np.random.default_rng(3)
    _, _, _, rows = _case()
    Rx, Ry, Rzq, dRx, dRy, dRzq = rows
    phi = (rng.random((16, 12, 8)) - 0.5).astype(np.float32)
    frc = np.asarray(ppme.pme_gather_forces(
        Rx, Ry, Rzq, dRx, dRy, dRzq, jnp.asarray(phi), interpret=True))
    p64 = phi.astype(np.float64)
    r = [np.asarray(a, np.float64) for a in rows]
    fx = -np.einsum("ax,ay,az,xyz->a", r[3], r[1], r[2], p64)
    fy = -np.einsum("ax,ay,az,xyz->a", r[0], r[4], r[2], p64)
    fz = -np.einsum("ax,ay,az,xyz->a", r[0], r[1], r[5], p64)
    ref = np.stack([fx, fy, fz], axis=1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(frc, ref, atol=3e-5 * scale)


def test_gather_kernel_highest_precision_mode():
    _, _, _, rows = _case(n_atoms=41, kmesh=(8, 8, 8))
    Rx, Ry, Rzq, dRx, dRy, dRzq = rows
    rng = np.random.default_rng(7)
    phi = (rng.random((8, 8, 8)) - 0.5).astype(np.float32)
    os.environ["TMD_PME_PALLAS_PREC"] = "highest"
    try:
        frc = np.asarray(ppme.pme_gather_forces(
            Rx, Ry, Rzq, dRx, dRy, dRzq, jnp.asarray(phi),
            interpret=True))
    finally:
        del os.environ["TMD_PME_PALLAS_PREC"]
    p64 = phi.astype(np.float64)
    r = [np.asarray(a, np.float64) for a in rows]
    fx = -np.einsum("ax,ay,az,xyz->a", r[3], r[1], r[2], p64)
    ref_fx = fx
    scale = np.abs(ref_fx).max()
    np.testing.assert_allclose(frc[:, 0], ref_fx, atol=2e-6 * scale)


def test_energy_forces_dispatch_interpret_matches_xla():
    """Full PmeRecip.energy_forces through the Pallas dispatch equals
    the XLA einsum path on identical inputs (f32)."""
    rec, pos_j, box_j, _ = _case(n_atoms=64, kmesh=(16, 16, 16))
    old = os.environ.get("TMD_PME_GATHER")
    try:
        os.environ["TMD_PME_GATHER"] = "xla"
        e_x, f_x = jax.jit(rec.energy_forces)(pos_j, box_j)
        e_x, f_x = np.asarray(e_x), np.asarray(f_x)
        os.environ["TMD_PME_GATHER"] = "interpret"
        e_p, f_p = jax.jit(rec.energy_forces)(pos_j, box_j)
        e_p, f_p = np.asarray(e_p), np.asarray(f_p)
    finally:
        if old is None:
            os.environ.pop("TMD_PME_GATHER", None)
        else:
            os.environ["TMD_PME_GATHER"] = old
    assert abs(e_p - e_x) <= 2e-5 * max(1.0, abs(e_x))
    fscale = np.abs(f_x).max()
    np.testing.assert_allclose(f_p, f_x, atol=5e-5 * max(1.0, fscale))


def test_block_padding_edges():
    """N not a multiple of the block size and K axes needing x/y padding
    still produce exact-length outputs with zero contributions from the
    pad rows."""
    _, _, _, rows = _case(n_atoms=130, kmesh=(12, 20, 8))
    Rx, Ry, Rzq, dRx, dRy, dRzq = rows
    rng = np.random.default_rng(11)
    phi = (rng.random((12, 20, 8)) - 0.5).astype(np.float32)
    frc = np.asarray(ppme.pme_gather_forces(
        Rx, Ry, Rzq, dRx, dRy, dRzq, jnp.asarray(phi),
        block_i=64, interpret=True))
    assert frc.shape == (130, 3)
    p64 = phi.astype(np.float64)
    r = [np.asarray(a, np.float64) for a in rows]
    fz = -np.einsum("ax,ay,az,xyz->a", r[0], r[1], r[5], p64)
    scale = np.abs(fz).max()
    np.testing.assert_allclose(frc[:, 2], fz, atol=3e-5 * scale)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

"""Equivalence tests for the fused Pallas PME kernels (interpret mode).

Kernel-level tests pin the fused contractions against f64 numpy
einsums built from identical (f32-valued) inputs — asserting only the
kernels' bf16-split arithmetic (~1e-5 relative). The dispatch test
pins PmeRecip.energy_forces through the Pallas/ik path against the XLA
analytic-spline path: energies tightly (same spread contraction),
forces to spline-truncation order (ik vs analytic differentiation are
distinct standard PME force discretizations that agree to O(h^order)).
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
    # selection, and a small non-cubic mesh exercises the padding
    rec.cfg = rec.cfg._replace(kmax=kmesh)
    rec._b2 = tuple(
        jnp.asarray(rec._spline_b2(K), jnp.float64).astype(jnp.float32)
        for K in kmesh
    )
    pos_j = jnp.asarray(pos)
    box_j = jnp.asarray(box, jnp.float32)
    (Rx, Ry, Rz), _ = rec._tap_rows_d(pos_j, box_j)
    Rzq = Rz * jnp.asarray(q)[:, None]
    return rec, pos_j, box_j, (Rx, Ry, Rzq)


def test_spread_kernel_matches_einsum():
    _, _, _, (Rx, Ry, Rzq) = _case()
    mesh = np.asarray(ppme.pme_spread(
        Rx, Ry, Rzq, (16, 12, 8), interpret=True))
    ref = np.einsum(
        "ax,ay,az->xyz",
        np.asarray(Rx, np.float64), np.asarray(Ry, np.float64),
        np.asarray(Rzq, np.float64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(mesh, ref, atol=3e-5 * scale)


def _ik_reference(rows, dgrids):
    r = [np.asarray(a, np.float64) for a in rows]
    out = []
    for g in dgrids:
        out.append(-np.einsum("ax,ay,az,xyz->a", r[0], r[1], r[2],
                              np.asarray(g, np.float64)))
    return np.stack(out, axis=1)


def test_gather_ik_kernel_matches_einsum():
    rng = np.random.default_rng(3)
    _, _, _, rows = _case()
    dgrids = tuple(
        jnp.asarray((rng.random((16, 12, 8)) - 0.5).astype(np.float32))
        for _ in range(3))
    frc = np.asarray(ppme.pme_gather_ik(*rows, dgrids, interpret=True))
    ref = _ik_reference(rows, dgrids)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(frc, ref, atol=3e-5 * scale)


def test_gather_ik_highest_precision_mode():
    _, _, _, rows = _case(n_atoms=41, kmesh=(8, 8, 8))
    rng = np.random.default_rng(7)
    dgrids = tuple(
        jnp.asarray((rng.random((8, 8, 8)) - 0.5).astype(np.float32))
        for _ in range(3))
    os.environ["TMD_PME_PALLAS_PREC"] = "highest"
    try:
        frc = np.asarray(ppme.pme_gather_ik(
            *rows, dgrids, interpret=True))
    finally:
        del os.environ["TMD_PME_PALLAS_PREC"]
    ref = _ik_reference(rows, dgrids)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(frc, ref, atol=2e-6 * scale)


def test_energy_forces_dispatch_interpret_matches_xla():
    """Full PmeRecip.energy_forces through the Pallas/ik dispatch vs the
    XLA analytic-spline path: identical energy contraction (tight), ik
    vs analytic forces agree to spline truncation (loose)."""
    # mesh fine enough for the configured alpha that near-Nyquist
    # spectral content is small — on a coarse pinned mesh ik and
    # analytic legitimately diverge (measured: max|d| 9.4 at 16^3 ->
    # 0.52 at 32^3 -> 0.01 at 32^3/order 6 on this system); production
    # meshes are chosen by choose_parameters to keep that content ~tol
    rec, pos_j, box_j, _ = _case(n_atoms=64, kmesh=(32, 32, 32))
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
    # ik vs analytic spline differentiation: O(h^order) agreement
    np.testing.assert_allclose(f_p, f_x, atol=2e-2 * max(1.0, fscale))
    # and the ik force sum is ~zero (momentum conservation of the
    # plain-weight gather against zero-mean gradient grids)
    np.testing.assert_allclose(
        f_p.sum(axis=0), np.zeros(3), atol=1e-3 * max(1.0, fscale))


def test_block_padding_edges():
    """N not a multiple of the block size, odd K axes needing x/y/z
    padding, and a custom block size still produce exact-length outputs
    with zero contributions from the pad rows."""
    _, _, _, rows = _case(n_atoms=130, kmesh=(12, 20, 8))
    rng = np.random.default_rng(11)
    dgrids = tuple(
        jnp.asarray((rng.random((12, 20, 8)) - 0.5).astype(np.float32))
        for _ in range(3))
    frc = np.asarray(ppme.pme_gather_ik(
        *rows, dgrids, block_i=64, interpret=True))
    assert frc.shape == (130, 3)
    ref = _ik_reference(rows, dgrids)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(frc, ref, atol=3e-5 * scale)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

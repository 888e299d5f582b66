"""PBC wrapping tests: vectorized group wrap vs the reference Wrapper."""

from __future__ import annotations

import numpy as np
import pytest

from torchmd_tpu.wrapper import Wrapper, calculate_molecule_groups


def test_molecule_groups():
    bonds = np.array([[0, 1], [1, 2], [4, 5]])
    groups, nongrouped = calculate_molecule_groups(7, bonds)
    assert sorted(map(tuple, (g.tolist() for g in groups))) == [(0, 1, 2), (4, 5)]
    assert sorted(nongrouped.tolist()) == [3, 6]


def test_wrap_moves_molecules_into_box():
    bonds = np.array([[0, 1]])
    w = Wrapper(3, bonds)
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [10.0, 10.0, 10.0])
    pos = np.array([[[11.0, 0.5, 0.5], [12.0, 0.5, 0.5], [-3.0, 25.0, 0.5]]])
    w.wrap(pos, box)
    # bonded pair wraps rigidly by its COM (11.5 -> 1.5)
    np.testing.assert_allclose(pos[0, 0], [1.0, 0.5, 0.5])
    np.testing.assert_allclose(pos[0, 1], [2.0, 0.5, 0.5])
    # free atom wraps per-axis
    np.testing.assert_allclose(pos[0, 2], [7.0, 5.0, 0.5])


def test_wrap_no_box_is_identity():
    w = Wrapper(2, None)
    pos = np.random.randn(1, 2, 3) * 100
    before = pos.copy()
    w.wrap(pos, np.zeros((1, 3, 3)))
    np.testing.assert_array_equal(pos, before)


def test_wrap_matches_reference(refmod):
    """Randomized comparison against the reference COM-wrapping loop."""
    pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from torchmd.wrapper import Wrapper as RefWrapper

    rs = np.random.RandomState(7)
    natoms = 40
    # random molecules: chain bonds in blocks of 3, leaving some singletons
    bonds = []
    for start in range(0, 30, 3):
        bonds += [[start, start + 1], [start + 1, start + 2]]
    bonds = np.array(bonds)

    # single replica: the reference's singleton-atom branch only broadcasts
    # correctly for nreplicas == 1 (wrapper.py:29)
    pos = rs.randn(1, natoms, 3) * 30
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [17.0, 19.0, 23.0])

    mine = pos.copy()
    Wrapper(natoms, bonds).wrap(mine, box)

    ref = torch.tensor(pos.copy())
    RefWrapper(natoms, bonds, "cpu").wrap(ref, torch.tensor(box))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-10)

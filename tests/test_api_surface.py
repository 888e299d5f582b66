"""Smaller API-surface behaviors: energy-only compute, wrapidx recentering,
get_parameters filtering, reference-name alias imports."""

from __future__ import annotations

import os

import numpy as np

from common import ALL_TERMS, load_system
from conftest import DATA_DIR

from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters


def test_compute_energy_only():
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "1water"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double")
    pos = mol.coords[:, :, 0][None]
    full = forces.compute(pos, None, returnDetails=True)[0]
    eonly = forces.compute(pos, None, returnDetails=True,
                           calculateForces=False)[0]
    for k, v in full.items():
        assert abs(eonly[k] - v) < 1e-10
    # non-details totals agree too
    t1 = forces.compute(pos, None)[0]
    t2 = forces.compute(pos, None, calculateForces=False)[0]
    assert abs(t1 - t2) < 1e-10


def test_wrapper_wrapidx_recenters():
    from torchmd_tpu.wrapper import Wrapper

    pos = np.array([[[18.0, 18.0, 18.0], [19.0, 18.0, 18.0],
                     [2.0, 2.0, 2.0]]])
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], [20.0] * 3)
    w = Wrapper(3, np.array([[0, 1]]))
    out = w.wrap(pos.copy(), box, wrapidx=np.array([0, 1]))
    # the selected group's COM sits at box/2 after recentring
    com = out[0, :2].mean(axis=0)
    np.testing.assert_allclose(com, [10.0, 10.0, 10.0], atol=1e-10)


def test_get_parameters_filtering():
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "benzamidine"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    all_p = par.get_parameters()
    assert set(all_p) >= {"charges", "lj", "bonds", "angles", "dihedrals"}
    only = par.get_parameters(include=["bonds"])
    assert set(only) == {"bonds"}
    excl = par.get_parameters(exclude=["charges", "lj"])
    assert "charges" not in excl and "bonds" in excl


def test_reference_alias_imports():
    from torchmd_tpu.npzmol import npzMolecule  # noqa: F401
    from torchmd_tpu.mycalc import MyCalc  # noqa: F401
    from torchmd_tpu.neighbourlist import discretize_box  # noqa: F401
    from torchmd_tpu.integrator import BOLTZMAN, TIMEFACTOR

    assert abs(BOLTZMAN - 0.001987191) < 1e-12
    assert abs(TIMEFACTOR - 48.88821) < 1e-9


def test_cli_help_runs():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "torchmd_tpu.run", "--help"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0
    assert "--forceterms" in out.stdout and "--constraints" in out.stdout


def test_lazy_exports_resolve():
    """Every name in the lazy-export table resolves (catches stale
    entries after module moves)."""
    import torchmd_tpu

    for name in torchmd_tpu._LAZY:
        obj = getattr(torchmd_tpu, name)
        assert obj is not None, name
    # names in __all__ that claim lazy re-export must be in the table
    modules = {
        "io", "forcefields", "parameters", "systems", "forces",
        "integrator", "minimizers", "wrapper", "neighbors", "potentials",
        "parallel", "train", "external", "checkpoint", "profiling",
        "units", "run",
    }
    for name in torchmd_tpu.__all__:
        if name not in modules:
            assert name in torchmd_tpu._LAZY, name

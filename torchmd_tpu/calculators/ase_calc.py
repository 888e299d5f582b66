"""ASE calculator adapter.

Equivalent of the reference's `torchmd/mycalc.py:11-64` (`MyCalc`): wraps a
`Forces`-style evaluator so ASE optimizers/dynamics can drive it. Energies
in kcal/mol are converted to eV for ASE and forces to eV/A.
"""

from __future__ import annotations

import numpy as np

try:
    from ase.calculators.calculator import Calculator, all_changes
    from ase import units as ase_units

    _HAVE_ASE = True
except ImportError:  # pragma: no cover - ase is optional
    _HAVE_ASE = False

    class Calculator:  # minimal stand-in so the module imports without ase
        def __init__(self, *a, **kw):
            self.results = {}

    all_changes = ["positions", "numbers", "cell", "pbc"]

    class ase_units:
        kcal = 1.0 / 23.060547830619026  # eV per kcal/mol
        mol = 1.0


KCALMOL_TO_EV = 0.04336410390059322


class MyCalc(Calculator):
    """ASE Calculator over a torchmd-tpu `Forces` evaluator."""

    implemented_properties = ["energy", "forces"]

    def __init__(self, evaluator, restart=None, label="torchmd-tpu",
                 atoms=None, **kwargs):
        if _HAVE_ASE:
            Calculator.__init__(self, restart=restart, label=label,
                                atoms=atoms, **kwargs)
        else:
            Calculator.__init__(self)
        self.evaluator = evaluator

    def calculate(self, atoms=None, properties=("energy",),
                  system_changes=all_changes):
        if _HAVE_ASE:
            Calculator.calculate(self, atoms, properties, system_changes)
        if atoms is None:
            atoms = self.atoms
        pos = np.asarray(atoms.get_positions(), dtype=np.float64)[None]
        cell = np.asarray(atoms.get_cell())
        box = np.diag(cell)[None] if cell.size else np.zeros((1, 3))

        epot = self.evaluator.compute(pos, box)
        forces = np.asarray(self.evaluator.last_forces)[0]
        self.results = {
            "energy": float(epot[0]) * KCALMOL_TO_EV,
            "forces": forces * KCALMOL_TO_EV,
        }

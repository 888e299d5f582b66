"""Well-tempered metadynamics: barrier crossing and PMF recovery on an
analytic double well (beyond-reference capability; the whole bias loop
compiles into the scan)."""

from __future__ import annotations

import numpy as np
import pytest

from torchmd_tpu.forcefields.forcefield import NullForcefield
from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
from torchmd_tpu.io import Molecule
from torchmd_tpu.metadynamics import MetaDynamics
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System

A = 1.2     # kcal/mol/A^4
X0 = 1.5    # minima at +-X0; barrier A*X0^4 ~= 6.1 kcal/mol (~10 kT)


class DoubleWell:
    """V(x) = A (x^2 - X0^2)^2 on the x-coordinate of atom 0."""

    def energy_fn(self, pos, box=None):
        x = pos[0, 0]
        return A * (x * x - X0 * X0) ** 2


def _setup(seed=0):
    mol = Molecule()
    mol.numAtoms = 1
    mol.atomtype = np.array(["X"], dtype=object)
    mol.charge = np.zeros(1)
    mol.masses = np.full(1, 40.0)
    mol.coords = np.array([[X0, 0.0, 0.0]])[:, :, None]
    par = Parameters(NullForcefield(mol), mol, [], precision="double")
    forces = Forces(par, terms=[], precision="double", external=DoubleWell())
    system = System(1, 1, "double")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=seed))
    return par, forces, system


def test_plain_md_stays_in_well():
    par, forces, system = _setup(seed=3)
    integ = Integrator(system, forces, 2.0, gamma=5.0, T=300.0, seed=3)
    xs = []
    for _ in range(30):
        integ.step(niter=500)
        xs.append(system.pos[0, 0, 0])
    assert np.min(xs) > 0.2, xs  # ~10 kT barrier: no unassisted crossing


def test_metad_crosses_and_recovers_pmf():
    par, forces, system = _setup(seed=5)
    cv = lambda pos, box=None: pos[0, 0]  # noqa: E731
    metad = MetaDynamics(
        system, forces, cv, timestep=2.0, T=300.0, gamma=5.0,
        grid=(-3.0, 3.0, 121), sigma=0.15, height=0.25, stride=40,
        bias_factor=8.0, seed=5,
    )
    cvs = []
    for _ in range(12):
        cvs.append(metad.run(niter=4000))
    cvs = np.concatenate(cvs)
    # the bias pushed the walker over the ~10 kT barrier
    assert cvs.min() < -1.0 and cvs.max() > 1.0, (cvs.min(), cvs.max())
    assert metad.nhills == 12 * 100

    xs, F = metad.free_energy()
    # barrier height estimate from the deposited bias: F(0) - F(minima)
    mid = F[np.argmin(np.abs(xs))]
    well_plus = F[(xs > 1.0) & (xs < 2.0)].min()
    well_minus = F[(xs < -1.0) & (xs > -2.0)].min()
    barrier_true = A * X0**4
    est = mid - 0.5 * (well_plus + well_minus)
    assert abs(est - barrier_true) < 0.35 * barrier_true, (
        est, barrier_true
    )
    # the two wells are near +-X0 and roughly symmetric
    assert abs(xs[np.argmin(np.where((xs > 0.5), F, np.inf))] - X0) < 0.5
    assert abs(well_plus - well_minus) < 0.3 * barrier_true


def test_metad_rejects_host_external():
    par, forces, system = _setup()

    class HostExt:
        def calculate(self, pos, box):
            return np.zeros(1), np.zeros((1, 1, 3))

    forces.external = HostExt()
    with pytest.raises(ValueError):
        MetaDynamics(system, forces, lambda p, b=None: p[0, 0],
                     timestep=2.0, T=300.0)


def test_chunked_runs_deposit_hills():
    """Deposition cadence is global across run() calls: chunks smaller
    than the stride must still deposit (regression: a chunk-local counter
    deposited nothing for niter < stride)."""
    par, forces, system = _setup(seed=3)
    md = MetaDynamics(
        system, forces, lambda pos, box=None: pos[0, 0],
        timestep=2.0, T=300.0,
        gamma=2.0, height=0.2, sigma=0.3, grid=(-4.0, 4.0, 101),
        stride=50, seed=3,
    )
    for _ in range(10):
        md.run(20)  # 200 steps in chunks of 20 < stride
    assert md.nhills == 4  # 200 // 50
    assert float(np.abs(np.asarray(md.bias)).max()) > 0.0

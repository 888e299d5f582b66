"""Anisotropic and membrane MC barostat variants: ideal-gas volume law,
axis masking, zmode semantics, and the surface-tension area bias."""

from __future__ import annotations

import numpy as np

from torchmd_tpu.barostat import (
    BAR_A3_TO_KCALMOL,
    MonteCarloAnisotropicBarostat,
    MonteCarloMembraneBarostat,
)
from torchmd_tpu.forces import Forces
from torchmd_tpu.forcefields.forcefield import NullForcefield
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System
from torchmd_tpu.units import BOLTZMANN


def _ideal_gas(N=64, T=300.0, P_bar=400.0, seed=0):
    P = P_bar * BAR_A3_TO_KCALMOL
    target_V = (N + 1) * BOLTZMANN * T / P
    rs = np.random.RandomState(seed)
    mol = Molecule()
    mol.numAtoms = N
    mol.atomtype = np.array(["X"] * N, dtype=object)
    mol.charge = np.zeros(N)
    mol.masses = np.full(N, 40.0)
    L0 = target_V ** (1 / 3)
    mol.coords = (rs.rand(N, 3) * L0)[:, :, None]
    par = Parameters(NullForcefield(mol), mol, [], precision="double")
    forces = Forces(par, terms=[], precision="double")
    system = System(N, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.array([L0, L0, L0]))
    return system, forces, target_V


def test_aniso_ideal_gas_volume_law():
    N, T, P_bar = 64, 300.0, 400.0
    system, forces, target_V = _ideal_gas(N, T, P_bar)
    baro = MonteCarloAnisotropicBarostat(P_bar, T, seed=1)
    vols = []
    for i in range(4000):
        baro.attempt(system, forces)
        if i >= 800:
            vols.append(float(np.prod(np.diag(system.box[0]))))
    mean_v = np.mean(vols)
    assert abs(mean_v - target_V) / target_V < 0.12, (mean_v, target_V)
    # all three axes actually moved
    box = np.diag(system.box[0])
    assert len(np.unique(np.round(box, 6))) > 1


def test_aniso_axis_mask():
    system, forces, _ = _ideal_gas()
    L_y0 = system.box[0][1, 1]
    L_z0 = system.box[0][2, 2]
    baro = MonteCarloAnisotropicBarostat(
        400.0, 300.0, seed=2, scale_axes=(True, False, False)
    )
    for _ in range(200):
        baro.attempt(system, forces)
    assert system.box[0][1, 1] == L_y0
    assert system.box[0][2, 2] == L_z0
    assert system.box[0][0, 0] != system.box[0][1, 1]


def test_membrane_ideal_gas_volume_law():
    N, T, P_bar = 64, 300.0, 400.0
    system, forces, target_V = _ideal_gas(N, T, P_bar)
    baro = MonteCarloMembraneBarostat(P_bar, T, surface_tension=0.0, seed=3)
    vols = []
    for i in range(4000):
        baro.attempt(system, forces)
        if i >= 800:
            vols.append(float(np.prod(np.diag(system.box[0]))))
    mean_v = np.mean(vols)
    assert abs(mean_v - target_V) / target_V < 0.12, (mean_v, target_V)
    # semi-isotropic: x and y stay equal, z decouples
    box = np.diag(system.box[0])
    assert np.isclose(box[0], box[1])


def test_membrane_zmode_fixed():
    system, forces, _ = _ideal_gas()
    L_z0 = system.box[0][2, 2]
    baro = MonteCarloMembraneBarostat(400.0, 300.0, seed=4, zmode="fixed")
    for _ in range(300):
        baro.attempt(system, forces)
    assert system.box[0][2, 2] == L_z0
    assert system.box[0][0, 0] != L_z0  # xy moved


def test_membrane_zmode_constant_volume():
    system, forces, _ = _ideal_gas()
    V0 = float(np.prod(np.diag(system.box[0])))
    baro = MonteCarloMembraneBarostat(400.0, 300.0, surface_tension=20.0,
                                      seed=5, zmode="volume")
    areas = []
    for _ in range(400):
        baro.attempt(system, forces)
        areas.append(float(system.box[0][0, 0] * system.box[0][1, 1]))
    V1 = float(np.prod(np.diag(system.box[0])))
    assert abs(V1 - V0) / V0 < 1e-9, (V0, V1)
    assert np.std(areas) > 0  # area fluctuates at constant V


def test_membrane_surface_tension_grows_area():
    """Positive surface tension (-gamma dA work term) drives the membrane
    area up. An ideal gas has no area-restoring force, so this is a
    short-run directional check, not an equilibrium average (with gamma>0
    and no interactions the area grows without bound by construction)."""
    def area_after(gamma, seed, nsteps=300):
        system, forces, _ = _ideal_gas(seed=seed)
        a_start = float(system.box[0][0, 0] * system.box[0][1, 1])
        baro = MonteCarloMembraneBarostat(
            400.0, 300.0, surface_tension=gamma, seed=seed, zmode="volume"
        )
        for _ in range(nsteps):
            baro.attempt(system, forces)
        return float(system.box[0][0, 0] * system.box[0][1, 1]) / a_start

    grown = area_after(200.0, seed=7)
    neutral = area_after(0.0, seed=7)
    assert grown > 1.5, grown           # tension inflates the area fast
    assert 0.3 < neutral < 3.0, neutral  # gamma=0 random-walks gently

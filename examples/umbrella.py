"""Umbrella sampling + WHAM example: the PMF of stretching an LJ dimer.

Run:
    JAX_PLATFORMS=cpu python examples/umbrella.py

Windows restrain the interatomic distance along a ladder of centers; each
window is an independent Forces+Integrator (the bias rides inside the
compiled scan); WHAM stitches the sampled distances into the PMF, which
for a dimer is just the pair potential V(r) (up to the 2 kT ln r Jacobian
over this narrow range) -- so we can check the result analytically.
"""

from __future__ import annotations

import os
import sys

import numpy as np

# the site hook may pre-import jax with the TPU plugin; force CPU
# explicitly when requested (see CLAUDE.md)
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torchmd_tpu.cv import HarmonicBias, distance_cv, wham  # noqa: E402
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield  # noqa: E402
from torchmd_tpu.forces import Forces  # noqa: E402
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann  # noqa: E402
from torchmd_tpu.io import Molecule  # noqa: E402
from torchmd_tpu.parameters import Parameters  # noqa: E402
from torchmd_tpu.systems import System  # noqa: E402
from torchmd_tpu.units import BOLTZMANN  # noqa: E402

T = 120.0
SIGMA, EPS = 3.345, 0.238
K_SPRING = 15.0
CENTERS = np.linspace(3.4, 6.5, 12)


def window(center, seed):
    mol = Molecule()
    mol.numAtoms = 2
    mol.atomtype = np.array(["AR", "AR"], dtype=object)
    mol.charge = np.zeros(2)
    mol.masses = np.full(2, 39.95)
    mol.coords = np.array([[0.0, 0, 0], [center, 0, 0]])[:, :, None]
    ff = YamlForcefield(mol, {
        "atomtypes": ["AR"],
        "lj": {"AR": {"sigma": SIGMA, "epsilon": EPS}},
        "electrostatics": {"AR": {"charge": 0.0}},
        "masses": {"AR": 39.95},
    })
    par = Parameters(ff, mol, ["lj"], precision="double")
    cv = distance_cv(0, 1)
    bias = HarmonicBias(cv, k=K_SPRING, center=float(center))
    forces = Forces(par, terms=["lj"], precision="double", external=bias)
    system = System(2, 1, "double")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=seed))
    integ = Integrator(system, forces, 2.0, gamma=2.0, T=T, seed=seed)
    integ.step(niter=400)  # equilibrate
    samples = []
    for _ in range(150):
        integ.step(niter=10)
        samples.append(
            float(np.linalg.norm(system.pos[0, 0] - system.pos[0, 1]))
        )
    return np.asarray(samples)


def main():
    series = []
    for i, c in enumerate(CENTERS):
        s = window(c, seed=i + 1)
        series.append(s)
        print(f"window r0={c:.2f}: <r> = {s.mean():.3f} "
              f"(std {s.std():.3f}, {len(s)} samples)")

    xb, pmf = wham(series, CENTERS, K_SPRING, kT=BOLTZMANN * T, nbins=40)

    s6 = (SIGMA / xb) ** 6
    v_lj = 4 * EPS * (s6 * s6 - s6)
    v_lj = v_lj - np.nanmin(v_lj)
    print("\n    r      PMF     LJ(analytic)")
    good = ~np.isnan(pmf)
    for x, f, v in zip(xb[good][::4], pmf[good][::4], v_lj[good][::4]):
        print(f"  {x:5.2f}  {f:7.3f}  {v:7.3f}")
    err = np.nanmax(np.abs(pmf[good] - v_lj[good]))
    print(f"\nmax |PMF - V_LJ| = {err:.3f} kcal/mol "
          f"(kT = {BOLTZMANN*T:.3f}; includes the 2kT ln r Jacobian tilt)")


if __name__ == "__main__":
    main()

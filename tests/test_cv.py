"""Collective variables, umbrella biases, and WHAM (beyond-reference):
CV geometry/gradients, bias restraining inside the compiled scan, and PMF
recovery on analytically known ensembles."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from torchmd_tpu.cv import (
    HarmonicBias,
    angle_cv,
    com_distance_cv,
    dihedral_cv,
    distance_cv,
    wham,
)
from torchmd_tpu.units import BOLTZMANN


def test_cv_values_and_gradients():
    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(6, 3) * 5.0)

    d = distance_cv(0, 3)
    assert abs(float(d(pos)) - float(np.linalg.norm(pos[0] - pos[3]))) < 1e-12

    a = angle_cv(0, 1, 2)
    r1 = np.asarray(pos[0] - pos[1])
    r2 = np.asarray(pos[2] - pos[1])
    ref = np.arccos(
        np.dot(r1, r2) / (np.linalg.norm(r1) * np.linalg.norm(r2))
    )
    assert abs(float(a(pos)) - ref) < 1e-10

    # FD gradients of each CV
    for cv in (d, a, dihedral_cv(0, 1, 2, 3),
               com_distance_cv([0, 1], [3, 4, 5])):
        g = jax.grad(lambda p: cv(p))(pos)
        eps = 1e-6
        for (i, k) in [(0, 0), (1, 2), (3, 1)]:
            dp = np.zeros((6, 3))
            dp[i, k] = eps
            fd = (float(cv(pos + dp)) - float(cv(pos - dp))) / (2 * eps)
            assert abs(fd - float(g[i, k])) < 1e-5


def test_com_distance_mass_weighting():
    pos = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0], [10.0, 0, 0]])
    masses = np.array([1.0, 3.0, 1.0])
    cv = com_distance_cv([0, 1], [2], masses=masses)
    # COM of group a = (0*1 + 2*3)/4 = 1.5
    assert abs(float(cv(pos)) - 8.5) < 1e-12


def test_periodic_bias_wrap():
    cvf = dihedral_cv(0, 1, 2, 3)
    bias = HarmonicBias(cvf, k=2.0, center=np.pi - 0.1, periodic=True)
    # a configuration with phi near -pi should see a SMALL wrapped
    # deviation, not ~2*pi
    pos = jnp.asarray(
        [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.5, 0.0, 0.0],
         [1.5, -0.95, -0.3]]
    )
    phi = float(cvf(pos))
    e = float(bias.energy_fn(pos))
    dev = abs(phi - (np.pi - 0.1))
    dev = min(dev, 2 * np.pi - dev)
    assert abs(e - 0.5 * 2.0 * dev**2) < 1e-6


def test_bias_restrains_md():
    """An LJ dimer restrained at r0 = 5 A samples near 5 A even though the
    LJ minimum is at 2^(1/6) sigma ~= 3.8 A."""
    from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.io import Molecule
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.systems import System

    mol = Molecule()
    mol.numAtoms = 2
    mol.atomtype = np.array(["AR", "AR"], dtype=object)
    mol.charge = np.zeros(2)
    mol.masses = np.full(2, 39.95)
    mol.bonds = np.zeros((0, 2), dtype=np.int64)
    mol.coords = np.array([[0.0, 0, 0], [4.0, 0, 0]])[:, :, None]
    ff = YamlForcefield(mol, {
        "atomtypes": ["AR"],
        "lj": {"AR": {"sigma": 3.345, "epsilon": 0.238}},
        "electrostatics": {"AR": {"charge": 0.0}},
        "masses": {"AR": 39.95},
    })
    par = Parameters(ff, mol, ["lj"], precision="double")
    bias = HarmonicBias(distance_cv(0, 1), k=20.0, center=5.0)
    forces = Forces(par, terms=["lj"], precision="double", external=bias)
    system = System(2, 1, "double")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=0))
    integ = Integrator(system, forces, 2.0, gamma=2.0, T=120.0, seed=1)
    integ.step(niter=300)
    dists = []
    for _ in range(30):
        integ.step(niter=20)
        dists.append(float(np.linalg.norm(system.pos[0, 0] - system.pos[0, 1])))
    mean_d = np.mean(dists)
    assert 4.4 < mean_d < 5.4, mean_d  # restrained, not at the LJ minimum


def test_wham_recovers_harmonic_pmf():
    """Analytic umbrella sampling of V(x) = 0.5 a x^2: window samples are
    exact Gaussians of the combined potential; WHAM must recover the
    quadratic PMF."""
    kT = BOLTZMANN * 300.0
    a = 2.0   # kcal/mol/A^2 underlying PMF curvature
    k = 8.0   # umbrella spring
    centers = np.linspace(-2.0, 2.0, 9)
    rs = np.random.RandomState(0)
    series = []
    for c in centers:
        # combined potential: 0.5 a x^2 + 0.5 k (x-c)^2 -> Gaussian with
        # mean k c/(a+k), var kT/(a+k)
        mean = k * c / (a + k)
        std = np.sqrt(kT / (a + k))
        series.append(mean + std * rs.randn(40000))
    xb, pmf = wham(series, centers, k, kT=kT, nbins=50)
    good = ~np.isnan(pmf) & (np.abs(xb) < 1.5)
    ref = 0.5 * a * xb**2
    ref = ref - ref[good].min()
    err = np.max(np.abs(pmf[good] - ref[good]))
    assert err < 0.08, err  # kT/3-ish statistical + binning error


def test_wham_periodic_dihedral():
    """Periodic WHAM on a cosine PMF V(phi) = b (1 - cos phi): windows
    spanning the full circle; recovered PMF matches to binning error."""
    kT = BOLTZMANN * 300.0
    b = 1.2
    k = 15.0
    centers = np.linspace(-np.pi, np.pi, 13)[:-1]
    rs = np.random.RandomState(1)

    def sample_window(c, n=30000):
        # Metropolis sampling of 0.5 k dphi^2 + b(1 - cos phi)
        x = c
        out = np.empty(n)
        for i in range(n):
            xn = x + 0.35 * rs.randn()
            xn = (xn + np.pi) % (2 * np.pi) - np.pi
            d = xn - c
            d -= 2 * np.pi * np.round(d / (2 * np.pi))
            d0 = x - c
            d0 -= 2 * np.pi * np.round(d0 / (2 * np.pi))
            du = (0.5 * k * d**2 + b * (1 - np.cos(xn))) - (
                0.5 * k * d0**2 + b * (1 - np.cos(x))
            )
            if du <= 0 or rs.rand() < np.exp(-du / kT):
                x = xn
            out[i] = x
        return out

    series = [sample_window(c) for c in centers]
    xb, pmf = wham(series, centers, k, kT=kT, nbins=48, periodic=True)
    ref = b * (1 - np.cos(xb))
    good = ~np.isnan(pmf)
    ref = ref - ref[good].min()
    err = np.max(np.abs(pmf[good] - ref[good]))
    assert err < 0.2, err

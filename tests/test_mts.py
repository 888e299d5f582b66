"""r-RESPA multiple-timestep integrator tests.

Validation: (1) mts=1 reproduces the standard velocity-Verlet scan
bit-for-bit (the impulse splitting is algebraically identical at n=1),
(2) with stiff bonds the inner substeps rescue an outer timestep that
plain VV cannot integrate (NVE drift comparison), (3) Langevin + MTS
thermostats to the target temperature.
"""

import numpy as np
import pytest

from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.forces import Forces
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
from torchmd_tpu.io import Molecule
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System


def stiff_dimer_gas(ndimers=4, spacing=6.0):
    """Stiff heteronuclear dimers (an H-like light atom on a k=450 bond)
    in an LJ gas: the classic fast/slow split testbed."""
    n = 2 * ndimers
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["X", "HX"] * ndimers, dtype=object)
    mol.charge = np.zeros(n)
    mol.masses = np.array([16.0, 1.008] * ndimers)
    mol.bonds = np.array([[2 * i, 2 * i + 1] for i in range(ndimers)])
    coords = []
    for i in range(ndimers):
        base = np.array([spacing * i, 0.4 * i, 0.2 * i])
        coords.append(base)
        coords.append(base + np.array([0.97, 0.0, 0.0]))
    mol.coords = np.asarray(coords)[:, :, None]
    ff = YamlForcefield(mol, {
        "atomtypes": ["X", "HX"],
        "bonds": {"(X, HX)": {"k0": 450.0, "req": 0.97}},
        "lj": {
            "X": {"sigma": 3.2, "epsilon": 0.15},
            "HX": {"sigma": 1.0, "epsilon": 0.0},
        },
        "electrostatics": {"X": {"charge": 0.0}, "HX": {"charge": 0.0}},
        "masses": {"X": 16.0, "HX": 1.008},
    })
    par = Parameters(ff, mol, ["bonds", "lj"], precision="double")
    return mol, par


def run_traj(mol, par, timestep, nsteps, mts=None, gamma=None, T=None,
             seed=5):
    forces = Forces(par, terms=["bonds", "lj"], precision="double")
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_velocities(maxwell_boltzmann(par.masses, 200.0, 1, seed=seed))
    integ = Integrator(syst, forces, timestep=timestep, gamma=gamma, T=T,
                       seed=seed, mts=mts)
    etots = []
    for _ in range(nsteps // 10):
        ekin, epot, temp = integ.step(niter=10)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    return np.asarray(syst.pos)[0], np.asarray(syst.vel)[0], etots, temp


def test_mts1_matches_standard_nve():
    mol, par = stiff_dimer_gas()
    pos_a, vel_a, e_a, _ = run_traj(mol, par, 0.5, 40, mts=None)
    pos_b, vel_b, e_b, _ = run_traj(mol, par, 0.5, 40, mts=1)
    assert np.allclose(pos_a, pos_b, atol=1e-12)
    assert np.allclose(vel_a, vel_b, atol=1e-12)
    assert np.allclose(e_a, e_b, atol=1e-9)


def test_mts1_matches_standard_langevin():
    """Same PRNG stream, same kick ordering at n=1: identical dynamics."""
    mol, par = stiff_dimer_gas()
    pos_a, vel_a, _, _ = run_traj(mol, par, 0.5, 40, mts=None, gamma=1.0,
                                  T=300.0)
    pos_b, vel_b, _, _ = run_traj(mol, par, 0.5, 40, mts=1, gamma=1.0,
                                  T=300.0)
    assert np.allclose(pos_a, pos_b, atol=1e-12)
    assert np.allclose(vel_a, vel_b, atol=1e-12)


def test_mts_rescues_large_outer_step():
    """2.5 fs is far beyond the ~1 fs stability limit of a k=450 X-H bond
    under plain VV; with 5 inner bonded substeps (0.5 fs) the same outer
    step conserves energy."""
    mol, par = stiff_dimer_gas()
    _, _, e_plain, _ = run_traj(mol, par, 2.5, 120, mts=None)
    _, _, e_mts, _ = run_traj(mol, par, 2.5, 120, mts=5)
    drift_plain = abs(e_plain[-1] - e_plain[0])
    drift_mts = abs(e_mts[-1] - e_mts[0])
    assert np.isfinite(e_mts[-1])
    assert drift_mts < 0.5, (drift_mts, e_mts)
    assert (not np.isfinite(e_plain[-1])) or drift_plain > 10 * drift_mts, (
        drift_plain, drift_mts
    )


def test_mts_langevin_thermostats():
    mol, par = stiff_dimer_gas()
    _, _, _, temp = run_traj(mol, par, 2.0, 400, mts=4, gamma=2.0, T=300.0)
    t = float(np.asarray(temp).reshape(-1)[0])
    assert 100.0 < t < 700.0  # small system: loose band around target


def test_mts_with_settle_water():
    """MTS + SETTLE: rigid waters at a 4 fs outer step with 2 bonded
    substeps stay finite and conserve reasonably under NVE."""
    from torchmd_tpu.forcefields import ForceField

    import os

    from conftest import SYSTEMS_DIR

    d = os.path.join(SYSTEMS_DIR, "water")
    mol = Molecule(os.path.join(d, "structure.psf"))
    mol.read(os.path.join(d, "structure.pdb"))
    ff = ForceField.create(
        mol, os.path.join(d, "water_forcefield.yaml")
    )
    terms = ["bonds", "angles", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=7.3,
                    rfa=True, switch_dist=6.0)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=7))
    integ = Integrator(syst, forces, timestep=4.0, seed=7,
                       constraints="settle", mts=2)
    etots = []
    for _ in range(6):
        ekin, epot, _ = integ.step(niter=10)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    assert np.isfinite(etots[-1])
    assert abs(etots[-1] - etots[0]) < 10.0, etots


def run_traj_nhc(mol, par, timestep, nsteps, mts=None, thermostat="nhc",
                 seed=5):
    forces = Forces(par, terms=["bonds", "lj"], precision="double")
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_velocities(maxwell_boltzmann(par.masses, 200.0, 1, seed=seed))
    integ = Integrator(syst, forces, timestep=timestep, T=300.0,
                       thermostat=thermostat, seed=seed, mts=mts)
    temp = None
    for _ in range(nsteps // 10):
        _, _, temp = integ.step(niter=10)
    return np.asarray(syst.pos)[0], np.asarray(syst.vel)[0], temp


def test_mts1_matches_standard_nhc():
    """XO-RESPA chain bracketing reduces to the plain NHC scan at n=1:
    same ordering, same (key-free) chain updates -> identical dynamics."""
    mol, par = stiff_dimer_gas()
    pos_a, vel_a, _ = run_traj_nhc(mol, par, 0.5, 40, mts=None)
    pos_b, vel_b, _ = run_traj_nhc(mol, par, 0.5, 40, mts=1)
    assert np.allclose(pos_a, pos_b, atol=1e-12)
    assert np.allclose(vel_a, vel_b, atol=1e-12)


def test_mts1_matches_standard_csvr():
    """Stochastic CSVR draws the same per-outer-step key sequence at n=1."""
    mol, par = stiff_dimer_gas()
    pos_a, vel_a, _ = run_traj_nhc(mol, par, 0.5, 40, mts=None,
                                   thermostat="csvr")
    pos_b, vel_b, _ = run_traj_nhc(mol, par, 0.5, 40, mts=1,
                                   thermostat="csvr")
    assert np.allclose(pos_a, pos_b, atol=1e-12)
    assert np.allclose(vel_a, vel_b, atol=1e-12)


def test_mts_nhc_controls_temperature():
    mol, par = stiff_dimer_gas()
    _, _, temp = run_traj_nhc(mol, par, 2.0, 400, mts=4)
    t = float(np.asarray(temp).reshape(-1)[0])
    assert 100.0 < t < 700.0  # small system: loose band around target


def periodic_dimer_gas(nside=4, spacing=7.0):
    """Stiff dimers on a periodic grid: fast/slow testbed for the
    neighbor-kernel r-RESPA path (box large enough for rc-wide cells)."""
    ndimers = nside ** 3
    n = 2 * ndimers
    mol = Molecule()
    mol.numAtoms = n
    mol.atomtype = np.array(["X", "HX"] * ndimers, dtype=object)
    mol.charge = np.zeros(n)
    mol.masses = np.array([16.0, 1.008] * ndimers)
    mol.bonds = np.array([[2 * i, 2 * i + 1] for i in range(ndimers)])
    coords = []
    for ix in range(nside):
        for iy in range(nside):
            for iz in range(nside):
                base = np.array([ix, iy, iz]) * spacing + 1.0
                coords.append(base)
                coords.append(base + np.array([0.97, 0.0, 0.0]))
    mol.coords = np.asarray(coords)[:, :, None]
    mol.box = np.full((3, 1), nside * spacing)
    ff = YamlForcefield(mol, {
        "atomtypes": ["X", "HX"],
        "bonds": {"(X, HX)": {"k0": 450.0, "req": 0.97}},
        "lj": {
            "X": {"sigma": 3.2, "epsilon": 0.15},
            "HX": {"sigma": 1.0, "epsilon": 0.0},
        },
        "electrostatics": {"X": {"charge": 0.0}, "HX": {"charge": 0.0}},
        "masses": {"X": 16.0, "HX": 1.008},
    })
    par = Parameters(ff, mol, ["bonds", "lj"], precision="double")
    return mol, par


def run_traj_kernel(mol, par, timestep, nsteps, kernel, mts=None,
                    gamma=None, T=None, seed=5, cutoff=6.5):
    forces = Forces(par, terms=["bonds", "lj"], precision="double",
                    cutoff=cutoff, kernel=kernel)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 200.0, 1, seed=seed))
    integ = Integrator(syst, forces, timestep=timestep, gamma=gamma, T=T,
                       seed=seed, mts=mts)
    etots = []
    temp = None
    for _ in range(nsteps // 10):
        ekin, epot, temp = integ.step(niter=10)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    return np.asarray(syst.pos)[0], np.asarray(syst.vel)[0], etots, temp


def test_mts1_cell_matches_cell_standard():
    """On the cell-kernel path, mts=1 reduces to the standard cell scan
    (identical kick ordering, same rebuild cadence)."""
    mol, par = periodic_dimer_gas()
    pos_a, vel_a, e_a, _ = run_traj_kernel(mol, par, 0.5, 40, "cell")
    pos_b, vel_b, e_b, _ = run_traj_kernel(mol, par, 0.5, 40, "cell", mts=1)
    assert np.allclose(pos_a, pos_b, atol=1e-12)
    assert np.allclose(vel_a, vel_b, atol=1e-12)
    assert np.allclose(e_a, e_b, atol=1e-9)


@pytest.mark.parametrize("kernel", ["cell", "verlet"])
def test_mts_kernel_matches_dense_mts(kernel):
    """The same r-RESPA trajectory through the neighbor kernels and the
    dense path (cutoff pair sets are identical; float op order differs)."""
    mol, par = periodic_dimer_gas()
    pos_d, vel_d, _, _ = run_traj_kernel(mol, par, 2.0, 30, "dense", mts=3)
    pos_k, vel_k, _, _ = run_traj_kernel(mol, par, 2.0, 30, kernel, mts=3)
    np.testing.assert_allclose(pos_k, pos_d, atol=1e-6)
    np.testing.assert_allclose(vel_k, vel_d, atol=1e-6)


def test_mts_cell_rescues_large_outer_step():
    """The neighbor-kernel r-RESPA path shows the same stability rescue
    as the dense path: 2.5 fs outer + 5 bonded substeps conserves where
    plain VV at 2.5 fs blows up."""
    mol, par = periodic_dimer_gas()
    _, _, e_plain, _ = run_traj_kernel(mol, par, 2.5, 120, "cell")
    _, _, e_mts, _ = run_traj_kernel(mol, par, 2.5, 120, "cell", mts=5)
    drift_plain = abs(e_plain[-1] - e_plain[0])
    drift_mts = abs(e_mts[-1] - e_mts[0])
    assert np.isfinite(e_mts[-1])
    assert drift_mts < 0.5, (drift_mts, e_mts)
    assert (not np.isfinite(e_plain[-1])) or drift_plain > 10 * drift_mts, (
        drift_plain, drift_mts
    )


def test_mts_cell_langevin_matches_dense():
    """Same PRNG stream on both paths: inner-substep Langevin kicks draw
    the identical key sequence through the kernel scan."""
    mol, par = periodic_dimer_gas()
    pos_d, vel_d, _, _ = run_traj_kernel(mol, par, 2.0, 30, "dense", mts=2,
                                         gamma=1.0, T=300.0)
    pos_c, vel_c, _, _ = run_traj_kernel(mol, par, 2.0, 30, "cell", mts=2,
                                         gamma=1.0, T=300.0)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-6)
    np.testing.assert_allclose(vel_c, vel_d, atol=1e-6)


def test_mts_cell_ewald():
    """mts + kernel='cell' + elec='ewald': the reciprocal/self/exclusion
    terms ride the slow stage; trajectory matches the dense+ewald r-RESPA
    path."""
    mol, par = periodic_dimer_gas()
    # give the dimers charges so the Ewald terms are nonzero
    q = np.tile([0.4, -0.4], mol.numAtoms // 2)
    par.charges = np.asarray(q, dtype=np.float64)

    def run(kernel):
        forces = Forces(par, terms=["bonds", "lj", "electrostatics"],
                        precision="double", cutoff=6.5, kernel=kernel,
                        elec="ewald")
        syst = System(mol.numAtoms, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 200.0, 1, seed=5)
        )
        integ = Integrator(syst, forces, timestep=2.0, seed=5, mts=2)
        for _ in range(2):
            integ.step(niter=10)
        return np.asarray(syst.pos)[0]

    np.testing.assert_allclose(run("cell"), run("dense"), atol=1e-6)


def _charged_dimer_run(kernel="cell", mts=None, mts_recip=None, nsteps=20,
                       niter=10, timestep=1.0, barostat=None):
    """Charged periodic dimer gas + Ewald on a neighbor kernel: the
    testbed for the reciprocal-outer (three-tier) r-RESPA path."""
    mol, par = periodic_dimer_gas()
    q = np.tile([0.4, -0.4], mol.numAtoms // 2)
    par.charges = np.asarray(q, dtype=np.float64)
    forces = Forces(par, terms=["bonds", "lj", "electrostatics"],
                    precision="double", cutoff=6.5, kernel=kernel,
                    elec="ewald")
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 200.0, 1, seed=5))
    integ = Integrator(syst, forces, timestep=timestep, seed=5, mts=mts,
                       mts_recip=mts_recip, barostat=barostat)
    etots = []
    for _ in range(nsteps // niter):
        ekin, epot, _ = integ.step(niter=niter)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    return np.asarray(syst.pos)[0], np.asarray(syst.vel)[0], etots


def test_mts_recip1_is_noop():
    """mts_recip=1 disables the tier: bit-identical to the plain path."""
    pos_a, vel_a, e_a = _charged_dimer_run(mts_recip=None)
    pos_b, vel_b, e_b = _charged_dimer_run(mts_recip=1)
    assert np.allclose(pos_a, pos_b, atol=1e-14)
    assert np.allclose(vel_a, vel_b, atol=1e-14)
    assert np.allclose(e_a, e_b, atol=1e-12)


def test_mts_recip_tracks_and_conserves():
    """Reciprocal term on a 2x outer impulse: the trajectory tracks the
    every-step reference closely over a short horizon (the deferred term
    is small and smooth) and NVE total energy stays conserved."""
    pos_a, vel_a, e_a = _charged_dimer_run(nsteps=40)
    pos_b, vel_b, e_b = _charged_dimer_run(nsteps=40, mts_recip=2)
    # short-horizon trajectory agreement (same dynamics, O(R^2 dt^2)
    # splitting difference in the smooth reciprocal tier)
    np.testing.assert_allclose(pos_b, pos_a, atol=5e-3)
    drift_a = abs(e_a[-1] - e_a[0])
    drift_b = abs(e_b[-1] - e_b[0])
    assert np.isfinite(e_b[-1])
    assert drift_b < max(5 * drift_a, 0.05), (drift_a, drift_b, e_b)


def test_mts_recip_composes_with_inner_tiers():
    """Full three-tier split (bonded substeps + per-step real space +
    deferred reciprocal) integrates the stiff-bond system stably at an
    outer step plain VV cannot hold."""
    pos, vel, e = _charged_dimer_run(mts=5, mts_recip=2, timestep=2.5,
                                     nsteps=120)
    assert np.isfinite(e[-1])
    assert abs(e[-1] - e[0]) < 0.5, e


def test_mts_recip_rejections():
    """Guard rails: dense path, missing Ewald, chunk length not closing
    a reciprocal cycle."""
    mol, par = periodic_dimer_gas()
    q = np.tile([0.4, -0.4], mol.numAtoms // 2)
    par.charges = np.asarray(q, dtype=np.float64)

    def make(kernel, elec, mts_recip):
        kw = {"elec": elec} if elec else {}
        forces = Forces(par, terms=["bonds", "lj", "electrostatics"],
                        precision="double", cutoff=6.5, kernel=kernel,
                        **kw)
        syst = System(mol.numAtoms, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 200.0, 1, seed=5))
        return Integrator(syst, forces, timestep=1.0, seed=5,
                          mts_recip=mts_recip)

    with pytest.raises(NotImplementedError, match="neighbor-kernel"):
        make("dense", "ewald", 2)
    with pytest.raises(ValueError, match="Ewald"):
        make("cell", None, 2)
    integ = make("cell", "ewald", 3)
    with pytest.raises(ValueError, match="full reciprocal cycles"):
        integ.step(niter=10)
    integ.step(niter=9)  # multiples trace + run fine


def test_mts_recip_with_settle_vsites(tmp_path):
    """The production combination (TIP4P vsites + SETTLE + Ewald +
    reciprocal-outer r-RESPA): bounded NVE drift, sites stay snapped."""
    import jax.numpy as jnp

    from test_gromacs import TIP4P2005_TOP, tip4p_water, write

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.vsites import apply_vsites

    top = write(tmp_path / "tip4p64.top",
                TIP4P2005_TOP.replace("SOL 2", "SOL 64"))
    mol = Molecule(top)
    pts = []
    for ix in range(4):
        for iy in range(4):
            for iz in range(4):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 5.2 + 1.2))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 20.8)  # >= 3 cells of rc = cutoff + skin
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    kernel="cell", elec="ewald")

    def run(mts_recip):
        syst = System(mol.numAtoms, 1, "double")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(
            maxwell_boltzmann(par.masses, 150.0, 1, seed=11))
        integ = Integrator(syst, forces, timestep=2.0, seed=11,
                           constraints="settle", mts_recip=mts_recip)
        etots = []
        for _ in range(8):
            ekin, epot, _ = integ.step(niter=20)
            etots.append(float(np.asarray(ekin).reshape(-1)[0])
                         + float(np.asarray(epot).reshape(-1)[0]))
        return syst, etots

    # the short-cutoff testbed itself drifts (LJ truncation noise as the
    # lattice melts); the recip tier must TRACK the every-step reference,
    # not beat its floor
    _, e_ref = run(None)
    syst, etots = run(2)
    assert np.isfinite(etots[-1])
    assert abs(etots[-1] - e_ref[-1]) < 0.5, (etots, e_ref)
    out = np.asarray(syst.pos)[0]
    snapped = np.asarray(
        apply_vsites(par.vsites, jnp.asarray(out), jnp.asarray([20.8] * 3))
    )
    site_rows = np.arange(3, out.shape[0], 4)
    np.testing.assert_allclose(out[site_rows], snapped[site_rows],
                               atol=1e-9)


def test_mts_with_virtual_sites(tmp_path):
    """MTS + TIP4P virtual sites + SETTLE: the fast/slow evaluators each
    vjp-spread their own site forces; NVE total energy stays bounded
    and the carried site rows re-snap every outer step."""
    import jax.numpy as jnp

    from test_gromacs import TIP4P2005_TOP, tip4p_water, write

    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.vsites import apply_vsites

    top = write(tmp_path / "tip4p8.top",
                TIP4P2005_TOP.replace("SOL 2", "SOL 8"))
    mol = Molecule(top)
    pts = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                pts.append(tip4p_water(np.array([ix, iy, iz]) * 5.2 + 1.2))
    mol.coords = np.concatenate(pts)[:, :, None]
    mol.box = np.full((3, 1), 10.4)
    ff = ForceField.create(mol, top)
    terms = ["bonds", "lj", "electrostatics"]
    par = Parameters(ff, mol, terms, precision="double")
    forces = Forces(par, terms=terms, precision="double", cutoff=4.5,
                    switch_dist=3.5, rfa=True)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 150.0, 1, seed=11))
    integ = Integrator(syst, forces, timestep=2.0, seed=11,
                       constraints="settle", mts=2)
    etots = []
    for _ in range(8):
        ekin, epot, _ = integ.step(niter=20)
        etots.append(float(np.asarray(ekin).reshape(-1)[0])
                     + float(np.asarray(epot).reshape(-1)[0]))
    drift = abs(etots[-1] - etots[0])
    assert np.isfinite(etots[-1]) and drift < 0.5, (drift, etots)
    out = np.asarray(syst.pos)[0]
    snapped = np.asarray(
        apply_vsites(par.vsites, jnp.asarray(out), jnp.asarray([10.4] * 3))
    )
    site_rows = np.arange(3, out.shape[0], 4)
    np.testing.assert_allclose(out[site_rows], snapped[site_rows],
                               atol=1e-9)

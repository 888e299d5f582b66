"""MTK extended-system barostat: true NPT dynamics in the compiled scan.

New capability vs the reference (NVE/Langevin-NVT only, SURVEY.md §2.5) and
vs the host-level MC barostats: the box is part of the scan carry and
evolves continuously under the Martyna-Tobias-Klein equations of motion.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forces import Forces
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.systems import System
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
from torchmd_tpu.barostat import MTKBarostat
from torchmd_tpu.observables import ideal_gas_pressure


def _argon_npt(nrep=1, seed=2, T=120.0):
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0)
    system = System(mol.numAtoms, nrep, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([[77.395] * 3] * nrep).T)
    system.set_velocities(maxwell_boltzmann(par.masses, T, nrep, seed=seed))
    forces.compute(system.pos, system.box, system.forces)
    return mol, par, forces, system


def test_mtk_conserved_quantity_near_equilibrium():
    """With P_ext at the gas's natural pressure, the MTK conserved quantity
    H = K + U + thermostat + (P V + W v_eps^2/2 + baro chain) must be flat."""
    mol, par, forces, system = _argon_npt()
    P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(P, 120.0, tau_fs=2000.0))
    hs = []
    for _ in range(4):
        ek, ep, T = integ.step(niter=100)
        hs.append(
            ek[0] + ep[0] + integ.thermostat_energy()[0]
            + integ.npt_energy()[0]
        )
    drift = abs(hs[-1] - hs[0])
    assert drift < 0.2, f"MTK conserved quantity drifted by {drift}"
    # temperature stays controlled
    assert 60.0 < T[0] < 220.0


def test_mtk_volume_responds_to_pressure():
    """High external pressure compresses the dilute argon box; the box
    matrix written back to the System shrinks isotropically."""
    mol, par, forces, system = _argon_npt()
    V0 = float(np.prod(system.box_diag[0]))
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(200.0, 120.0, tau_fs=500.0))
    integ.step(niter=200)
    b = system.box_diag[0]
    V1 = float(np.prod(b))
    assert V1 < 0.8 * V0
    np.testing.assert_allclose(b / b[0], 1.0, rtol=1e-10)  # isotropic


def test_mtk_expands_under_negative_pressure():
    mol, par, forces, system = _argon_npt()
    V0 = float(np.prod(system.box_diag[0]))
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(-50.0, 120.0, tau_fs=500.0))
    integ.step(niter=150)
    assert float(np.prod(system.box_diag[0])) > V0


def test_mtk_replicas_and_csvr():
    """Replica boxes evolve independently; CSVR thermostat composes."""
    mol, par, forces, system = _argon_npt(nrep=2, seed=5)
    P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="csvr",
                       barostat=MTKBarostat(P, 120.0))
    ek, ep, T = integ.step(niter=50)
    assert ek.shape == (2,) and ep.shape == (2,)
    boxes = system.box_diag
    assert np.all(boxes > 0)
    # both replicas stay near the start volume at equilibrium pressure
    np.testing.assert_allclose(boxes, 77.395, rtol=0.05)


def test_mtk_validation_errors():
    mol, par, forces, system = _argon_npt()
    with pytest.raises(ValueError, match="thermostat"):
        Integrator(system, forces, timestep=2.0, T=120.0, gamma=1.0,
                   barostat=MTKBarostat(1.0, 120.0))
    sys_nobox = System(mol.numAtoms, 1, "double", "cpu")
    sys_nobox.set_positions(mol.coords)
    with pytest.raises(ValueError, match="periodic box"):
        Integrator(sys_nobox, forces, timestep=2.0, T=120.0,
                   thermostat="nhc", barostat=MTKBarostat(1.0, 120.0))


def test_mtk_auto_nhc_thermostat():
    """With no thermostat given (and no Langevin), an NHC chain is created
    automatically at the barostat temperature."""
    mol, par, forces, system = _argon_npt()
    P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
    integ = Integrator(system, forces, timestep=2.0,
                       barostat=MTKBarostat(P, 120.0))
    assert integ._thermostat is not None
    ek, ep, T = integ.step(niter=30)
    assert np.isfinite(ep[0]) and np.isfinite(T[0])


def test_mtk_cli_end_to_end(tmp_path):
    """--pressure + --barostat-mode mtk runs NPT from the CLI; the box in
    the final checkpointed state differs from the start (it's dynamic)."""
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    xsc = tmp_path / "box.xsc"  # the box comes from an extended-system file
    xsc.write_text("# NAMD extended system\n"
                   "0 77.395 0 0 0 77.395 0 0 0 77.395 0 0 0\n")
    cmd = [
        sys.executable, "-m", "torchmd_tpu.run",
        "--topology", os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"),
        "--forcefield",
        os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml"),
        "--forceterms", "LJ", "--cutoff", "9.0",
        "--extended_system", str(xsc),
        "--steps", "60", "--output-period", "20", "--timestep", "2",
        "--temperature", "120", "--thermostat", "nhc",
        "--langevin-temperature", "120",
        "--pressure", "200", "--barostat-mode", "mtk",
        "--log-dir", str(tmp_path),
    ]
    r = subprocess.run(cmd, env=env, capture_output=True, cwd=REPO,
                       timeout=1200)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    mon = np.loadtxt(tmp_path / "monitor_0.csv", delimiter=",", skiprows=1)
    assert mon.shape[0] == 3 and np.all(np.isfinite(mon))


def test_mtk_aniso_axes_relax_independently():
    """Anisotropic mode: under high pressure all axes shrink; a frozen
    axis (scale_axes) never moves."""
    mol, par, forces, system = _argon_npt()
    b0 = system.box_diag[0].copy()
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(200.0, 120.0, tau_fs=500.0,
                                            mode="aniso",
                                            scale_axes=(True, True, False)))
    integ.step(niter=150)
    b = system.box_diag[0]
    assert b[0] < b0[0] and b[1] < b0[1]
    np.testing.assert_allclose(b[2], b0[2], rtol=1e-12)  # frozen
    # aniso axes move independently (not exactly tied)
    assert abs(b[0] - b[1]) > 1e-9


def test_mtk_aniso_conserved():
    mol, par, forces, system = _argon_npt()
    P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(P, 120.0, tau_fs=2000.0,
                                            mode="aniso"))
    hs = []
    for _ in range(3):
        ek, ep, T = integ.step(niter=100)
        hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                  + integ.npt_energy()[0])
    assert abs(hs[-1] - hs[0]) < 0.3, hs


def test_mtk_membrane_tension_grows_area():
    """NPgammaT: the applied tension does +gamma dA work on the system
    (H_ext = P V - gamma A, same convention as the MC membrane barostat),
    so positive gamma stretches the x/y box relative to the gamma=0 run;
    x and y stay tied."""
    def run(gamma):
        mol, par, forces, system = _argon_npt()
        P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
        integ = Integrator(system, forces, timestep=2.0, T=120.0,
                           thermostat="nhc",
                           barostat=MTKBarostat(
                               P, 120.0, tau_fs=500.0, mode="membrane",
                               surface_tension=gamma))
        integ.step(niter=200)
        b = system.box_diag[0]
        np.testing.assert_allclose(b[0], b[1], rtol=1e-10)  # xy tied
        return b

    b_free = run(0.0)
    b_tense = run(200.0)
    assert b_tense[0] > b_free[0]  # applied tension stretches the plane


def test_mtk_checkpoint_resume_bit_exact(tmp_path):
    """Checkpoint mid-run (incl. NHC chains + v_eps + baro chain) and
    resume: the continued trajectory matches an uninterrupted one."""
    from torchmd_tpu.checkpoint import load_checkpoint, save_checkpoint

    def make():
        mol, par, forces, system = _argon_npt()
        P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
        integ = Integrator(system, forces, timestep=2.0, T=120.0,
                           thermostat="nhc",
                           barostat=MTKBarostat(P, 120.0, tau_fs=800.0))
        return system, integ

    # straight run: 80 steps
    sys_a, integ_a = make()
    integ_a.step(niter=40)
    integ_a.step(niter=40)

    # interrupted run: 40 steps -> checkpoint -> fresh objects -> 40 more
    sys_b, integ_b = make()
    integ_b.step(niter=40)
    ck = str(tmp_path / "state.npz")
    save_checkpoint(ck, sys_b, integ_b, 40)
    sys_c, integ_c = make()
    it = load_checkpoint(ck, sys_c, integ_c)
    assert it == 40
    integ_c.step(niter=40)

    np.testing.assert_array_equal(sys_c.pos, sys_a.pos)
    np.testing.assert_array_equal(sys_c.vel, sys_a.vel)
    np.testing.assert_allclose(sys_c.box, sys_a.box, rtol=0, atol=0)


def test_mtk_virial_matches_finite_difference():
    """The per-axis scaling virial driving the barostat must equal the
    numeric -dU/ds_k of the full potential (all terms, PBC wrap)."""
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.potentials import compute_potentials

    mol, par, forces, system = _argon_npt()
    ffp, cfg = forces.ffparams, forces.config
    pos = jnp.asarray(system.pos[0])
    box = jnp.asarray(system.box_diag[0])

    def etot(p, s):
        pot = compute_potentials(ffp, p * s, box * s, cfg)
        return sum(jax.tree_util.tree_leaves(pot))

    one = jnp.ones((3,))
    vir_ad = -jax.grad(etot, argnums=1)(pos, one)
    h = 1e-6
    for k in range(3):
        sp = np.ones(3); sp[k] += h
        sm = np.ones(3); sm[k] -= h
        fd = -(float(etot(pos, jnp.asarray(sp)))
               - float(etot(pos, jnp.asarray(sm)))) / (2 * h)
        np.testing.assert_allclose(float(vir_ad[k]), fd, rtol=1e-5,
                                   atol=1e-8)


def test_mc_barostat_rejected_by_integrator():
    from torchmd_tpu.barostat import MonteCarloBarostat

    mol, par, forces, system = _argon_npt()
    with pytest.raises(ValueError, match="run-loop"):
        Integrator(system, forces, timestep=2.0, T=120.0,
                   barostat=MonteCarloBarostat(1.0, 120.0))


def test_mtk_with_ewald_reciprocal():
    """MTK + full Ewald: the reciprocal sum is box-dependent, so the
    scaling virial must include it; the NPT run stays finite and the
    conserved quantity bounded on a charged argon gas."""
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    rs = np.random.RandomState(0)
    q = rs.randn(mol.numAtoms) * 0.05
    q -= q.mean()  # neutral
    mol.charge = q
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj", "electrostatics"], precision="double")
    par.charges = mol.charge.copy()
    forces = Forces(par, terms=["lj", "electrostatics"],
                    precision="double", cutoff=9.0, elec="ewald")
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([77.395] * 3))
    system.set_velocities(maxwell_boltzmann(par.masses, 120.0, 1, seed=2))
    forces.compute(system.pos, system.box, system.forces)
    P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395**3)
    integ = Integrator(system, forces, timestep=2.0, T=120.0,
                       thermostat="nhc",
                       barostat=MTKBarostat(P, 120.0, tau_fs=2000.0))
    hs = []
    for _ in range(3):
        ek, ep, T = integ.step(niter=60)
        hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                  + integ.npt_energy()[0])
    assert np.all(np.isfinite(hs))
    assert abs(hs[-1] - hs[0]) < 0.5, hs
    assert np.all(system.box_diag[0] > 0)


def _waterbox_npt(T=300.0, seed=5):
    from common import ALL_TERMS, load_system
    from conftest import DATA_DIR

    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double",
                    cutoff=7.0, switch_dist=6.0, rfa=True)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.full((3, 1), 15.0))   # ~15 A TIP3 cube (structure
    #                                         extents; the PSF has no box)
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=seed))
    forces.compute(system.pos, system.box, system.forces)
    return mol, par, forces, system


def test_mtk_settle_water_npt():
    """MTK + SETTLE rigid water (ROLL-style constraint coupling): true
    NPT with constraints stays on the constraint manifold, keeps the
    conserved quantity bounded, and holds a stable liquid density."""
    from torchmd_tpu.constraints import (
        build_constraint_spec,
        max_constraint_error,
    )

    mol, par, forces, system = _waterbox_npt()
    integ = Integrator(system, forces, timestep=2.0, T=300.0,
                       thermostat="nhc", constraints="settle",
                       barostat=MTKBarostat(1.0, 300.0, tau_fs=1000.0))
    assert integ.constraints is not None and integ.constraints.ncon > 0

    v0 = float(np.prod(np.asarray(system.box_diag)[0]))
    hs = []
    for _ in range(4):
        ek, ep, T = integ.step(niter=50)
        hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                  + integ.npt_energy()[0])
    # constraints hold through the barostat-scaled drift
    cs = build_constraint_spec(par, np.asarray(par.masses), mode="settle")
    pos = np.asarray(system.pos)[0]
    if cs.settle is not None:
        d_oh1 = np.linalg.norm(pos[cs.settle.oidx] - pos[cs.settle.h1],
                               axis=1)
        np.testing.assert_allclose(d_oh1, np.asarray(cs.settle.r_oh),
                                   atol=1e-8)
    # density stayed liquid-like (box neither exploded nor collapsed)
    v1 = float(np.prod(np.asarray(system.box_diag)[0]))
    assert 0.7 * v0 < v1 < 1.4 * v0
    # conserved quantity bounded (single-pass ROLL: looser than the
    # unconstrained MTK tolerance but must not run away)
    drift = abs(hs[-1] - hs[0])
    assert drift < 5.0, f"MTK+SETTLE conserved quantity drifted {drift}"
    assert 150.0 < T[0] < 450.0


def test_mtk_shake_hbonds_npt():
    """MTK + SHAKE hydrogen bonds: same coupling through the SHAKE path."""
    mol, par, forces, system = _waterbox_npt(seed=6)
    integ = Integrator(system, forces, timestep=1.0, T=300.0,
                       thermostat="nhc", constraints="hbonds",
                       barostat=MTKBarostat(1.0, 300.0, tau_fs=1000.0))
    assert integ.constraints is not None
    from torchmd_tpu.constraints import max_constraint_error

    for _ in range(2):
        ek, ep, T = integ.step(niter=50)
    err = float(max_constraint_error(integ.constraints.shake,
                                     np.asarray(system.pos)[0]))
    # default SHAKE iteration count converges to ~1e-5 (same residual as
    # the plain-NVT SHAKE path on this system)
    assert err < 5e-5
    assert np.isfinite(ep).all()


# ----------------------------------------------------------------------
# MTK on the cell / column kernel path (large periodic systems)
# ----------------------------------------------------------------------

def _argon_npt_kernel(kernel, seed=2, T=120.0):
    mol = Molecule(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    ff = ForceField.create(
        mol, os.path.join(SYSTEMS_DIR, "argon", "argon_forcefield.yaml")
    )
    par = Parameters(ff, mol, ["lj"], precision="double")
    forces = Forces(par, terms=["lj"], precision="double", cutoff=9.0,
                    kernel=kernel)
    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    system.set_box(np.asarray([[77.395] * 3]).T)
    system.set_velocities(maxwell_boltzmann(par.masses, T, 1, seed=seed))
    forces.compute(system.pos, system.box, system.forces)
    return mol, par, forces, system


def _dimer_npt(kernel, mts=None, timestep=2.0, nchunks=2, niter=20,
               seed=5, tau_fs=2000.0):
    """Periodic stiff-dimer gas under MTK NPT (bonds = fast stage)."""
    from test_mts import periodic_dimer_gas

    mol, par = periodic_dimer_gas()
    forces = Forces(par, terms=["bonds", "lj"], precision="double",
                    cutoff=6.5, kernel=kernel)
    syst = System(mol.numAtoms, 1, "double")
    syst.set_positions(mol.coords)
    syst.set_box(mol.box)
    syst.set_velocities(maxwell_boltzmann(par.masses, 200.0, 1, seed=seed))
    forces.compute(syst.pos, syst.box, syst.forces)
    L = float(mol.box[0, 0])
    P = ideal_gas_pressure(mol.numAtoms, 200.0, L ** 3)
    integ = Integrator(syst, forces, timestep=timestep, T=200.0,
                       thermostat="nhc", seed=seed, mts=mts,
                       barostat=MTKBarostat(P, 200.0, tau_fs=tau_fs))
    hs = []
    for _ in range(nchunks):
        ek, ep, _T = integ.step(niter=niter)
        hs.append(ek[0] + ep[0] + integ.thermostat_energy()[0]
                  + integ.npt_energy()[0])
    return (syst.pos.copy(), syst.box_diag.copy(), hs,
            getattr(integ, "_cell_kernel", None))


def test_mtk_mts1_converges_to_standard():
    """The r-RESPA MTK composition at n=1 is the same reversible
    splitting as the standard MTK scan up to an O(dt^3) rearrangement of
    the slow-kick decay factors: at a small timestep short trajectories
    must agree tightly."""
    pos_a, box_a, hs_a, _ = _dimer_npt("dense", mts=None, timestep=0.5)
    pos_b, box_b, hs_b, _ = _dimer_npt("dense", mts=1, timestep=0.5)
    np.testing.assert_allclose(box_b, box_a, rtol=1e-8)
    np.testing.assert_allclose(pos_b, pos_a, atol=1e-5)
    np.testing.assert_allclose(hs_b, hs_a, atol=1e-4)


def test_mtk_mts_conserved_and_stable():
    """MTS+MTK at a 2.5 fs outer step (beyond the stiff bond's plain-VV
    stability limit) with 5 bonded substeps: the NPT conserved quantity
    stays bounded and the box stays finite/liquid-like."""
    pos, box, hs, _ = _dimer_npt("dense", mts=5, timestep=2.5,
                                 nchunks=4, niter=30)
    assert np.all(np.isfinite(pos))
    drift = abs(hs[-1] - hs[0])
    assert drift < 1.0, (drift, hs)
    v_rel = float(np.prod(box[0])) / 28.0 ** 3
    assert 0.3 < v_rel < 3.0


def test_mtk_mts_cell_matches_dense():
    """The cell-kernel r-RESPA NPT scan (analytic pair virial + cheap AD)
    drives the same trajectory as the dense r-RESPA NPT scan."""
    pos_d, box_d, hs_d, k_d = _dimer_npt("dense", mts=3)
    pos_c, box_c, hs_c, k_c = _dimer_npt("cell", mts=3)
    assert k_d is None and k_c is not None
    np.testing.assert_allclose(box_c, box_d, rtol=1e-9)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-6)
    np.testing.assert_allclose(hs_c, hs_d, atol=1e-6)


def test_mtk_cell_matches_dense():
    """True NPT on the cell-kernel path: the per-axis pair virial
    accumulated by the neighbor kernel + value_and_grad of the cheap
    terms must reproduce the dense scan's E(s*pos, s*box) virial —
    trajectories, boxes and the conserved quantity all match to f64
    round-off."""
    def run(kernel):
        mol, par, forces, system = _argon_npt_kernel(kernel)
        P = ideal_gas_pressure(mol.numAtoms, 120.0, 77.395 ** 3)
        integ = Integrator(system, forces, timestep=2.0, T=120.0,
                           thermostat="nhc",
                           barostat=MTKBarostat(P, 120.0, tau_fs=2000.0))
        for _ in range(2):
            ek, ep, T = integ.step(niter=25)
        h = (ek[0] + ep[0] + integ.thermostat_energy()[0]
             + integ.npt_energy()[0])
        return (system.pos.copy(), system.box_diag.copy(), ep[0], h,
                getattr(integ, "_cell_kernel", None))

    pos_d, box_d, ep_d, h_d, k_d = run("auto")    # argon is small: dense
    pos_c, box_c, ep_c, h_c, k_c = run("cell")
    assert k_d is None and k_c is not None
    np.testing.assert_allclose(box_c, box_d, rtol=1e-10)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-8)
    np.testing.assert_allclose(ep_c, ep_d, atol=1e-8)
    np.testing.assert_allclose(h_c, h_d, atol=1e-8)


def test_mtk_column_matches_cell():
    """The z-sorted column kernel's in-kernel virial accumulator (the TPU
    large-N default) drives the same NPT trajectory as the ghost-cell
    kernel (f32, interpret mode)."""
    from test_columns import _lj_gas
    from torchmd_tpu.columns import ColumnKernel

    mol, par, _f, L = _lj_gas(natoms=1500, L=60.0)
    vel = maxwell_boltzmann(par.masses, 120.0, 1, seed=3)
    P = ideal_gas_pressure(mol.numAtoms, 120.0, L ** 3)

    def run(column):
        forces = Forces(par, terms=["lj"], precision="single",
                        cutoff=9.0, kernel="cell")
        system = System(mol.numAtoms, 1, "single")
        system.set_positions(mol.coords)
        system.set_box(np.full(3, L))
        system.set_velocities(vel)
        if column:
            forces._cell_kernel = ColumnKernel(
                forces.ffparams, forces.config, par, np.full(3, L),
                pos0=mol.coords[:, :, 0], interpret=True)
            forces.cell_requested = True
        forces.compute(system.pos, system.box, system.forces)
        integ = Integrator(system, forces, timestep=2.0, T=120.0,
                           thermostat="nhc",
                           barostat=MTKBarostat(P, 120.0, tau_fs=2000.0))
        for _ in range(2):
            ek, ep, T = integ.step(niter=20)
        return system.pos.copy(), system.box_diag.copy(), ep[0]

    pos_c, box_c, ep_c = run(False)
    pos_q, box_q, ep_q = run(True)
    np.testing.assert_allclose(box_q, box_c, rtol=1e-5)
    np.testing.assert_allclose(pos_q, pos_c, atol=5e-3)
    np.testing.assert_allclose(ep_q, ep_c, rtol=1e-4, atol=5e-3)


def test_mtk_cell_settle_water_npt():
    """MTK + SETTLE-ROLL on the cell-kernel path matches the dense NPT
    scan (constrained true NPT for large periodic systems). A 16.5 A box
    at a 3 A cutoff hosts a 3x3x3 cell grid with ~10% shrink headroom
    (at exactly 3*rc any NPT shrink would invalidate the grid mid-run);
    both paths run the identical cutoff, so the equivalence (including
    the constraint-virial ROLL coupling) is exact."""
    from common import ALL_TERMS, load_system
    from conftest import DATA_DIR

    mol, ff, _nb = load_system(os.path.join(DATA_DIR, "waterbox"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")

    def run(kernel):
        forces2 = Forces(par, terms=ALL_TERMS, precision="double",
                         cutoff=3.0, rfa=True, kernel=kernel)
        system = System(mol.numAtoms, 1, "double", "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.full((3, 1), 16.5))
        system.set_velocities(
            maxwell_boltzmann(par.masses, 300.0, 1, seed=5)
        )
        forces2.compute(system.pos, system.box, system.forces)
        integ = Integrator(system, forces2, timestep=2.0, T=300.0,
                           thermostat="nhc", constraints="settle",
                           barostat=MTKBarostat(1.0, 300.0,
                                                tau_fs=1000.0))
        ek, ep, T = integ.step(niter=30)
        return (system.pos.copy(), system.box_diag.copy(), ep[0],
                getattr(integ, "_cell_kernel", None))

    pos_d, box_d, ep_d, k_d = run("auto")
    pos_c, box_c, ep_c, k_c = run("cell")
    assert k_d is None and k_c is not None
    np.testing.assert_allclose(box_c, box_d, rtol=1e-9)
    np.testing.assert_allclose(pos_c, pos_d, atol=1e-7)
    np.testing.assert_allclose(ep_c, ep_d, atol=1e-6)

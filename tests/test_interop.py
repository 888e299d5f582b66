"""Interop surfaces: external (NNP) potentials, frcmod parameters, YAML
force-field export round-trip, npz molecules, ASE calculator."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from common import ALL_TERMS, load_system
from conftest import DATA_DIR, SYSTEMS_DIR

from torchmd_tpu.io import Molecule, npzMolecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.forcefields.ff_yaml import YamlForcefield
from torchmd_tpu.parameters import Parameters, to_yaml_ff
from torchmd_tpu.forces import Forces
from torchmd_tpu.external import JaxExternal


def test_jax_external_in_compute_and_scan():
    """A harmonic restraint as a JAX external: appears in the 'external'
    energy slot, contributes forces, and runs inside the integrator scan."""
    mol, ff, nb = load_system(os.path.join(DATA_DIR, "1water"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")

    k = 0.7

    def restraint(pos, box):
        return k * jnp.sum(pos**2)

    ext = JaxExternal(restraint)
    forces = Forces(par, terms=ALL_TERMS, precision="double", external=ext)
    pos = mol.coords[:, :, 0][None]
    det = forces.compute(pos, None, returnDetails=True)[0]
    expected = k * float(np.sum(pos**2))
    assert abs(det["external"] - expected) < 1e-8

    f = np.asarray(forces.last_forces)[0]
    # external force = -2 k x on top of internal terms
    forces_no_ext = Forces(par, terms=ALL_TERMS, precision="double")
    forces_no_ext.compute(pos, None)
    f0 = np.asarray(forces_no_ext.last_forces)[0]
    np.testing.assert_allclose(f - f0, -2 * k * pos[0], atol=1e-8)

    # and through the scan path
    from torchmd_tpu.integrator import Integrator
    from torchmd_tpu.systems import System

    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    integ = Integrator(system, forces, 0.5, "cpu")
    assert not integ._host_path  # jax external folds into the jit
    Ekin, pot, T = integ.step(niter=3)
    assert np.isfinite(pot).all()


def test_host_external_protocol():
    """Reference-protocol external (calculate() only) uses the host loop."""
    mol, ff, nb = load_system(os.path.join(DATA_DIR, "1water"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")

    class HostExternal:
        def calculate(self, pos, box):
            pos = np.asarray(pos)
            e = 0.1 * (pos**2).sum(axis=(1, 2))
            return e, -0.2 * pos

    forces = Forces(par, terms=ALL_TERMS, precision="double",
                    external=HostExternal())
    pos = mol.coords[:, :, 0][None]
    det = forces.compute(pos, None, returnDetails=True)[0]
    assert abs(det["external"] - 0.1 * float(np.sum(pos**2))) < 1e-8

    from torchmd_tpu.integrator import Integrator
    from torchmd_tpu.systems import System

    system = System(mol.numAtoms, 1, "double", "cpu")
    system.set_positions(mol.coords)
    integ = Integrator(system, forces, 0.5, "cpu")
    assert integ._host_path
    Ekin, pot, T = integ.step(niter=2)
    assert np.isfinite(pot).all()


def test_frcmod_matches_prmtop_parameters():
    """benzamidine-amber ships both a prmtop and the frcmod it was built
    from: assembling bonded parameters through either source must agree."""
    d = os.path.join(DATA_DIR, "benzamidine-amber")
    mol = Molecule(os.path.join(d, "structure.prmtop"))
    mol.read(os.path.join(d, "structure.pdb"))

    ff_top = ForceField.create(mol, os.path.join(d, "structure.prmtop"))
    ff_mod = ForceField.create(mol, os.path.join(d, "mol.frcmod"))

    par_top = Parameters(ff_top, mol, ALL_TERMS, precision="double")
    par_mod = Parameters(ff_mod, mol, ALL_TERMS, precision="double")

    for a, b in (
        (par_top.bond_params, par_mod.bond_params),
        (par_top.angle_params, par_mod.angle_params),
        (par_top.dihedral_params, par_mod.dihedral_params),
        (par_top.improper_params, par_mod.improper_params),
    ):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_allclose(
            np.asarray(a["params"], float), np.asarray(b["params"], float),
            rtol=1e-6, atol=1e-6,
        )
    np.testing.assert_allclose(
        par_top.nonbonded_params["params"],
        par_mod.nonbonded_params["params"], rtol=2e-5,
    )


@pytest.mark.parametrize("name", ["benzamidine", "waterbox"])
def test_yaml_ff_export_roundtrip(name):
    mol, ff, nbconf = load_system(os.path.join(DATA_DIR, name))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double", **nbconf)
    pos = mol.coords[:, :, 0][None]
    box = np.zeros((1, 3, 3))
    np.fill_diagonal(box[0], mol.box[:, 0])
    e_orig = forces.compute(pos, box, returnDetails=True)[0]

    exported = to_yaml_ff(par, mol)
    ff2 = YamlForcefield(mol, exported)
    par2 = Parameters(ff2, mol, ALL_TERMS, precision="double")
    forces2 = Forces(par2, terms=ALL_TERMS, precision="double", **nbconf)
    e_round = forces2.compute(pos, box, returnDetails=True)[0]
    for k, v in e_orig.items():
        assert abs(e_round[k] - v) < 1e-8, (k, v, e_round[k])


def test_npz_molecule(tmp_path):
    f = tmp_path / "mol.npz"
    np.savez(
        f,
        z=np.array([8, 1, 1]),
        coord=np.array([[0.0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]]),
        charges=np.array([-0.8, 0.4, 0.4]),
        bonds=np.array([[0, 1], [0, 2]]),
        box=np.array([20.0, 20.0, 20.0]),
    )
    mol = npzMolecule(str(f))
    assert mol.numAtoms == 3
    assert list(mol.element) == ["O", "H", "H"]
    np.testing.assert_allclose(mol.masses, [15.999, 1.008, 1.008])
    np.testing.assert_array_equal(mol.embedding, [8, 1, 1])
    assert mol.box.shape == (3, 1)


def test_ase_calculator_interface():
    """MyCalc works with a duck-typed atoms object even without ase."""
    from torchmd_tpu.calculators.ase_calc import MyCalc, KCALMOL_TO_EV

    mol, ff, nb = load_system(os.path.join(DATA_DIR, "1water"))
    par = Parameters(ff, mol, ALL_TERMS, precision="double")
    forces = Forces(par, terms=ALL_TERMS, precision="double")

    class FakeAtoms:
        def get_positions(self):
            return mol.coords[:, :, 0]

        def get_cell(self):
            return np.zeros((3, 3))

    calc = MyCalc(forces)
    calc.calculate(FakeAtoms())
    e_kcal = forces.compute(mol.coords[:, :, 0][None], None)[0]
    assert abs(calc.results["energy"] - e_kcal * KCALMOL_TO_EV) < 1e-10
    assert calc.results["forces"].shape == (3, 3)

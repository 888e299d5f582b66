"""torchmd-tpu: a TPU-native molecular dynamics framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
TorchMD (classical + coarse-grained differentiable MD): harmonic bonds and
angles, AMBER/CHARMM torsions, impropers, scaled 1-4, Lennard-Jones with
switching, Coulomb/reaction-field electrostatics, CG repulsion terms,
CHARMM/AMBER/YAML force-field input, velocity-Verlet + Langevin dynamics,
minimizers, PBC wrapping, batched replicas, and pluggable NNPs -- designed
TPU-first: pure-functional state stepped inside jitted `lax.scan`,
gather/segment-sum force accumulation, masked fixed-shape pair math, Pallas
nonbonded kernels, jit-compatible cell lists, and vmap/shard_map
replica/spatial parallelism over device meshes.

Quick start (mirrors the reference's object API):

    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule("structure.prmtop"); mol.read("input.coor")
    ff = ForceField.create(mol, "structure.prmtop")
    par = Parameters(ff, mol, ["bonds","angles","dihedrals","impropers",
                               "1-4","electrostatics","lj"])
    system = System(mol.numAtoms, nreplicas=1)
    system.set_positions(mol.coords); system.set_box(mol.box)
    system.set_velocities(maxwell_boltzmann(par.masses, 300))
    forces = Forces(par, terms=[...], cutoff=9.0, rfa=True)
    integ = Integrator(system, forces, timestep=2.0, gamma=0.1, T=300)
    Ekin, Epot, T = integ.step(niter=100)   # one compiled lax.scan
"""

__version__ = "0.1.0"

__all__ = [
    "io", "forcefields", "parameters", "systems", "forces", "integrator",
    "minimizers", "wrapper", "neighbors", "potentials", "parallel", "train",
    "external", "checkpoint", "profiling", "units", "run",
    # convenience re-exports (lazy)
    "Molecule", "ForceField", "Parameters", "System", "Forces", "Integrator",
    "maxwell_boltzmann", "Wrapper", "make_alchemical", "AlchemicalCoupling",
    "ReplicaExchange", "MetaDynamics", "HarmonicBias", "wham",
    "MTKBarostat", "MonteCarloBarostat", "LambdaDynamics",
    "make_lambda_sites", "ph_bias", "make_drude", "DrudeIntegrator",
    "make_drude_ewald", "view_frame", "make_multipoles",
    "MultipoleEwald", "MultipolePme", "make_amoeba_potential",
    "GromacsForcefield", "apply_vsites", "normal_modes",
    "GBSA", "make_gbsa",
]

_LAZY = {
    "Molecule": ("torchmd_tpu.io", "Molecule"),
    "ForceField": ("torchmd_tpu.forcefields", "ForceField"),
    "Parameters": ("torchmd_tpu.parameters", "Parameters"),
    "System": ("torchmd_tpu.systems", "System"),
    "Forces": ("torchmd_tpu.forces", "Forces"),
    "Integrator": ("torchmd_tpu.integrator", "Integrator"),
    "maxwell_boltzmann": ("torchmd_tpu.integrator", "maxwell_boltzmann"),
    "Wrapper": ("torchmd_tpu.wrapper", "Wrapper"),
    "make_alchemical": ("torchmd_tpu.alchemy", "make_alchemical"),
    "AlchemicalCoupling": ("torchmd_tpu.alchemy", "AlchemicalCoupling"),
    "ReplicaExchange": ("torchmd_tpu.remd", "ReplicaExchange"),
    "MetaDynamics": ("torchmd_tpu.metadynamics", "MetaDynamics"),
    "HarmonicBias": ("torchmd_tpu.cv", "HarmonicBias"),
    "wham": ("torchmd_tpu.cv", "wham"),
    "MTKBarostat": ("torchmd_tpu.barostat", "MTKBarostat"),
    "MonteCarloBarostat": ("torchmd_tpu.barostat", "MonteCarloBarostat"),
    "LambdaDynamics": ("torchmd_tpu.lambda_dynamics", "LambdaDynamics"),
    "make_lambda_sites": ("torchmd_tpu.lambda_dynamics",
                          "make_lambda_sites"),
    "ph_bias": ("torchmd_tpu.lambda_dynamics", "ph_bias"),
    "make_drude": ("torchmd_tpu.drude", "make_drude"),
    "DrudeIntegrator": ("torchmd_tpu.drude", "DrudeIntegrator"),
    "view_frame": ("torchmd_tpu.viz", "view_frame"),
    "make_multipoles": ("torchmd_tpu.multipoles", "make_multipoles"),
    "MultipoleEwald": ("torchmd_tpu.multipole_ewald",
                       "MultipoleEwald"),
    "MultipolePme": ("torchmd_tpu.multipole_ewald", "MultipolePme"),
    "make_amoeba_potential": ("torchmd_tpu.amoeba",
                              "make_amoeba_potential"),
    "make_drude_ewald": ("torchmd_tpu.drude", "make_drude_ewald"),
    "GromacsForcefield": ("torchmd_tpu.forcefields.ff_gromacs",
                          "GromacsForcefield"),
    "apply_vsites": ("torchmd_tpu.vsites", "apply_vsites"),
    "normal_modes": ("torchmd_tpu.analysis", "normal_modes"),
    "GBSA": ("torchmd_tpu.gb", "GBSA"),
    "make_gbsa": ("torchmd_tpu.gb", "make_gbsa"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'torchmd_tpu' has no attribute {name!r}")

"""torchmd-tpu: a TPU-native molecular dynamics framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
TorchMD (classical + coarse-grained differentiable MD): harmonic bonds and
angles, AMBER/CHARMM torsions, impropers, scaled 1-4, Lennard-Jones with
switching, Coulomb/reaction-field electrostatics, CG repulsion terms,
CHARMM/AMBER/YAML force-field input, velocity-Verlet + Langevin dynamics,
minimizers, PBC wrapping, batched replicas, and pluggable NNPs — designed
TPU-first: pure-functional state stepped inside jitted `lax.scan`,
gather/segment-sum force accumulation, masked fixed-shape pair math, Pallas
nonbonded kernels, and vmap/shard_map replica parallelism.
"""

__version__ = "0.1.0"

"""Train a coarse-grained force field by force matching (the TorchMD
paper's headline use case), end to end on the bundled CG protein chain.

Ground truth: the bundled CG force field (tests/systems/cg). We perturb
its bond/angle/repulsion parameters, generate reference forces from the
true model over thermally-jittered conformations, and recover the
parameters with the mesh-shardable ForceMatchingTrainer.

Run:  python examples/train_cg.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

# tiny model: CPU by default (set TMD_PLATFORM=tpu to run on the accelerator)
jax.config.update("jax_platforms", os.environ.get("TMD_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np
import optax

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.forces import Forces
from torchmd_tpu.potentials import total_energy
from torchmd_tpu.train import ForceMatchingTrainer

TERMS = ["bonds", "angles", "repulsioncg"]

cgdir = os.path.join(REPO, "tests", "systems", "cg")
mol = Molecule(os.path.join(cgdir, "cg_structure.psf"))
mol.read(os.path.join(cgdir, "cg_structure.xtc"))
ff = ForceField.create(mol, os.path.join(cgdir, "forcefield.yaml"))
par = Parameters(ff, mol, TERMS, precision="single")
forces = Forces(par, terms=TERMS, precision="single", cutoff=9.0,
                exclusions=("bonds",))
ffp_true, cfg = forces.ffparams, forces.config

# ----------------------------------------------------------------------
# 1. Reference data: thermally-jittered conformations + true forces
# ----------------------------------------------------------------------
rs = np.random.RandomState(0)
B = 64
base = mol.coords[:, :, 0]
pos = jnp.asarray(base[None] + 0.25 * rs.randn(B, *base.shape), jnp.float32)
box = jnp.zeros((B, 3), jnp.float32)
f_ref = -jax.vmap(
    jax.grad(lambda p, b: total_energy(ffp_true, p, b, cfg)), in_axes=(0, 0)
)(pos, box)
e_ref = jax.vmap(lambda p, b: total_energy(ffp_true, p, b, cfg))(pos, box)

# ----------------------------------------------------------------------
# 2. Perturb the trainable parameter tables and train them back
# ----------------------------------------------------------------------
key = jax.random.PRNGKey(1)
ffp_start = ffp_true._replace(
    bonds=ffp_true.bonds._replace(
        params=ffp_true.bonds.params * jnp.asarray([[1.4, 1.05]])
    ),
    angles=ffp_true.angles._replace(
        params=ffp_true.angles.params * jnp.asarray([[0.7, 0.95]])
    ),
    lj_params=ffp_true.lj_params * 1.2,
)

trainer = ForceMatchingTrainer(
    ffp_start, cfg, trainable=("bonds", "angles", "lj"),
    optimizer=optax.adam(2.5e-2), energy_weight=1e-4,
)
state = trainer.init()
for i in range(1500):
    state, loss = trainer.step(state, pos, box, f_ref, e_ref)
    if i % 250 == 0 or i == 1499:
        print(f"step {i:4d}  loss {float(loss):.6f}")

# ----------------------------------------------------------------------
# 3. Compare recovered parameters
# ----------------------------------------------------------------------
learned = trainer.ffparams(state)
req_err = np.abs(
    np.asarray(learned.bonds.params[:, 1] - ffp_true.bonds.params[:, 1])
).max()
print(f"max recovered bond-length error: {req_err:.4f} A")
# force agreement of the learned model on held-out conformations
pos_test = jnp.asarray(base[None] + 0.25 * rs.randn(8, *base.shape), jnp.float32)
box_test = jnp.zeros((8, 3), jnp.float32)
f_true = -jax.vmap(jax.grad(lambda p, b: total_energy(ffp_true, p, b, cfg)),
                   in_axes=(0, 0))(pos_test, box_test)
f_fit = -jax.vmap(jax.grad(lambda p, b: total_energy(learned, p, b, cfg)),
                  in_axes=(0, 0))(pos_test, box_test)
rmse = float(jnp.sqrt(jnp.mean((f_fit - f_true) ** 2)))
print(f"held-out force RMSE: {rmse:.3f} kcal/mol/A")

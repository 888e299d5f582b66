"""torchmd-tpu tutorial: the API mirrors upstream TorchMD, the execution
model is TPU-native (everything compiles into jitted scans).

Run:  python examples/tutorial.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ----------------------------------------------------------------------
# 1. Load a molecule (self-contained readers: PSF/PDB/PRMTOP/XTC/...)
# ----------------------------------------------------------------------
from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.forces import Forces
from torchmd_tpu.systems import System
from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

data = os.path.join(REPO, "tests", "data", "prod_alanine_dipeptide_amber")
mol = Molecule(os.path.join(data, "structure.prmtop"))
mol.read(os.path.join(data, "input.coor"))
mol.read(os.path.join(data, "input.xsc"))  # box

# ----------------------------------------------------------------------
# 2. Build force field + parameters (the {idx, map, params} tables are
#    trainable pytree leaves)
# ----------------------------------------------------------------------
terms = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
ff = ForceField.create(mol, os.path.join(data, "structure.prmtop"))
par = Parameters(ff, mol, terms)

# ----------------------------------------------------------------------
# 3. System state + forces (Pallas kernel auto-selected on TPU/f32)
# ----------------------------------------------------------------------
system = System(mol.numAtoms, nreplicas=2, precision="single")
system.set_positions(mol.coords)
system.set_box(mol.box)
system.set_velocities(maxwell_boltzmann(par.masses, T=300, replicas=2))

forces = Forces(par, terms=terms, cutoff=9.0, switch_dist=7.5, rfa=True)
Epot = forces.compute(system.pos, system.box, system.forces)
print("Initial Epot per replica:", Epot)

# ----------------------------------------------------------------------
# 4. Dynamics: 100 steps = ONE compiled lax.scan, zero host syncs
# ----------------------------------------------------------------------
# 1 fs: unconstrained TIP3P water is unstable beyond ~1 fs (no SHAKE yet)
integrator = Integrator(system, forces, timestep=1.0, gamma=0.1, T=300)
for i in range(5):
    Ekin, Epot, T = integrator.step(niter=100)
    print(f"iter {(i + 1) * 100:5d}  Epot={Epot[0]:10.3f}  "
          f"Ekin={Ekin[0]:9.3f}  T={T[0]:7.2f} K")

# ----------------------------------------------------------------------
# 5. Differentiable MD: train LJ parameters by force matching
# ----------------------------------------------------------------------
import jax
import jax.numpy as jnp
import optax

from torchmd_tpu.potentials import total_energy
from torchmd_tpu.train import ForceMatchingTrainer

ffp_true = forces.ffparams
B = 4
pos = jnp.asarray(np.repeat(mol.coords[:, :, 0][None], B, 0), jnp.float32)
box = jnp.tile(jnp.asarray(mol.box[:, 0], jnp.float32)[None], (B, 1))
f_ref = -jax.vmap(
    jax.grad(lambda p, b: total_energy(ffp_true, p, b, forces.config)),
    in_axes=(0, 0),
)(pos, box)

ffp_wrong = ffp_true._replace(lj_params=ffp_true.lj_params * 1.05)
trainer = ForceMatchingTrainer(
    ffp_wrong, forces.config, trainable=("lj",), optimizer=optax.adam(1e-2)
)
state = trainer.init()
for i in range(20):
    state, loss = trainer.step(state, pos, box, f_ref)
print("force-matching loss after 20 steps:", float(loss))

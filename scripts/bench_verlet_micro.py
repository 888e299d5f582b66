"""Microbenchmark: verlet build vs evaluate vs dense Pallas on thrombin."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from torchmd_tpu.io import Molecule
from torchmd_tpu.forcefields import ForceField
from torchmd_tpu.parameters import Parameters
from torchmd_tpu.forces import Forces
from torchmd_tpu.neighbors import VerletKernel

DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]

mol = Molecule(os.path.join(DATA, "structure.prmtop"))
mol.read(os.path.join(DATA, "structure.pdb"))
ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
par = Parameters(ff, mol, TERMS, precision="single")
forces = Forces(par, terms=TERMS, precision="single", cutoff=7.3, rfa=True)
pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

kern = VerletKernel(forces.ffparams, forces.config, box=None,
                    pos0=np.asarray(pos))
print("capacity:", kern.vcfg.capacity, flush=True)

build = jax.jit(kern.build)
nl = jax.block_until_ready(build(pos))
ef = jax.jit(lambda p, n: kern.energy_forces(p, None, n))
out = jax.block_until_ready(ef(pos, nl))

# dense pallas path for comparison
pal = jax.jit(lambda p: forces.ef_one(p, None))
jax.block_until_ready(pal(pos))


def bench(fn, *args, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


print(f"verlet build:      {bench(build, pos):8.3f} ms", flush=True)
print(f"verlet eval:       {bench(ef, pos, nl):8.3f} ms", flush=True)
print(f"dense pallas step: {bench(pal, pos):8.3f} ms", flush=True)

# energy sanity
e_v = sum(jax.tree_util.tree_leaves(ef(pos, nl)[0]))
e_d = sum(jax.tree_util.tree_leaves(pal(pos)[0]))
print("Epot verlet(nb+bonded?) vs dense:", float(e_v), float(e_d), flush=True)

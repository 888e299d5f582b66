"""Benchmark: MD steps/sec on the thrombin-ligand complex (4,676 atoms).

Production-style configuration from the reference's own benchmark config
(tests/thrombin-ligand-amber/conf.yaml): full AMBER force field, cutoff
7.3 A, reaction-field electrostatics, 4 fs timestep, Langevin thermostat at
300 K, single precision.

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec on this chip, "unit": "steps/s",
   "vs_baseline": ratio vs upstream TorchMD on this host's CPU}

The baseline is measured live when the upstream reference + torch are
available (same inputs, same terms); otherwise a recorded constant from
this container's CPU is used.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TERMS = ["bonds", "angles", "dihedrals", "impropers", "1-4",
         "electrostatics", "lj"]
DATA = os.path.join(REPO, "tests", "data", "thrombin-ligand-amber")
CUTOFF, RFA, TIMESTEP, TEMP, GAMMA = 7.3, True, 4.0, 300.0, 0.1

# TorchMD (upstream) steps/sec on this container's CPU, measured with the
# identical system/terms (fallback when the live measurement is impossible).
FALLBACK_BASELINE_STEPS_PER_SEC = 1.00


def pallas_parity_gate(forces, mol):
    """Assert the compiled-on-TPU Pallas kernels (bonded + nonbonded)
    reproduce the pure-AD jnp path on this device before timing anything —
    a Mosaic miscompile must fail the bench, not produce fast wrong numbers.
    """
    import jax
    import jax.numpy as jnp

    from torchmd_tpu.potentials import compute_potentials

    ffp, cfg = forces.ffparams, forces.config
    pos = jnp.asarray(mol.coords[:, :, 0], jnp.float32)

    @jax.jit
    def ad_path(p):
        def etot(q):
            pot = compute_potentials(ffp, q, None, cfg)
            return sum(jax.tree_util.tree_leaves(pot))

        return jax.value_and_grad(etot)(p)

    @jax.jit
    def kern_path(p):
        pot, frc = forces.ef_one(p, None)
        return sum(jax.tree_util.tree_leaves(pot)), -frc

    e_ad, g_ad = ad_path(pos)
    e_k, g_k = kern_path(pos)
    e_scale = max(1.0, abs(float(e_ad)))
    g_scale = float(jnp.max(jnp.abs(g_ad)))
    e_err = abs(float(e_ad) - float(e_k)) / e_scale
    g_err = float(jnp.max(jnp.abs(g_ad - g_k))) / g_scale
    assert e_err < 1e-5, f"on-TPU Pallas energy parity failed: {e_err}"
    assert g_err < 1e-3, f"on-TPU Pallas force parity failed: {g_err}"


def measure_vpu_peak_tflops():
    """Empirical f32 VPU FMA peak on this chip: a scan whose body applies
    a long unrolled chain of dependent NONLINEAR multiply-adds
    (c <- c*c + b with fixed point 0.5: numerically stable, and the
    compiler cannot collapse it -- an affine a*c+b chain gets folded to
    a single FMA by XLA's algebraic simplifier, and a one-FMA body
    measures HBM bandwidth instead of the VPU) to a block, so each
    iteration does UNROLL FMAs per element against ONE HBM round-trip of
    the carry. This is the roofline the pair kernels run against -- the
    nonbonded stage is elementwise VPU math, not MXU."""
    import jax
    import jax.numpy as jnp

    K = 16000
    UNROLL = 256
    x = jnp.full((1024, 512), 0.4999, jnp.float32)

    @jax.jit
    def chain(x):
        def body(c, _):
            for _ in range(UNROLL):
                c = c * c + 0.25
            return c, None

        y, _ = jax.lax.scan(body, x, None, length=K)
        return y

    # sync by fetching a scalar: through the axon tunnel
    # block_until_ready() returns before execution completes, and the
    # ~35 ms fetch round trip demands multi-TFLOP total work (<5% error)
    float(chain(x)[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return 2.0 * K * UNROLL * x.size / best / 1e12


def pair_flop_accounting(forces, niter_steps_per_sec):
    """Counted FLOPs actually executed by the nonbonded pair stage per
    step (padded slots x ~60 f32 ops/slot, the per-pair cost of the
    LJ+RFA term math incl. displacement and force reduction), and the
    all-pairs 'useful' pair count for reference."""
    n = forces.natoms
    FLOPS_PER_SLOT = 60
    if forces.use_pallas:
        from torchmd_tpu.ops.pallas_nonbonded import TILE_I, TILE_J
        npad = -(-n // max(TILE_I, TILE_J)) * max(TILE_I, TILE_J)
        ni = npad // TILE_I
        triangular = TILE_I == TILE_J and os.environ.get(
            "TMD_PALLAS_TRI", "1") != "0"
        if triangular:
            slots = (ni * (ni + 1) // 2) * TILE_I * TILE_J
        else:
            slots = npad * npad
    else:
        slots = n * n
    return slots, slots * FLOPS_PER_SLOT * niter_steps_per_sec


def measure_mine(niter=500, rounds=3):
    # 500-step chunks: the ~35 ms per-chunk tunnel sync is 0.07 ms/step
    # here vs 0.35 at niter=100 (production runs use long chunks; the
    # in-scan step time is the honest device number, see
    # scripts/bench_step_anatomy.py)
    import jax

    from torchmd_tpu.io import Molecule
    from torchmd_tpu.forcefields import ForceField
    from torchmd_tpu.parameters import Parameters
    from torchmd_tpu.forces import Forces
    from torchmd_tpu.systems import System
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann

    mol = Molecule(os.path.join(DATA, "structure.prmtop"))
    mol.read(os.path.join(DATA, "structure.pdb"))
    ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
    par = Parameters(ff, mol, TERMS, precision="single")
    forces = Forces(par, terms=TERMS, precision="single", cutoff=CUTOFF, rfa=RFA)
    pallas_parity_gate(forces, mol)
    system = System(mol.numAtoms, 1, "single")
    system.set_positions(mol.coords)
    system.set_velocities(maxwell_boltzmann(par.masses, TEMP, 1, seed=1))
    integ = Integrator(system, forces, TIMESTEP, gamma=GAMMA, T=TEMP, seed=1)

    integ.step(niter=niter)  # compile + warmup at the timed shape
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        integ.step(niter=niter)
        dt = time.perf_counter() - t0
        best = max(best, niter / dt)
    dev = jax.devices()[0]
    slots, flops_per_sec = pair_flop_accounting(forces, best)
    vpu_peak = measure_vpu_peak_tflops()
    perf = {
        "pair_slots_per_step": int(slots),
        "tflops": round(flops_per_sec / 1e12, 3),
        "vpu_peak_tflops": round(vpu_peak, 2),
        "mfu": round(flops_per_sec / 1e12 / vpu_peak, 4),
    }
    return best, f"{dev.platform}:{dev.device_kind}", perf


def measure_baseline(niter=3):
    try:
        sys.path.insert(0, "/root/reference")
        import torch

        from torchmd_tpu.io import Molecule
        from torchmd_tpu.forcefields import ForceField
        from torchmd.parameters import Parameters as RefParameters
        from torchmd.forces import Forces as RefForces
        from torchmd.integrator import Integrator as RefIntegrator
        from torchmd.integrator import maxwell_boltzmann as ref_mb
        from torchmd.systems import System as RefSystem

        mol = Molecule(os.path.join(DATA, "structure.prmtop"))
        mol.read(os.path.join(DATA, "structure.pdb"))
        ff = ForceField.create(mol, os.path.join(DATA, "structure.prmtop"))
        par = RefParameters(ff, mol, TERMS, precision=torch.float32, device="cpu")
        system = RefSystem(mol.numAtoms, 1, torch.float32, "cpu")
        system.set_positions(mol.coords)
        system.set_box(np.zeros((3, 1)))
        system.set_velocities(ref_mb(par.masses, TEMP, 1))
        forces = RefForces(par, terms=TERMS, cutoff=CUTOFF, rfa=RFA)
        integ = RefIntegrator(system, forces, TIMESTEP, "cpu", gamma=GAMMA, T=TEMP)
        integ.step(niter=1)  # warmup
        best = 0.0
        for _ in range(2):  # best-of-2: the shared CPU is noisy
            t0 = time.perf_counter()
            integ.step(niter=niter)
            dt = time.perf_counter() - t0
            best = max(best, niter / dt)
        return best, "torchmd-cpu (measured)"
    except Exception as e:  # reference not runnable here
        return FALLBACK_BASELINE_STEPS_PER_SEC, f"torchmd-cpu (recorded; {type(e).__name__})"


def main():
    mine, device, perf = measure_mine()
    baseline, basesrc = measure_baseline()
    print(
        json.dumps(
            {
                "metric": "thrombin-ligand (4676 atoms) MD steps/sec, "
                          "4 fs, cutoff 7.3 A, RFA, Langevin 300 K",
                "value": round(mine, 3),
                "unit": "steps/s",
                "ns_per_day": round(mine * TIMESTEP * 1e-6 * 86400, 2),
                "vs_baseline": round(mine / baseline, 2),
                "device": device,
                "baseline_steps_per_sec": round(baseline, 4),
                "baseline_source": basesrc,
                # chip-utilization accounting: executed pair-stage FLOPs
                # per second vs this chip's measured f32 VPU FMA peak
                # (the pair stage is elementwise VPU math, not MXU)
                **perf,
            }
        )
    )


if __name__ == "__main__":
    main()

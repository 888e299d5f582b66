"""Energy minimizers.

Mirrors the reference set (torchmd/minimizers.py):
  - `minimize_bfgs`: scipy L-BFGS-B driving the jitted energy+force
    evaluation (same contract as minimizers.py:8-51).
  - `minimize_lbfgs`: on-device L-BFGS via optax (the reference's
    `minimize_pytorch_bfgs` analog, minimizers.py:54-96). Also exported
    under the reference name `minimize_pytorch_bfgs` for drop-in use.
  - `minimize_cg`: conjugate gradient with bracket + golden-section line
    search (port of the semantics of minimizers.py:108-308).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _energy_forces_fn(forces):
    """(pos (R,N,3), box (R,3)) -> (Epot (R,), forces (R,N,3)) jitted,
    via the Forces object's fused hot path (Pallas/analytic nonbonded +
    AD bonded)."""
    ext = getattr(forces.external, "energy_fn", None)

    def ef(pos, box):
        pot, frc = forces.ef_one(pos, box)
        leaves = jax.tree_util.tree_leaves(pot)
        e = sum(leaves) if leaves else jnp.zeros((), pos.dtype)
        if ext is not None:
            ee, eg = jax.value_and_grad(ext)(pos, box)
            e = e + ee
            frc = frc - eg
        return e, frc

    vg = jax.vmap(ef, in_axes=(0, 0))

    @jax.jit
    def efn(pos, box):
        return vg(pos, box)

    return efn


def minimize_bfgs(system, forces, fmax=0.5, steps=1000, verbose=True):
    from scipy.optimize import minimize

    if steps == 0:
        return
    if system.pos.shape[0] != 1:
        raise RuntimeError("System minimization currently doesn't support replicas.")

    efn = _energy_forces_fn(forces)
    box = jnp.asarray(system.box_diag, dtype=forces.dtype)
    info = {"Nfeval": 0}

    def evalfunc(coords):
        pos = jnp.asarray(coords.reshape(1, -1, 3), dtype=forces.dtype)
        e, f = efn(pos, box)
        epot = float(e[0])
        grad = -np.asarray(f[0], dtype=np.float64)
        if verbose:
            fmax_now = np.max(np.linalg.norm(grad, axis=1))
            print(f"{info['Nfeval']:>4d}  E={epot:12.6f}  fmax={fmax_now:10.6f}")
        info["Nfeval"] += 1
        return epot, grad.reshape(-1)

    if verbose:
        print(f"{'iter':>4s}  {'Epot':>14s}  {'fmax':>15s}")
    x0 = np.asarray(system.pos, dtype=np.float64)[0].flatten()
    res = minimize(
        evalfunc, x0, method="L-BFGS-B", jac=True,
        options={"gtol": fmax, "maxiter": steps},
    )
    system.pos[:] = res.x.reshape(1, -1, 3).astype(system.pos.dtype)
    return res


def minimize_lbfgs(system, forces, steps=10, max_iter=20, verbose=True):
    """On-device L-BFGS (optax). Returns the per-outer-step energy history."""
    if steps == 0:
        return
    import optax

    efn = _energy_forces_fn(forces)
    box = jnp.asarray(system.box_diag, dtype=forces.dtype)
    pos = jnp.asarray(system.pos, dtype=forces.dtype)

    def loss(p):
        e, _ = efn(p, box)
        return jnp.sum(e)

    solver = optax.lbfgs()
    value_and_grad = jax.value_and_grad(loss)

    @jax.jit
    def one(p, state):
        value, grad = value_and_grad(p)
        updates, state = solver.update(
            grad, state, p, value=value, grad=grad, value_fn=loss
        )
        return optax.apply_updates(p, updates), state, value

    state = solver.init(pos)
    energies = []
    if verbose:
        print(f"{'iter':>4s}  {'Epot':>14s}")
    for i in range(steps * max_iter):
        pos, state, value = one(pos, state)
        energies.append(float(value))
        if verbose and i % max_iter == 0:
            print(f"{i:>4d}  E={float(value):12.6f}")
    system.pos[:] = np.asarray(pos, dtype=system.pos.dtype)
    return np.asarray(energies)


# Reference-compatible alias (same role as minimize_pytorch_bfgs)
minimize_pytorch_bfgs = minimize_lbfgs


def minimize_fire(system, forces, steps=500, dt_fs=0.5, dt_max_factor=10.0,
                  alpha0=0.1, f_inc=1.1, f_dec=0.5, f_alpha=0.99, n_min=5):
    """FIRE (Fast Inertial Relaxation Engine) minimization, fully on
    device: the entire relaxation is one jitted lax.scan (new capability;
    the reference's minimizers all round-trip host<->device per step).

    Returns the per-step energy history (nreplicas-summed)."""
    from .units import TIMEFACTOR

    efn = _energy_forces_fn(forces)
    box = jnp.asarray(system.box_diag, dtype=forces.dtype)
    pos0 = jnp.asarray(system.pos, dtype=forces.dtype)
    masses = jnp.asarray(
        np.asarray(forces.par.masses).reshape(1, -1, 1), forces.dtype
    )
    dt0 = dt_fs / TIMEFACTOR
    dt_max = dt0 * dt_max_factor

    def step(carry, _):
        pos, vel, dt, alpha, n_up = carry
        e, f = efn(pos, box)
        power = jnp.sum(f * vel)
        fnorm = jnp.sqrt(jnp.sum(f * f))
        vnorm = jnp.sqrt(jnp.sum(vel * vel))
        vel_mixed = (1.0 - alpha) * vel + alpha * vnorm * f / jnp.maximum(
            fnorm, 1e-20
        )
        uphill = power <= 0
        vel_new = jnp.where(uphill, jnp.zeros_like(vel), vel_mixed)
        grow = jnp.logical_and(power > 0, n_up >= n_min)
        dt_new = jnp.where(
            uphill, dt * f_dec, jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        )
        alpha_new = jnp.where(
            uphill, alpha0, jnp.where(grow, alpha * f_alpha, alpha)
        )
        n_up_new = jnp.where(uphill, 0, n_up + 1)
        vel_next = vel_new + dt_new * f / masses
        pos_next = pos + dt_new * vel_next
        return (pos_next, vel_next, dt_new, alpha_new, n_up_new), jnp.sum(e)

    @jax.jit
    def run(pos):
        carry = (
            pos, jnp.zeros_like(pos), jnp.asarray(dt0, forces.dtype),
            jnp.asarray(alpha0, forces.dtype), jnp.asarray(0),
        )
        carry, es = jax.lax.scan(step, carry, None, length=steps)
        return carry[0], es

    pos_final, energies = run(pos0)
    system.pos[:] = np.asarray(pos_final, dtype=system.pos.dtype)
    return np.asarray(energies)


def _get_energy_forces_2d(efn, box, pos, getForces=True):
    """efn takes (natoms, 3) positions; returns (E, forces (natoms, 3))."""
    e, f = efn(pos, box)
    if getForces:
        return float(e[0]), f
    return float(e[0])


def _bracket_and_golden_section_search(efn, box, initpos, search_dir, u):
    """Bracketing + golden-section line search along `search_dir`
    (same algorithm as minimizers.py:108-261)."""
    tau = 0.618033988749895
    dis = 1.0
    tol = 1.0e-2
    u_amin = u

    smax = float(jnp.sqrt(jnp.max(jnp.sum(search_dir**2, axis=1))))
    amax = dis / smax
    amin = 0.0
    delta = amax - amin
    a1 = amin + (1 - tau) * delta
    a2 = amin + tau * delta
    is_bracket = (delta * smax) <= tol

    u_amax = _get_energy_forces_2d(efn, box, initpos + amax * search_dir, False)
    u_a1 = _get_energy_forces_2d(efn, box, initpos + a1 * search_dir, False)
    pos = initpos + a2 * search_dir
    u_a2, frc = _get_energy_forces_2d(efn, box, pos, True)
    u = u_a2

    while not is_bracket:
        if u_a1 >= u_amin:
            amax, u_amax = a1, u_a1
            delta = amax - amin
            a1 = amin + (1 - tau) * delta
            a2 = amin + tau * delta
            u_a1 = _get_energy_forces_2d(efn, box, initpos + a1 * search_dir, False)
            pos = initpos + a2 * search_dir
            u_a2, frc = _get_energy_forces_2d(efn, box, pos, True)
            is_bracket = delta * smax <= tol
            u = u_a2
        elif u_a2 >= u_amin:
            amax, u_amax = a2, u_a2
            a2, u_a2 = a1, u_a1
            delta = amax - amin
            a1 = amin + (1 - tau) * delta
            pos = initpos + a1 * search_dir
            u_a1, frc = _get_energy_forces_2d(efn, box, pos, True)
            is_bracket = delta * smax <= tol
            u = u_a1
        elif u_amax < u_a1 and u_amax < u_a2:
            amin, u_amin = a2, u_a2
            a1, u_a1 = amax, u_amax
            amax = amin + delta
            a2 = amin + tau * delta
            u_amax = _get_energy_forces_2d(efn, box, initpos + amax * search_dir, False)
            pos = initpos + a2 * search_dir
            u_a2, frc = _get_energy_forces_2d(efn, box, pos, True)
        else:
            is_bracket = True

    while delta * smax > tol:
        if u_a1 > u_a2:
            amin, u_amin = a1, u_a1
            delta = amax - amin
            a1, u_a1 = a2, u_a2
            a2 = amin + tau * delta
            pos = initpos + a2 * search_dir
            u_a2, frc = _get_energy_forces_2d(efn, box, pos, True)
            u = u_a2
        else:
            amax, u_amax = a2, u_a2
            delta = amax - amin
            a2, u_a2 = a1, u_a1
            a1 = amin + (1 - tau) * delta
            pos = initpos + a1 * search_dir
            u_a1, frc = _get_energy_forces_2d(efn, box, pos, True)
            u = u_a1

    return pos, frc, u


def minimize_cg(system, forces, steps=1000, start_step: int = 0, threshold=None):
    if system.pos.shape[0] != 1:
        raise RuntimeError("minimize_cg supports a single replica")
    efn_batched = _energy_forces_fn(forces)
    box = jnp.asarray(system.box_diag, dtype=forces.dtype)

    def efn(pos2d, box_):
        e, f = efn_batched(pos2d[None], box_)
        return e, f[0]

    pos = jnp.asarray(system.pos[0], dtype=forces.dtype)
    u, frc = _get_energy_forces_2d(efn, box, pos, getForces=True)
    search_dir = frc
    fdf = float(jnp.sum(frc**2))

    final = steps - 1
    for step in range(start_step, steps):
        pos, frc, u = _bracket_and_golden_section_search(
            efn, box, pos, search_dir, u
        )
        old_fdf = fdf
        fdf = float(jnp.sum(frc**2))
        beta = fdf / old_fdf
        search_dir = frc + beta * search_dir
        energy, frc = _get_energy_forces_2d(efn, box, pos, True)
        maxforce = float(jnp.max(jnp.abs(frc)))
        logger.info(f"{step:12d} {energy:14.4f} {maxforce:16.4f}")
        if threshold is not None and maxforce < threshold:
            final = step
            break

    system.pos[:] = np.asarray(pos)[None].astype(system.pos.dtype)
    return final

"""A compact, trainable neural-network potential (pure JAX).

The reference integrates NNPs only through an external package
(torchmd-net) behind the `External` protocol. Here a small SchNet-flavored
radial model ships natively so the full workflow -- train a potential,
plug it into the integrator as an external term, run jitted MD -- works
out of the box and under `vmap`/`grad`/`scan` on TPU.

Architecture (per conformation):
    d_ij      : masked pair distances within `cutoff` (dense, static shape)
    phi_ij    : Gaussian radial basis x smooth cosine cutoff
    m_i       : sum_j ( phi_ij @ W_rbf ) * embed(z_j)     (messages)
    E_i       : MLP([m_i, embed(z_i)])
    E         : sum_i E_i
Energies in kcal/mol, distances in Angstrom, so it composes with the MM
terms directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NNPConfig(NamedTuple):
    n_species: int
    cutoff: float = 5.0
    n_rbf: int = 16
    features: int = 32
    hidden: int = 64


def init_params(cfg: NNPConfig, key) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    f, h, r = cfg.features, cfg.hidden, cfg.n_rbf

    def dense(k, nin, nout):
        return {
            "w": jax.random.normal(k, (nin, nout)) / np.sqrt(nin),
            "b": jnp.zeros(nout),
        }

    return {
        "embed": 0.1 * jax.random.normal(k1, (cfg.n_species, f)),
        "rbf_proj": dense(k2, r, f),
        "mlp1": dense(k3, 2 * f, h),
        "mlp2": dense(k4, h, h),
        "out": dense(k5, h, 1),
        "rbf_centers": jnp.linspace(0.5, cfg.cutoff, r),
        "rbf_gamma": jnp.asarray(10.0 / cfg.cutoff),
    }


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def nnp_energy(params: dict, cfg: NNPConfig, species, pos, box=None):
    """Total energy of one conformation. species: (natoms,) int32 indices
    into the embedding table; pos: (natoms, 3)."""
    from .potentials import wrap_displacement

    n = pos.shape[0]
    dv = pos[:, None, :] - pos[None, :, :]
    if box is not None:
        dv = wrap_displacement(dv, box)
    d2 = jnp.sum(dv * dv, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye, 1.0, d2)
    d = jnp.sqrt(d2)
    within = jnp.logical_and(~eye, d < cfg.cutoff)

    # radial basis with smooth cosine cutoff
    rbf = jnp.exp(-params["rbf_gamma"] * (d[..., None] - params["rbf_centers"]) ** 2)
    fcut = 0.5 * (jnp.cos(jnp.pi * jnp.clip(d / cfg.cutoff, 0, 1)) + 1.0)
    w_pair = (fcut * within.astype(pos.dtype))[..., None]
    phi = rbf * w_pair                                   # (n, n, n_rbf)

    emb = params["embed"][species]                       # (n, f)
    msg = _apply_dense(params["rbf_proj"], phi)          # (n, n, f)
    m_i = jnp.sum(msg * emb[None, :, :], axis=1)         # (n, f)

    x = jnp.concatenate([m_i, emb], axis=-1)
    x = jax.nn.silu(_apply_dense(params["mlp1"], x))
    x = jax.nn.silu(_apply_dense(params["mlp2"], x))
    e_i = _apply_dense(params["out"], x)[:, 0]
    return jnp.sum(e_i)


class NNPExternal:
    """External-protocol adapter: plugs a (trained) NNP into Forces/
    Integrator. Exposes `energy_fn` so the potential folds into the jitted
    scan (forces via autodiff)."""

    def __init__(self, params: dict, cfg: NNPConfig, species):
        self.params = params
        self.cfg = cfg
        self.species = jnp.asarray(species, jnp.int32)

    def energy_fn(self, pos, box):
        return nnp_energy(self.params, self.cfg, self.species, pos, box)

    def calculate(self, pos, box):
        from .external import JaxExternal

        return JaxExternal(self.energy_fn).calculate(pos, box)


def train_nnp(params, cfg: NNPConfig, species, pos_batch, e_ref, f_ref,
              steps=200, learning_rate=1e-3, force_weight=1.0, box=None,
              callback=None):
    """Joint energy+force matching. pos_batch (B, n, 3); e_ref (B,);
    f_ref (B, n, 3). Returns (params, loss_history)."""
    import optax

    species = jnp.asarray(species, jnp.int32)
    if box is None:
        box_b = jnp.zeros((pos_batch.shape[0], 3), pos_batch.dtype)
    else:
        box_b = jnp.broadcast_to(box, (pos_batch.shape[0], 3))

    def e_one(p, x, b):
        return nnp_energy(p, cfg, species, x, b)

    def loss_fn(p):
        E = jax.vmap(lambda x, b: e_one(p, x, b))(pos_batch, box_b)
        F = -jax.vmap(jax.grad(lambda x, b: e_one(p, x, b)), in_axes=(0, 0))(
            pos_batch, box_b
        )
        return jnp.mean((E - e_ref) ** 2) + force_weight * jnp.mean(
            (F - f_ref) ** 2
        )

    opt = optax.adam(learning_rate)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    history = []
    for i in range(steps):
        params, state, loss = step(params, state)
        history.append(float(loss))
        if callback is not None:
            callback(i, history[-1])
    return params, history

"""Differentiable force-field training (force/energy matching).

The headline TorchMD use case: force-field *parameters* are tensors, so a
potential can be trained against reference forces/energies (e.g. building
coarse-grained models). Here that is a first-class, TPU-sharded training
loop: parameters are FFParams pytree leaves, the loss differentiates
through the force computation (second-order AD: d(loss)/d(params) of
F = -dE/dpos), batches shard over the `dp` mesh axis and each
conformation's pair matrix over `sp`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .potentials import FFParams, ForceTermConfig, total_energy

TRAINABLE_FIELDS = (
    "lj", "charges", "bonds", "angles", "dihedrals", "impropers", "1-4",
)


def split_trainable(ffp: FFParams, trainable: Sequence[str]):
    """Split FFParams into (trainable dict, rebuild fn)."""
    train = {}
    if "lj" in trainable and ffp.lj_params is not None:
        train["lj"] = ffp.lj_params
    if "charges" in trainable:
        train["charges"] = ffp.charges
    for name, field in (
        ("bonds", "bonds"), ("angles", "angles"),
        ("dihedrals", "dihedrals"), ("impropers", "impropers"),
        ("1-4", "nb14"),
    ):
        tbl = getattr(ffp, field)
        if name in trainable and tbl is not None:
            train[name] = tbl.params

    def rebuild(train_dict) -> FFParams:
        out = ffp
        if "lj" in train_dict:
            out = out._replace(lj_params=train_dict["lj"])
        if "charges" in train_dict:
            out = out._replace(charges=train_dict["charges"])
        for name, field in (
            ("bonds", "bonds"), ("angles", "angles"),
            ("dihedrals", "dihedrals"), ("impropers", "impropers"),
            ("1-4", "nb14"),
        ):
            if name in train_dict:
                tbl = getattr(out, field)
                out = out._replace(**{field: tbl._replace(params=train_dict[name])})
        return out

    return train, rebuild


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jnp.ndarray


class ForceMatchingTrainer:
    """Train FFParams leaves to match reference forces (and optionally
    energies) over batches of conformations.

    When a mesh is given, the batch shards over `dp` and the nonbonded pair
    matrix over `sp` (see parallel.spatial); gradients reduce automatically
    through the psum/all_gather collectives.
    """

    def __init__(self, ffp: FFParams, cfg: ForceTermConfig,
                 trainable=("lj",), optimizer=None, energy_weight=0.0,
                 mesh=None, dp_axis="dp", sp_axis="sp"):
        import optax

        self.cfg = cfg
        self.mesh = mesh
        self.optimizer = optimizer or optax.adam(1e-3)
        self.energy_weight = energy_weight
        train, self._rebuild = split_trainable(ffp, trainable)
        self._init_params = train

        if mesh is not None:
            from .parallel.spatial import sharded_energy_fn

            def make_efn(ffp_new):
                return sharded_energy_fn(ffp_new, cfg, mesh, dp_axis, sp_axis)

            def batched_E(params, pos, box):
                return make_efn(self._rebuild(params))(pos, box)
        else:
            def batched_E(params, pos, box):
                ffp_new = self._rebuild(params)
                return jax.vmap(
                    lambda p, b: total_energy(ffp_new, p, b, cfg)
                )(pos, box)

        def loss_fn(params, pos, box, f_ref, e_ref):
            def esum(p):
                return jnp.sum(batched_E(params, p, box))

            E = batched_E(params, pos, box)
            F = -jax.grad(esum)(pos)
            loss = jnp.mean((F - f_ref) ** 2)
            if energy_weight:
                loss = loss + energy_weight * jnp.mean((E - e_ref) ** 2)
            return loss

        @jax.jit
        def train_step(state: TrainState, pos, box, f_ref, e_ref):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, pos, box, f_ref, e_ref
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            import optax

            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._train_step = train_step
        self.loss_fn = loss_fn

    def init(self) -> TrainState:
        return TrainState(
            self._init_params,
            self.optimizer.init(self._init_params),
            jnp.asarray(0),
        )

    def step(self, state: TrainState, pos, box, f_ref, e_ref=None):
        if e_ref is None:
            e_ref = jnp.zeros(pos.shape[0], dtype=pos.dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("dp"))
            pos = jax.device_put(pos, sh)
            f_ref = jax.device_put(f_ref, sh)
        return self._train_step(state, pos, box, f_ref, e_ref)

    def ffparams(self, state: TrainState) -> FFParams:
        return self._rebuild(state.params)

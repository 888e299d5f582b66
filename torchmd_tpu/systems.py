"""Simulation state containers.

`System` mirrors the reference's mutable container API
(torchmd/systems.py:5-98) for drop-in ergonomics: numpy-backed
pos/vel/forces/box/masses with the same set_* semantics and shapes
((nreplicas, natoms, 3) state, (nreplicas, 3, 3) box with only the diagonal
used). The TPU compute path never mutates it: `SimState` is the immutable
pytree that actually flows through jitted code, and the Integrator syncs it
back into `System` at host boundaries only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_PRECISION = {
    "single": np.float32,
    "double": np.float64,
    np.float32: np.float32,
    np.float64: np.float64,
}


def resolve_precision(precision) -> np.dtype:
    if precision is None:
        return np.dtype(np.float32)
    if isinstance(precision, str):
        return np.dtype(_PRECISION[precision])
    try:
        return np.dtype(precision)
    except TypeError:
        # jnp dtypes and torch-like objects with a name attribute
        name = getattr(precision, "name", None) or str(precision)
        if "64" in name or name == "double":
            return np.dtype(np.float64)
        return np.dtype(np.float32)


class SimState(NamedTuple):
    """Immutable per-step MD state (device pytree)."""

    pos: jnp.ndarray     # (nreplicas, natoms, 3)
    vel: jnp.ndarray     # (nreplicas, natoms, 3)
    forces: jnp.ndarray  # (nreplicas, natoms, 3)
    key: jnp.ndarray     # jax PRNG key


class System:
    def __init__(self, natoms, nreplicas=1, precision="single", device=None):
        dtype = resolve_precision(precision)
        self.box = np.zeros((nreplicas, 3, 3), dtype=dtype)
        self.pos = np.zeros((nreplicas, natoms, 3), dtype=dtype)
        self.vel = np.zeros((nreplicas, natoms, 3), dtype=dtype)
        self.forces = np.zeros((nreplicas, natoms, 3), dtype=dtype)
        self.masses = np.zeros((natoms, 1), dtype=dtype)
        self.device = device
        self.dtype = dtype

    @property
    def natoms(self):
        return self.pos.shape[1]

    @property
    def nreplicas(self):
        return self.pos.shape[0]

    @property
    def box_diag(self) -> np.ndarray:
        """(nreplicas, 3) rectangular box lengths."""
        return np.stack([np.diag(self.box[r]) for r in range(self.nreplicas)])

    # ------------------------------------------------------------------
    def set_positions(self, pos):
        """Accepts (natoms, 3), (natoms, 3, 1) or (natoms, 3, nreplicas),
        matching the reference (systems.py:42-60)."""
        pos = np.asarray(pos, dtype=self.dtype)
        if pos.shape[1] != 3:
            raise RuntimeError(
                f"Positions shape must be (natoms, 3, nreplicas); got {pos.shape}"
            )
        if pos.ndim == 2:
            pos = pos[:, :, None]
        atom_pos = np.transpose(pos, (2, 0, 1))
        if self.nreplicas > 1 and atom_pos.shape[0] != self.nreplicas:
            atom_pos = np.repeat(atom_pos[[0]], self.nreplicas, axis=0)
        self.pos[:] = atom_pos

    def set_velocities(self, vel):
        vel = np.asarray(vel, dtype=self.dtype)
        if vel.shape != (self.nreplicas, self.natoms, 3):
            raise RuntimeError("Velocities shape must be (nreplicas, natoms, 3)")
        self.vel[:] = vel

    def set_box(self, box):
        box = np.asarray(box, dtype=np.float64)
        if box.ndim == 1:
            if len(box) != 3:
                raise RuntimeError("Box must have at least 3 elements")
            box = box[:, None]
        if box.shape[0] != 3:
            raise RuntimeError("Box shape must be (3, 1) or (3, nreplicas)")
        box = np.swapaxes(box, 1, 0)
        if self.nreplicas > 1 and box.shape[0] != self.nreplicas:
            box = np.repeat(box[[0]], self.nreplicas, axis=0)
        for r in range(min(box.shape[0], self.nreplicas)):
            np.fill_diagonal(self.box[r], box[r].astype(self.dtype))

    def set_forces(self, forces):
        forces = np.asarray(forces, dtype=self.dtype)
        if forces.shape != (self.nreplicas, self.natoms, 3):
            raise RuntimeError("Forces shape must be (nreplicas, natoms, 3)")
        self.forces[:] = forces

    def set_masses(self, masses):
        masses = np.asarray(masses, dtype=self.dtype).reshape(-1)
        if masses.shape != (self.natoms,):
            raise RuntimeError("Masses shape must be (natoms,)")
        self.masses[:, 0] = masses

    # ------------------------------------------------------------------
    def to_(self, device):  # API parity; storage is host-side numpy
        self.device = device

    def precision_(self, precision):
        dtype = resolve_precision(precision)
        for name in ("box", "pos", "vel", "forces", "masses"):
            setattr(self, name, getattr(self, name).astype(dtype))
        self.dtype = dtype

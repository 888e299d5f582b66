from .mesh import make_mesh, replica_sharding
from .spatial import sharded_energy_fn

__all__ = ["make_mesh", "replica_sharding", "sharded_energy_fn"]

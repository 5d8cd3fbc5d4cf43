from . import dist, mesh
from .mesh import batch_sharding, make_mesh, param_sharding, replicated, shard_batch

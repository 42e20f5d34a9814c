from .mesh import scenario_mesh, shard_batch
from .batched import BatchedMpc

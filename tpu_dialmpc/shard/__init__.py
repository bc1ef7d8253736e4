from tpu_dialmpc.shard.mesh import make_mesh, sample_sharding
from tpu_dialmpc.shard.planner import ShardedMBDPI

__all__ = ["make_mesh", "sample_sharding", "ShardedMBDPI"]

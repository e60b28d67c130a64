from hierarchicalprobabilistic3dhuman_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated_sharding, sample_sharding)
from hierarchicalprobabilistic3dhuman_tpu.parallel.sharded_train import (
    make_sharded_train_step, shard_batch)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "sample_sharding", "make_sharded_train_step", "shard_batch"]

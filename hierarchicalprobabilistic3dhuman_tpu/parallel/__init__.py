from hierarchicalprobabilistic3dhuman_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated_sharding, sample_sharding,
    flat_sample_sharding, constrain, distributed_init)
from hierarchicalprobabilistic3dhuman_tpu.parallel.sharded_train import (
    make_sharded_train_step, make_sharded_eval_step, make_sharded_apply,
    shard_batch)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "sample_sharding", "flat_sample_sharding", "constrain",
           "distributed_init", "make_sharded_train_step",
           "make_sharded_eval_step", "make_sharded_apply", "shard_batch"]

from graphphysics_tpu.parallel.mesh import (
    DATA_AXIS,
    GRAPH_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from graphphysics_tpu.parallel.dp import make_dp_train_step, merge_normalizer_states

__all__ = [
    "DATA_AXIS",
    "GRAPH_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_dp_train_step",
    "merge_normalizer_states",
]

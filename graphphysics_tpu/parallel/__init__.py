from graphphysics_tpu.parallel.mesh import (
    DATA_AXIS,
    GRAPH_AXIS,
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from graphphysics_tpu.parallel.dp import (
    graph_parallel_forward,
    make_dp_graph_parallel_train_step,
    make_dp_train_step,
    make_graph_parallel_train_step,
    merge_normalizer_states,
    partitioned_rollout,
)
from graphphysics_tpu.parallel.tp import (
    MODEL_AXIS,
    make_tp_train_step,
    shard_tp_state,
    tp_param_specs,
)
from graphphysics_tpu.parallel.pp import (
    PIPE_AXIS,
    make_pp_train_step,
    shard_pp_state,
)
from graphphysics_tpu.parallel.graph_partition import (
    partition_frames_np,
    partition_graph_halo_np,
    partition_graph_np,
    unpartition_rows,
)
from graphphysics_tpu.parallel.reorder import (
    halo_volume,
    inverse_permutation,
    locality_permutation,
    permute_graph_np,
)

__all__ = [
    "graph_parallel_forward",
    "make_graph_parallel_train_step",
    "partitioned_rollout",
    "partition_frames_np",
    "partition_graph_halo_np",
    "partition_graph_np",
    "unpartition_rows",
    "DATA_AXIS",
    "GRAPH_AXIS",
    "make_hybrid_mesh",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_dp_graph_parallel_train_step",
    "make_dp_train_step",
    "merge_normalizer_states",
    "MODEL_AXIS",
    "make_tp_train_step",
    "shard_tp_state",
    "tp_param_specs",
    "PIPE_AXIS",
    "make_pp_train_step",
    "shard_pp_state",
    "halo_volume",
    "inverse_permutation",
    "locality_permutation",
    "permute_graph_np",
]

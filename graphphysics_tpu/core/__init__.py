from graphphysics_tpu.core.graph import (
    Graph,
    bucket_size,
    concat_graphs,
    pad_graph_np,
    round_up,
    stack_graphs,
)
from graphphysics_tpu.core.nodetype import GLOBAL_ATTENTION_NODE, NodeType
from graphphysics_tpu.core import normalizer

__all__ = [
    "Graph",
    "NodeType",
    "GLOBAL_ATTENTION_NODE",
    "bucket_size",
    "concat_graphs",
    "pad_graph_np",
    "round_up",
    "stack_graphs",
    "normalizer",
]

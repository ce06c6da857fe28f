from graphphysics_tpu.ops.segment import (
    masked_segment_sum,
    segment_softmax,
)
from graphphysics_tpu.ops.attention import sparse_graph_attention

__all__ = [
    "masked_segment_sum",
    "segment_softmax",
    "sparse_graph_attention",
]

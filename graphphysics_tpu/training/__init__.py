from graphphysics_tpu.training.losses import (
    diagonal_gmm_nll_loss,
    gmm_nll_loss,
    l1_smooth_loss,
    l2_loss,
    node_type_mask,
)
from graphphysics_tpu.training.schedule import cosine_warmup_schedule

__all__ = [
    "l2_loss",
    "l1_smooth_loss",
    "diagonal_gmm_nll_loss",
    "gmm_nll_loss",
    "node_type_mask",
    "cosine_warmup_schedule",
]

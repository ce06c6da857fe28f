from graphphysics_tpu.training.losses import (
    diagonal_gmm_nll_loss,
    gmm_nll_loss,
    l1_smooth_loss,
    l2_loss,
    make_local_loss,
    node_type_mask,
)
from graphphysics_tpu.training.schedule import cosine_warmup_schedule

__all__ = [
    "l2_loss",
    "l1_smooth_loss",
    "diagonal_gmm_nll_loss",
    "gmm_nll_loss",
    "node_type_mask",
    "make_local_loss",
    "cosine_warmup_schedule",
    "Trainer",
    "rollout",  # the submodule (rollout.rollout is the function)
    "jitted_rollout",
    "jitted_batched_rollout",
    "rollout_rmse",
    "make_microbatch_train_step",
]


def __getattr__(name):
    # Lazy imports: Trainer pulls in the dataset layer; keep the base
    # `training` import light for kernel-only users.
    if name == "Trainer":
        from graphphysics_tpu.training.trainer import Trainer

        return Trainer
    # NB: bare "rollout" is NOT mapped here — it is the submodule (the
    # import system sets it as a package attribute; mapping it to the
    # function would be ambiguous, and a `from graphphysics_tpu.training
    # import rollout` inside this __getattr__ would recurse)
    if name in ("jitted_rollout", "jitted_batched_rollout", "rollout_rmse"):
        import graphphysics_tpu.training.rollout as _r

        return getattr(_r, name)
    if name == "make_microbatch_train_step":
        from graphphysics_tpu.training.microbatch import (
            make_microbatch_train_step,
        )

        return make_microbatch_train_step
    raise AttributeError(name)

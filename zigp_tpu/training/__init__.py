from .alternating import (
    init_alt_optimizers,
    make_alternating_device_step,
    partition_model,
)
from .batched import (
    fit_batched_scanned,
    fit_natgrad_batched,
    predict_batched_stacked,
    stack_pytrees,
    unstack_pytree,
)
from .data import DataSet
from .loop import FitResult, fit, make_train_step
from .natgrad import NaturalGradientTrainer, natgrad_update_diag
from .optim import adam_per_group, cosine_adam, make_optimizer
from .scan import fit_scanned, make_scan_train_step, stage_batches
from .scipy_opt import scipy_optimize

__all__ = [
    "DataSet",
    "fit",
    "FitResult",
    "make_train_step",
    "make_optimizer",
    "adam_per_group",
    "cosine_adam",
    "make_scan_train_step",
    "fit_scanned",
    "stage_batches",
    "scipy_optimize",
    "NaturalGradientTrainer",
    "natgrad_update_diag",
    "fit_batched_scanned",
    "fit_natgrad_batched",
    "predict_batched_stacked",
    "stack_pytrees",
    "unstack_pytree",
    "make_alternating_device_step",
    "init_alt_optimizers",
    "partition_model",
]

from .data import DataSet
from .loop import FitResult, fit, make_train_step
from .optim import adam_per_group, make_optimizer

__all__ = [
    "DataSet",
    "fit",
    "FitResult",
    "make_train_step",
    "make_optimizer",
    "adam_per_group",
]

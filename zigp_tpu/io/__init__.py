from . import checkpoint, datasets
from .datasets import Preprocessing, Split, kron_inducing_init, load_pptr, load_toydata, make_cv_splits

__all__ = [
    "checkpoint",
    "datasets",
    "Split",
    "load_toydata",
    "load_pptr",
    "make_cv_splits",
    "kron_inducing_init",
    "Preprocessing",
]

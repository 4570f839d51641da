from . import conditionals, gauss_kl, kernels, linalg, probit, quadrature
from .kernels import RBF, SquaredExponential

__all__ = [
    "conditionals",
    "gauss_kl",
    "kernels",
    "linalg",
    "probit",
    "quadrature",
    "RBF",
    "SquaredExponential",
]

"""zigp_tpu — TPU-native zero-inflated (on/off) Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``hegdepashupati/zero-inflated-gp`` (GPflow-0.4/TF1 reference): sparse
variational GPs with probit-gated zero-inflation, Kronecker spatio-temporal
structured inducing points, and the five model variants (onoff, svgp, scgp,
hurdle, zero-inflated GPC×GPR) on a single shared kernel/likelihood/
variational core.
"""

from . import core, io, likelihoods, models, ops, parallel, training, utils
from .core import bijectors, config
from .core.parameters import Parameter, param, positive_param

__version__ = "0.1.0"

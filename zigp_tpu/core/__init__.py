from . import bijectors, config, parameters
from .parameters import Parameter, param, positive_param

__all__ = ["bijectors", "config", "parameters", "Parameter", "param", "positive_param"]

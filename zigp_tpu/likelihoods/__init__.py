from .likelihoods import Bernoulli, Gamma, Gaussian, LogNormal, OnOffGaussian

__all__ = ["Gaussian", "OnOffGaussian", "Bernoulli", "LogNormal", "Gamma"]

from .likelihoods import Bernoulli, Gaussian, OnOffGaussian

__all__ = ["Gaussian", "OnOffGaussian", "Bernoulli"]

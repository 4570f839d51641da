from .composites import hurdle_combine, hurdle_on_indices, zero_inflated_combine
from .kron import (
    HurdlePrediction,
    KronGP,
    KronHurdleSVGP,
    KronOnOffSVGP,
    KronSVGP,
    gen_input_masks,
)
from .onoff import OnOffPrediction, OnOffSVGP
from .svgp import SVGP

__all__ = [
    "SVGP",
    "OnOffSVGP",
    "OnOffPrediction",
    "KronGP",
    "KronSVGP",
    "KronOnOffSVGP",
    "KronHurdleSVGP",
    "HurdlePrediction",
    "gen_input_masks",
    "zero_inflated_combine",
    "hurdle_combine",
    "hurdle_on_indices",
]

"""mmidv1_tpu — TPU-native epidemic modeling & Bayesian calibration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++ reference
``Mathematical-Modeling-Of-Infectious-Diseases-V1`` (age-structured SEPAIHRD model
of SARS-CoV-2 + classic SIR family + full Bayesian calibration and
post-calibration analysis stack). See SURVEY.md at the repo root for the layer map
this package implements.
"""

from . import constants
from .params import SEPAIHRDParams, make_params, beta_at, kappa_at, piecewise_value

__all__ = [
    "constants",
    "SEPAIHRDParams",
    "make_params",
    "beta_at",
    "kappa_at",
    "piecewise_value",
]

__version__ = "0.1.0"

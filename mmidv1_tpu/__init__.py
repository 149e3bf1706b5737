"""mmidv1_tpu — TPU-native epidemic modeling & Bayesian calibration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++ reference
``Mathematical-Modeling-Of-Infectious-Diseases-V1`` (age-structured SEPAIHRD model
of SARS-CoV-2 + classic SIR family + full Bayesian calibration and
post-calibration analysis stack). See SURVEY.md at the repo root for the layer map
this package implements.
"""

from . import constants
from .params import SEPAIHRDParams, make_params, beta_at, kappa_at, piecewise_value

# Subpackages (imported lazily by most users; listed here for discoverability):
#   mmidv1_tpu.models       SEPAIHRD + SIR family, interventions, result CSVs
#   mmidv1_tpu.ode          RK tableaus, fixed/adaptive integrators, fused folds
#   mmidv1_tpu.calibration  parameter spaces, objectives, PSO/hill/MH/NUTS
#   mmidv1_tpu.parallel     chains device mesh, sharded samplers, multihost
#   mmidv1_tpu.ops          Pallas kernels (fused solve+likelihood)
#   mmidv1_tpu.analysis     R0/Rt, metrics, PPC bands, report generation
#   mmidv1_tpu.cli          the reference's seven executables
#   mmidv1_tpu.data         reference-format config/data IO
#   mmidv1_tpu.utils        exceptions, logging, fileutils, checkpoint, native IO

__all__ = [
    "constants",
    "SEPAIHRDParams",
    "make_params",
    "beta_at",
    "kappa_at",
    "piecewise_value",
]

__version__ = "0.1.0"

"""Hand-written TPU kernels (Pallas) for the hot compute paths.

See ops/ANALYSIS.md at the repo root docs for the measured speed-of-light
analysis that motivates which paths get kernels.
"""

from .sepaihrd_adjoint import build_objective_pallas_grad
from .sepaihrd_pallas import build_objective_pallas, fused_objective

__all__ = ["build_objective_pallas", "build_objective_pallas_grad",
           "fused_objective"]

"""Poisson incidence objective for the age-structured SIR model.

Re-design of ``PoissonLikelihoodObjective``
(reference: ``src/sir_age_structured/objectives/PoissonLikelihoodObjective.cpp:46-144``):

    theta -> constrain -> AgeSIRParams -> ODE solve over the daily grid ->
    instantaneous incidence lambda(t) * S(t) at every output point
    (``SimulationResultProcessor::getIncidenceData``, :144-189) ->
    Poisson LL sum(max(y,0) * log(max(sim, 1e-9)) - sim) -> -inf on failure.

Pure, jit/vmap/grad-safe; the simulation cache and try/catch cascade of the
reference collapse into masking (SURVEY.md section 3.2 note).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..models.sir import AgeSIRParams, sir_incidence, solve_age_sir
from .param_space import CLAMP
from .sir_space import SIRParameterSpace

SIM_FLOOR = 1e-9   # reference: y_sim.cwiseMax(1e-9) (:129)


def build_sir_objective(
    space: SIRParameterSpace,
    base_params: AgeSIRParams,
    observed_incidence: np.ndarray,
    ts: np.ndarray,
    initial_state: np.ndarray,
    *,
    substeps: int = 4,
    tableau: str = "dopri5",
    constraint_mode: str = CLAMP,
    dtype=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``loglik(theta) -> scalar`` for the age-SIR calibration.

    ``observed_incidence``: (T, A) new confirmed cases (the reference uses
    ``CalibrationData::getNewConfirmedCases``, ``CalibrationDemo.cpp:50``).
    """
    if dtype is None:
        dtype = base_params.N.dtype
    ts_j = jnp.asarray(np.asarray(ts), dtype=dtype)
    obs = jnp.asarray(np.asarray(observed_incidence), dtype=dtype)
    if obs.shape[0] != ts_j.shape[0]:
        raise ValueError(
            f"observed incidence has {obs.shape[0]} rows but the time grid has "
            f"{ts_j.shape[0]} points")
    y0 = jnp.asarray(np.asarray(initial_state), dtype=dtype)
    obs_clamped = jnp.maximum(obs, 0.0)

    def loglik(theta: jnp.ndarray) -> jnp.ndarray:
        theta = space.constrain(theta.astype(dtype), constraint_mode)
        params = space.apply(base_params, theta)
        traj = solve_age_sir(params, y0, ts_j, method="fixed",
                             substeps=substeps, tableau=tableau)
        sim = jnp.maximum(sir_incidence(params, traj), SIM_FLOOR)
        ll = jnp.sum(obs_clamped * jnp.log(sim) - sim)
        bad = ~jnp.isfinite(ll) | ~jnp.all(jnp.isfinite(traj))
        return jnp.where(bad, -jnp.inf, ll)

    return loglik

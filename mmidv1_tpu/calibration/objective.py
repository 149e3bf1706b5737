"""SEPAIHRD Poisson log-likelihood objective as one fused, batched computation.

TPU-native re-design of the reference's hot path,
``SEPAIHRDObjectiveFunction::calculate``
(``src/model/objectives/SEPAIHRDObjectiveFunction.cpp:62-279``):

    theta -> constrain -> params -> initial state (run-up seeding / multipliers,
    feasibility) -> ODE solve -> daily incidence of D/CumH/CumICU
    (row 0 anchored to the initial state, clamped >= 0) -> 3-stream Poisson LL
    over post-run-up rows -> -inf on any failure.

Daily incidence is computed by RESETTING the pure-accumulator rows
(D/CumH/CumICU — nothing in the RHS reads them) to zero at the start of every
daily interval, so a day's incidence is the row value itself at day end. In
exact arithmetic this equals the reference's diff-of-cumulatives
(``SEPAIHRDObjectiveFunction.cpp:191-215``); in float32 it cuts the
evaluation noise ~an order of magnitude, because each day's term carries
roundoff relative to the DAY increment (~1e2-1e4) instead of the running
cumulative (~1e5-1e6) — the acceptance-ceiling fix of OPS_ANALYSIS.md's
"step-size death spiral" section.

Everything the C++ version does with a simulation cache, thread-local cloned
models, and OpenMP reductions collapses into a pure function: the likelihood is a
``lax.scan`` over daily intervals that accumulates the Poisson terms on the fly
(``fold_times_fixed``), so an MCMC/PSO step never materializes a trajectory in
HBM, and parallel evaluation over thousands of theta vectors is ``jax.vmap``.
The cache is deliberately dropped: a cache hit cannot beat recomputation when the
whole swarm solves in one fused kernel launch (SURVEY.md section 3.2 note).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..data.calibration_data import CalibrationData
from ..models import sepaihrd
from ..ode import fold_times_fixed
from ..params import SEPAIHRDParams
from .param_space import CLAMP, ParameterSpace

# Observed stream order in CalibrationData.observed_streams(): (hosp, icu, deaths)
# -> model rows (CumH, CumICU, D).
_MODEL_ROWS_FOR_OBS = np.array([C.CUMH, C.CUMICU, C.D])


def lowest(dtype) -> jnp.ndarray:
    """The jit-safe analogue of std::numeric_limits<double>::lowest()."""
    return jnp.asarray(jnp.finfo(dtype).min, dtype=dtype)


def make_time_grid(runup_days: float, num_days: int) -> np.ndarray:
    """Fixed observation grid t = -int(runup_days) .. num_days-1
    (reference ``main.cpp:241-256``; note the int cast of runup_days, and that the
    grid stays fixed even when runup_days is calibrated)."""
    return np.arange(-int(runup_days), num_days, dtype=np.float64)


def build_objective(
    space: ParameterSpace,
    base_params: SEPAIHRDParams,
    data: CalibrationData,
    ts: np.ndarray,
    *,
    base_initial_state: Optional[jnp.ndarray] = None,
    substeps: int = 4,
    tableau: str = "dopri5",
    constraint_mode: str = CLAMP,
    dtype=None,
    compensated: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``loglik(theta) -> scalar`` (jit/vmap/shard-ready).

    ``base_initial_state``: the data-inferred day-0 state used by the multiplier
    branch (reference caches it once per calibration,
    ``SEPAIHRDModelCalibration.cpp:73-132``); defaults to
    ``data.initial_sepaihrd_state`` evaluated at the base parameters.
    """
    if dtype is None:
        dtype = base_params.dtype
    ts = np.asarray(ts, dtype=np.float64)
    runup_offset = int(np.searchsorted(ts, 0.0, side="left"))
    num_obs = len(ts) - runup_offset
    if num_obs != data.n_data_points:
        raise ValueError(
            f"time grid has {num_obs} observation points but data has "
            f"{data.n_data_points} (reference returns lowest() here; we fail fast)")

    if base_initial_state is None:
        base_initial_state = data.initial_sepaihrd_state(
            sigma=base_params.sigma, gamma_p=base_params.gamma_p,
            gamma_A=base_params.gamma_A, gamma_I=base_params.gamma_I,
            p=base_params.p, h=base_params.h)
    base_y0 = np.asarray(base_initial_state, dtype=dtype)

    # Observed streams as HOST constants, with validity masks
    # (NaN/negative observations are skipped: SEPAIHRDObjectiveFunction.cpp:268).
    # NumPy, not device arrays: closure constants lower to MLIR literals
    # without a per-constant device->host fetch (see params._as_f).
    obs = np.stack([np.asarray(data.new_hospitalizations),
                    np.asarray(data.new_icu),
                    np.asarray(data.new_deaths)]).astype(dtype)
    obs_valid = np.isfinite(obs) & (obs >= 0)
    obs_clean = np.where(obs_valid, obs, 0.0).astype(dtype)

    ts_j = np.asarray(ts, dtype=dtype)
    eps = np.asarray(C.POISSON_EPSILON, dtype=dtype)
    model_rows = _MODEL_ROWS_FOR_OBS
    obs_t = np.moveaxis(obs_clean, 1, 0)       # (T_obs, 3, A)
    obs_valid_t = np.moveaxis(obs_valid, 1, 0)

    def loglik(theta: jnp.ndarray) -> jnp.ndarray:
        theta = space.constrain(theta.astype(dtype), constraint_mode)
        params = space.apply(base_params, theta)
        y0, infeasible = sepaihrd.initial_state_for_params(params, base_y0)

        ctx = sepaihrd.interval_beta_eff(params, ts_j)
        f = lambda t, y, beta_eff: sepaihrd.rhs_frozen(t, y, params, beta_eff)

        def reset_accumulators(y):
            # D/CumH/CumICU are pure accumulators (the RHS never reads them):
            # restart them at zero each daily interval so the day-end value IS
            # the day's incidence — see the module docstring (f32 noise floor).
            return y.at[model_rows].set(0.0)

        def fold(acc, i, y):
            ll, comp = acc
            cur = y[model_rows]                        # (3, A) day increments
            # i == 0 is y0 itself: row 0 incidence is 0 by anchoring
            # (reference :192-208 anchors row 0 to the initial state).
            inc = jnp.where(i == 0, 0.0, jnp.maximum(cur, 0.0)) + eps
            j = i - runup_offset
            in_obs = (j >= 0) & (j < num_obs)
            jc = jnp.clip(j, 0, num_obs - 1)
            o = jax.lax.dynamic_index_in_dim(obs_t, jc, keepdims=False)  # (3, A)
            v = jax.lax.dynamic_index_in_dim(obs_valid_t, jc, keepdims=False)
            term = jnp.sum(jnp.where(v, o * jnp.log(inc) - inc, 0.0))
            # Kahan-compensated accumulation: the plain running sum of ~300
            # O(1e4) terms carries O(1) float32 noise, which is enough to
            # perturb MCMC accept decisions near the optimum.
            contrib = jnp.where(in_obs, term, 0.0) - comp
            ll_new = ll + contrib
            comp = (ll_new - ll) - contrib
            return ll_new, comp

        init = (jnp.zeros((), dtype=dtype), jnp.zeros((), dtype=dtype))
        (ll, _comp), _yf = fold_times_fixed(f, y0, ts_j, fold, init,
                                            substeps=substeps, method=tableau,
                                            interval_ctx=ctx,
                                            compensated=compensated,
                                            pre_interval=reset_accumulators)
        bad = infeasible | jnp.isnan(ll) | jnp.isinf(ll)
        return jnp.where(bad, lowest(dtype), ll)

    return loglik


def build_incidence_fn(
    space: ParameterSpace,
    base_params: SEPAIHRDParams,
    data: CalibrationData,
    ts: np.ndarray,
    *,
    base_initial_state: Optional[jnp.ndarray] = None,
    substeps: int = 4,
    tableau: str = "dopri5",
    constraint_mode: str = CLAMP,
    dtype=None,
):
    """Build ``incidence(theta) -> (traj, daily)`` for posterior predictives:

    - ``traj``: the full (T, 11, A) trajectory
    - ``daily``: (3, T_obs, A) simulated daily (hosp, icu, deaths) on the
      observation window, computed with the same anchoring/clamping as the
      objective (reference ``ResultAggregator.cpp:296-336``).
    """
    if dtype is None:
        dtype = base_params.dtype
    ts = np.asarray(ts, dtype=np.float64)
    runup_offset = int(np.searchsorted(ts, 0.0, side="left"))
    num_obs = len(ts) - runup_offset
    if num_obs != data.n_data_points:
        raise ValueError(f"time grid has {num_obs} observation points but "
                         f"data has {data.n_data_points}")

    if base_initial_state is None:
        base_initial_state = data.initial_sepaihrd_state(
            sigma=base_params.sigma, gamma_p=base_params.gamma_p,
            gamma_A=base_params.gamma_A, gamma_I=base_params.gamma_I,
            p=base_params.p, h=base_params.h)
    base_y0 = jnp.asarray(base_initial_state, dtype=dtype)
    ts_j = jnp.asarray(ts, dtype=dtype)

    def incidence(theta: jnp.ndarray):
        theta = space.constrain(theta.astype(dtype), constraint_mode)
        params = space.apply(base_params, theta)
        y0, _inf = sepaihrd.initial_state_for_params(params, base_y0)
        traj = sepaihrd.solve(params, y0, ts_j, method="fixed", substeps=substeps,
                              tableau=tableau)
        cums = traj[:, _MODEL_ROWS_FOR_OBS]          # (T, 3, A)
        diffs = jnp.diff(cums, axis=0)
        row0 = jnp.zeros_like(cums[:1])
        daily_full = jnp.concatenate([row0, diffs], axis=0)
        daily = jnp.maximum(daily_full[runup_offset:], 0.0)   # (T_obs, 3, A)
        return traj, jnp.moveaxis(daily, 0, 1)                # (3, T_obs, A)

    return incidence

"""Age-structured SEPAIHRD model: fused RHS + initial-state construction.

TPU-native re-design of ``AgeSEPAIHRDModel`` (reference:
``src/model/AgeSEPAIHRDModel.cpp:101-228``) and of the initial-state plumbing in
``src/utils/GetCalibrationData.cpp:107-234`` / ``src/model/main.cpp:263-316`` /
``src/model/objectives/SEPAIHRDObjectiveFunction.cpp:124-163``.

Design notes (TPU-first):

- The state is a ``(11, n_ages)`` array (compartment-major). All flows are computed
  as fused elementwise vector ops over the age axis; the force-of-infection contact
  matvec is a tiny ``(A, A) @ (A,)`` contraction that XLA fuses with the surrounding
  elementwise work. With a trailing batch axis (vmap over chains) the arrays become
  ``(11, A, B)`` so the batch rides the TPU lane dimension.

- There is no mutable model object, no cloning, no mutexes: the parameters are an
  input pytree, so parallel evaluation (PSO swarms, MCMC ensembles) is just ``vmap``.

- Equations (reference ``Readme.md:134-177`` and ``AgeSEPAIHRDModel.cpp:152-227``)::

    pi_j    = (P_j + A_j + theta * I_j) * h_infec_j / N_j
    lambda_i = beta(t) * kappa(t) * a_i * sum_j M_ij pi_j     (clamped >= 0)
    dS  = -lambda * S
    dE  = lambda * S - sigma * E
    dP  = sigma * E - gamma_p * P
    dA  = p * gamma_p * P - gamma_A * A
    dI  = (1-p) * gamma_p * P - (gamma_I + h + d_community) * I
    dH  = h * I - (gamma_H + d_H + icu) * H
    dICU= icu * H - (gamma_ICU + d_ICU) * ICU
    dR  = gamma_A * A + gamma_I * I + gamma_H * H + gamma_ICU * ICU
    dD  = d_H * H + d_ICU * ICU + d_community * I
    dCumH = h * I ;  dCumICU = icu * H
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from ..params import SEPAIHRDParams, beta_at, kappa_at

STATE_SHAPE_DOC = "(11, n_ages): rows S,E,P,A,I,H,ICU,R,D,CumH,CumICU"


def _contact_matvec(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(A, A) @ (A,) as an exact broadcast-multiply + sum.

    NOT ``M @ v``: TPU float32 matmuls multiply in bfloat16 by default, which
    injects ~1e-3 relative noise into the force of infection and, integrated
    over a year, tens-to-hundreds of log-likelihood units — enough to break
    MCMC acceptance (see OPS_ANALYSIS.md). The A=4 contraction is cheaper on
    the VPU anyway."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def inv_population(params: SEPAIHRDParams) -> jnp.ndarray:
    """Safe 1/N per age group (reference ``AgeSEPAIHRDModel.cpp:46-49``)."""
    return jnp.where(params.N > C.MIN_POPULATION_FOR_DIVISION, 1.0 / params.N, 0.0)


def force_of_infection(params: SEPAIHRDParams, y: jnp.ndarray, t) -> jnp.ndarray:
    """lambda_i(t) >= 0, shape (n_ages,).

    Reference: ``AgeSEPAIHRDModel::computeDerivatives`` lines 152-196.
    """
    P_ = y[C.P]
    A_ = y[C.A]
    I_ = y[C.I]
    inf_pressure = (P_ + A_ + params.theta * I_) * params.h_infec * inv_population(params)
    lam = _contact_matvec(params.contact_matrix(), inf_pressure)
    beta_eff = beta_at(params, t) * kappa_at(params, t)
    lam = beta_eff * params.a * lam
    return jnp.maximum(lam, 0.0)


def rhs(t, y: jnp.ndarray, params: SEPAIHRDParams) -> jnp.ndarray:
    """Time derivative of the (11, n_ages) SEPAIHRD state. Pure and
    jit/vmap/grad-safe. Exactly :func:`rhs_frozen` with the schedule factor
    evaluated at ``t`` — one flow body on purpose, so the equations cannot
    drift between the schedule-aware and frozen paths."""
    return rhs_frozen(t, y, params, beta_at(params, t) * kappa_at(params, t))


def rhs_frozen(t, y: jnp.ndarray, params: SEPAIHRDParams, beta_eff) -> jnp.ndarray:
    """RHS with the time-varying factor beta(t)*kappa(t) frozen to ``beta_eff``.

    Used with the integrators' per-interval context: the schedules are constant
    within each daily output interval (breakpoints align with the grid), so this
    solves the identical ODE while (a) removing the O(h) contamination an RK stage
    evaluated exactly at a breakpoint would inject into the following interval and
    (b) hoisting the searchsorted lookups out of the stage loop entirely.
    """
    del t
    S_, E_, P_, A_, I_, H_, ICU_ = (y[C.S], y[C.E], y[C.P], y[C.A], y[C.I], y[C.H],
                                    y[C.ICU])

    inf_pressure = (P_ + A_ + params.theta * I_) * params.h_infec * inv_population(params)
    lam = _contact_matvec(params.contact_matrix(), inf_pressure)
    lam = jnp.maximum(beta_eff * params.a * lam, 0.0)

    flow_SE = lam * S_
    flow_EP = params.sigma * E_
    flow_P_out = params.gamma_p * P_
    flow_PA = params.p * flow_P_out
    flow_PI = flow_P_out - flow_PA

    flow_IH = params.h * I_
    flow_IR = params.gamma_I * I_
    flow_ID_comm = params.d_community * I_

    flow_H_ICU = params.icu * H_

    dS = -flow_SE
    dE = flow_SE - flow_EP
    dP = flow_EP - flow_P_out
    dA = flow_PA - params.gamma_A * A_
    dI = flow_PI - (flow_IR + flow_IH + flow_ID_comm)
    dH = flow_IH - (params.gamma_H * H_ + params.d_H * H_ + flow_H_ICU)
    dICU = flow_H_ICU - (params.gamma_ICU + params.d_ICU) * ICU_
    dR = params.gamma_A * A_ + flow_IR + params.gamma_H * H_ + params.gamma_ICU * ICU_
    dD = params.d_H * H_ + params.d_ICU * ICU_ + flow_ID_comm
    dCumH = flow_IH
    dCumICU = flow_H_ICU

    return jnp.stack([dS, dE, dP, dA, dI, dH, dICU, dR, dD, dCumH, dCumICU])


def interval_beta_eff(params: SEPAIHRDParams, ts: jnp.ndarray) -> jnp.ndarray:
    """Per-output-interval effective transmission factor beta(t)*kappa(t),
    evaluated at interval midpoints (schedule-constant within each interval)."""
    mids = 0.5 * (ts[:-1] + ts[1:])
    return beta_at(params, mids) * kappa_at(params, mids)


def solve(params: SEPAIHRDParams, y0: jnp.ndarray, ts, *, method="fixed",
          tableau="dopri5", substeps=4, atol=1e-6, rtol=1e-6, dt0=1.0,
          freeze_schedules=True):
    """Integrate the SEPAIHRD ODE over the output grid ``ts``.

    ``method``: "fixed" (TPU throughput / differentiable path; ``substeps`` equal
    Dopri5 steps per interval) or "adaptive" (odeint ``integrate_times`` semantics,
    reference ``Simulator.cpp:60-150``). Returns a ``(len(ts), 11, A)`` trajectory.

    ``freeze_schedules`` evaluates beta(t)*kappa(t) once per output interval (at the
    midpoint). This is exact whenever schedule breakpoints align with ``ts`` (the
    Spain-2020 configuration: integer-day grid, integer-day NPI periods) and is both
    faster and more accurate than stage-time lookups; set False for non-aligned
    breakpoints under the adaptive method.
    """
    from ..ode import integrate_times, integrate_times_fixed

    ts = jnp.asarray(ts, dtype=y0.dtype)
    if freeze_schedules:
        ctx = interval_beta_eff(params, ts)
        f = lambda t, y, beta_eff: rhs_frozen(t, y, params, beta_eff)
    else:
        ctx = None
        f = lambda t, y: rhs(t, y, params)
    if method == "fixed":
        return integrate_times_fixed(f, y0, ts, substeps=substeps, method=tableau,
                                     interval_ctx=ctx)
    elif method == "adaptive":
        return integrate_times(f, y0, ts, atol=atol, rtol=rtol, dt0=dt0,
                               method=tableau, interval_ctx=ctx)
    raise ValueError(f"unknown method {method!r}")


def state_names(n_ages: int) -> list[str]:
    """Flat state names matching ``AgeSEPAIHRDModel::getStateNames``
    (reference ``src/model/AgeSEPAIHRDModel.cpp:251-259``): S0..S3, E0..E3, ..."""
    from .results import state_names as _flat_names
    return _flat_names(C.COMPARTMENTS, n_ages)


def infer_initial_state(
    *,
    N: jnp.ndarray,
    cumulative_confirmed_day0: jnp.ndarray,
    cumulative_deaths_day0: jnp.ndarray,
    cumulative_hosp_day0: jnp.ndarray,
    cumulative_icu_day0: jnp.ndarray,
    sigma,
    gamma_p,
    gamma_A,
    gamma_I,
    p: jnp.ndarray,
    h: jnp.ndarray,
) -> jnp.ndarray:
    """Quasi-steady-state back-inference of the day-0 SEPAIHRD state from data.

    Faithful port of ``CalibrationData::getInitialSEPAIHRDState`` (reference:
    ``src/utils/GetCalibrationData.cpp:107-234``), vectorized over ages:

    1. anchor D0/H0/ICU0/CumH0/CumICU0 from day-0 cumulative data;
    2. I0 = max(cum_confirmed0 - D0, 0);
    3. infer P0 = I0*gamma_I/((1-p)*gamma_p), A0 = P0*p*gamma_p/gamma_A,
       E0 = P0*gamma_p/sigma (with the reference's small-denominator fallbacks);
    4. clamp each anchored compartment into the remaining population budget,
       rescale (E0,P0,A0) jointly to fit, and set S = N - sum(others).

    The ``h`` argument is accepted for signature parity (the reference takes it but
    does not use it in the inference).
    """
    del h
    A = N.shape[-1]
    dtype = N.dtype
    z = jnp.zeros((A,), dtype=dtype)

    D0 = jnp.maximum(cumulative_deaths_day0, 0.0)
    H0 = jnp.maximum(cumulative_hosp_day0, 0.0)
    ICU0 = jnp.maximum(cumulative_icu_day0, 0.0)
    CumH0 = H0
    CumICU0 = ICU0

    I0 = jnp.maximum(cumulative_confirmed_day0 - D0, 0.0)

    p_c = jnp.clip(p, 0.0, 1.0)
    one_minus_p = 1.0 - p_c

    P0 = jnp.where((gamma_p > 1e-9) & (one_minus_p > 1e-9),
                   I0 * gamma_I / jnp.where(one_minus_p > 1e-9, one_minus_p * gamma_p, 1.0),
                   I0)
    A0 = jnp.where(gamma_A > 1e-9, P0 * p_c * gamma_p / jnp.where(gamma_A > 1e-9, gamma_A, 1.0),
                   P0 * p_c)
    E0 = jnp.where(sigma > 1e-9, P0 * gamma_p / jnp.where(sigma > 1e-9, sigma, 1.0), P0)

    E0 = jnp.maximum(E0, 0.0)
    P0 = jnp.maximum(P0, 0.0)
    A0 = jnp.maximum(A0, 0.0)
    R0 = z

    # Sequential population-budget clamping (GetCalibrationData.cpp:168-174)
    D0 = jnp.minimum(D0, N)
    ICU0 = jnp.minimum(ICU0, jnp.maximum(0.0, N - D0))
    H0 = jnp.minimum(H0, jnp.maximum(0.0, N - D0 - ICU0))
    I0 = jnp.minimum(I0, jnp.maximum(0.0, N - D0 - ICU0 - H0))
    R0 = jnp.minimum(R0, jnp.maximum(0.0, N - D0 - ICU0 - H0 - I0))

    # Joint rescale of inferred (E,P,A) into the remaining budget (:182-196)
    sum_set = I0 + H0 + ICU0 + R0 + D0
    sum_inferred = E0 + P0 + A0
    available = jnp.maximum(N - sum_set, 0.0)
    scale = jnp.where(sum_inferred > available,
                      jnp.where(sum_inferred > 1e-9, available / jnp.where(sum_inferred > 1e-9, sum_inferred, 1.0), 0.0),
                      1.0)
    E0, P0, A0 = E0 * scale, P0 * scale, A0 * scale

    S0 = jnp.maximum(0.0, N - (E0 + P0 + A0 + I0 + H0 + ICU0 + R0 + D0))

    return jnp.stack([S0, E0, P0, A0, I0, H0, ICU0, R0, D0, CumH0, CumICU0])


def runup_seeded_state(params: SEPAIHRDParams, base_state: jnp.ndarray) -> jnp.ndarray:
    """Run-up seeding: E = seed_exposed * age_fraction at t = -runup_days, all other
    non-S compartments zero, S = N - E.

    Reference: ``src/model/main.cpp:274-316`` and
    ``SEPAIHRDObjectiveFunction.cpp:131-143``. The caller decides (statically or via
    ``jnp.where``) whether seeding or multipliers apply.
    """
    del base_state
    N = params.N
    total = jnp.sum(N, axis=-1, keepdims=True)
    age_fraction = jnp.where(total > 0, N / total, jnp.zeros_like(N))
    E0 = params.seed_exposed * age_fraction
    y = jnp.zeros((C.NUM_COMPARTMENTS,) + N.shape, dtype=N.dtype)
    y = y.at[C.E].set(E0)
    y = y.at[C.S].set(N - E0)
    return y


def multiplier_scaled_state(params: SEPAIHRDParams, base_state: jnp.ndarray):
    """Apply E0..D0 multipliers to a data-inferred state; returns the scaled state
    with S recomputed as N - sum(E..D) and an infeasibility flag.

    Reference: ``SEPAIHRDObjectiveFunction.cpp:144-163``: if the non-S compartments
    exceed N for any age group the objective returns lowest(); here we return the
    mask so callers can apply it under jit.
    """
    mults = jnp.stack([
        params.E0_multiplier, params.P0_multiplier, params.A0_multiplier,
        params.I0_multiplier, params.H0_multiplier, params.ICU0_multiplier,
        params.R0_multiplier, params.D0_multiplier,
    ])
    # base_state may be a host (NumPy) constant — see utils.hostdev
    y = jnp.asarray(base_state)
    y = y.at[C.E:C.D + 1].set(y[C.E:C.D + 1] * mults[:, None])
    sum_non_S = jnp.sum(y[C.E:C.D + 1], axis=0)
    infeasible = jnp.any(sum_non_S > params.N)
    y = y.at[C.S].set(params.N - sum_non_S)
    return y, infeasible


def initial_state_for_params(params: SEPAIHRDParams, base_state: jnp.ndarray):
    """Initial state used by the objective for a given parameter vector.

    Matches ``SEPAIHRDObjectiveFunction::calculate`` lines 124-163: if
    ``runup_days > 0 and seed_exposed > 0`` use run-up seeding, else apply the
    multipliers; in both branches S is recomputed as N - sum(non-S people
    compartments) and infeasibility (sum > N) is flagged.

    Returns ``(state, infeasible_mask)``; both jit/vmap-safe.
    """
    seeded = runup_seeded_state(params, base_state)
    scaled, infeasible_m = multiplier_scaled_state(params, base_state)
    use_seed = (params.runup_days > 0) & (params.seed_exposed > 0)
    y = jnp.where(use_seed, seeded, scaled)
    # Seeded branch is infeasible only if seed exceeds population (practically never).
    seed_infeasible = jnp.any(jnp.sum(seeded[C.E:C.D + 1], axis=0) > params.N)
    infeasible = jnp.where(use_seed, seed_infeasible, infeasible_m)
    return y, infeasible

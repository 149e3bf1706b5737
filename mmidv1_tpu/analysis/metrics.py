"""EssentialMetrics: per-run epidemiological summary — vectorized, vmappable.

Re-design of ``MetricsCalculator::calculateEssentialMetrics``
(reference: ``src/model/MetricsCalculator.cpp:8-172``) as one pure function of
a (T, 11, A) trajectory; a whole posterior ensemble's metrics are
``jax.vmap(essential_metrics)`` over a (B, T, 11, A) batched replay instead of
the reference's per-sample loop + simulation cache.

Fidelity notes:
- The reference accumulates new infections with ``params.beta`` — the SCALAR
  beta field, which is 0.0 for any configuration that defines beta only as a
  schedule (e.g. the committed Spain-2020 ``initial_guess.txt``), zeroing all
  attack rates and infection ratios (``MetricsCalculator.cpp:111``). The
  documented model equation uses beta(t) (``AgeSEPAIHRDModel.cpp:159-182``),
  so this implementation defaults to the time-varying beta;
  ``use_scalar_beta=True`` reproduces the reference's literal behavior.
- dt for the first step is 1.0 (``:74``); the infectious load omits h_infec
  (``:104-110``), both mirrored exactly.
- IFR/IHR/IICUR are clamped to [0, 1] and zeroed below 1 cumulative
  infection (``:143-164``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants as C
from ..params import SEPAIHRDParams, beta_at, kappa_at
from .reproduction import calculate_r0, rt_trajectory

SERO_TARGET_DAY = 64.0   # ENE-COVID round 1 reference day (May 4th)


def essential_metrics(params: SEPAIHRDParams, traj: jnp.ndarray,
                      ts: jnp.ndarray, initial_state: jnp.ndarray,
                      *, use_scalar_beta: bool = False,
                      target_day: float = SERO_TARGET_DAY) -> Dict[str, jnp.ndarray]:
    """All EssentialMetrics fields as a dict of arrays (jit/vmap-safe)."""
    ts = jnp.asarray(ts, dtype=traj.dtype)
    A = traj.shape[-1]
    N = params.N
    total_pop = jnp.sum(N)

    S_t = traj[:, C.S]                                  # (T, A)
    P_t, A_t, I_t = traj[:, C.P], traj[:, C.A], traj[:, C.I]
    H_t, ICU_t = traj[:, C.H], traj[:, C.ICU]

    # --- Rt statistics ----------------------------------------------------
    rt = rt_trajectory(params, traj, ts)
    max_rt, min_rt, final_rt = jnp.max(rt), jnp.min(rt), rt[-1]

    # --- peaks (first maximum, like the strict > comparison of :92-101) ----
    total_H, total_ICU = jnp.sum(H_t, axis=1), jnp.sum(ICU_t, axis=1)
    iH, iICU = jnp.argmax(total_H), jnp.argmax(total_ICU)
    peak_h, t_peak_h = total_H[iH], ts[iH]
    peak_icu, t_peak_icu = total_ICU[iICU], ts[iICU]

    # --- cumulative infections: init non-S + integral of lambda*S*dt -------
    # reference counts E0+P0+A0+I0+H0+ICU0+R0 (:41) — D excluded
    init_infections = jnp.sum(initial_state[C.E:C.R + 1], axis=0)
    load = (P_t + A_t + params.theta * I_t) / jnp.maximum(N[None, :], 1e-9)
    load = jnp.where(N[None, :] > 1e-9, load, 0.0)
    beta_t = (params.beta if use_scalar_beta
              else beta_at(params, ts))                              # () or (T,)
    lam = (jnp.asarray(beta_t) * kappa_at(params, ts))[:, None] * \
        jnp.matmul(load, params.M_baseline.T,
                   precision=jax.lax.Precision.HIGHEST)              # (T, A)
    dt = jnp.concatenate([jnp.ones((1,), ts.dtype), jnp.diff(ts)])
    cum_infections = init_infections + jnp.sum(lam * S_t * dt[:, None], axis=0)

    # --- seroprevalence at the grid point nearest target_day ---------------
    t_idx = jnp.argmin(jnp.abs(ts - target_day))
    sero_day64 = (total_pop - jnp.sum(S_t[t_idx])) / total_pop

    # --- final-vs-initial cumulative flows ---------------------------------
    cum_deaths = traj[-1, C.D] - initial_state[C.D]
    cum_hosp = traj[-1, C.CUMH] - initial_state[C.CUMH]
    cum_icu = traj[-1, C.CUMICU] - initial_state[C.CUMICU]

    total_infections = jnp.sum(cum_infections)
    overall_ifr = jnp.where(total_infections > 1e-9,
                            jnp.sum(cum_deaths) / total_infections, 0.0)

    # --- age-specific ratios with the reference's guards -------------------
    enough = cum_infections > 1.0          # MIN_INFECTIONS_FOR_RATIO
    denom = jnp.where(enough, cum_infections, 1.0)
    ratio = lambda num: jnp.where(enough, jnp.clip(num / denom, 0.0, 1.0), 0.0)

    out = {
        "R0": calculate_r0(params),
        "max_Rt": max_rt, "min_Rt": min_rt, "final_Rt": final_rt,
        "peak_hospital": peak_h, "time_to_peak_hospital": t_peak_h,
        "peak_ICU": peak_icu, "time_to_peak_ICU": t_peak_icu,
        "total_deaths": jnp.sum(cum_deaths),
        "overall_attack_rate": total_infections / total_pop,
        "overall_IFR": overall_ifr,
        "seroprevalence_day64": sero_day64,
        "IFR_age": ratio(cum_deaths),
        "IHR_age": ratio(cum_hosp),
        "IICUR_age": ratio(cum_icu),
        "AttackRate_age": jnp.where(N > 0,
                                    cum_infections / jnp.where(N > 0, N, 1.0),
                                    0.0),
        "kappa_values": params.kappa_values,
    }
    return out


def seroprevalence_trajectory(params: SEPAIHRDParams,
                              traj: jnp.ndarray) -> jnp.ndarray:
    """(N_total - sum_S(t)) / N_total per output point
    (``MetricsCalculator::calculateSeroprevalenceTrajectory``, :200-226)."""
    total_pop = jnp.sum(params.N)
    return (total_pop - jnp.sum(traj[:, C.S], axis=-1)) / total_pop

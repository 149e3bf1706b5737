"""Classic SIR model family: deterministic, vital dynamics, stochastic, age-structured.

TPU-native re-design of the reference's GSL-based scalar models
(``src/base/SIRModel.cpp``, ``src/base/SIR_population_variable.cpp``,
``src/base/SIR_stochastic.cpp``) and the mutex-guarded ``AgeSIRModel``
(``src/sir_age_structured/AgeSIRModel.cpp``). All models are pure functions:

- :func:`sir_rhs` / :func:`sir_vital_rhs`: the scalar ODE right-hand sides
  (GSL RKF45 in the reference -> any tableau from :mod:`mmidv1_tpu.ode` here)
- :func:`equilibria`: DFE / R0 / endemic equilibrium of the vital-dynamics model
  (``SIR_population_variable.cpp:46-73``)
- :func:`run_stochastic_sir`: the Bailey-style binomial chain
  (``SIR_stochastic.cpp:144-208``), vmapped over simulations under one jit — the
  reference loops simulations serially with a GSL RNG
- :func:`run_gillespie_sir`: an exact Gillespie SSA. The reference README claims
  a Gillespie variant but ships none (SURVEY.md section 2, L3 notes); this
  implements it for real, with trajectories sampled onto a uniform grid
- :func:`stochastic_statistics`: per-step mean/median/p5/p95 across simulations
  (``SIR_stochastic.cpp:211-255``) as one vectorized quantile reduction
- :func:`age_sir_rhs`: the age-structured SIR with zero-clamped outflows from
  near-empty compartments (``AgeSIRModel.cpp:106-139``); interventions are pure
  parameter transformations (:func:`apply_age_sir_intervention`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.exceptions import InterventionException


# --------------------------------------------------------------------------
# Scalar SIR (reference src/base/SIRModel.cpp)
# --------------------------------------------------------------------------

class SIRParams(NamedTuple):
    """Parameters of the scalar models (mirrors ``ModelParameters``,
    ``include/base/ModelParameters.hpp``)."""

    N: float
    beta: float
    gamma: float
    B: float = 0.0    # birth rate (vital dynamics only)
    mu: float = 0.0   # natural death rate (vital dynamics only)


def sir_rhs(t, y, p: SIRParams):
    """Classic SIR: y = (S, I, R)."""
    del t
    S, I, _R = y[0], y[1], y[2]
    inc = jnp.where(p.N > 0, p.beta * S * I / p.N, 0.0)
    return jnp.stack([-inc, inc - p.gamma * I, p.gamma * I])


def sir_vital_rhs(t, y, p: SIRParams):
    """SIR with births B and per-capita mortality mu; N is the live sum
    (``SIR_population_variable.cpp:21-44``)."""
    del t
    S, I, R = y[0], y[1], y[2]
    n = S + I + R
    inc = jnp.where(n > 0, p.beta * S * I / n, 0.0)
    dS = p.B - inc - p.mu * S
    dI = inc - p.gamma * I - p.mu * I
    dR = p.gamma * I - p.mu * R
    return jnp.stack([dS, dI, dR])


def equilibria(p: SIRParams):
    """DFE, R0 and endemic equilibrium of the vital-dynamics model
    (``SIR_population_variable.cpp:46-73``)."""
    N_dfe = p.B / p.mu if p.mu > 0 else p.N
    r0 = p.beta / (p.gamma + p.mu) if (p.gamma + p.mu) > 0 else np.inf
    out = {"dfe": (N_dfe, 0.0, 0.0), "R0": r0, "endemic": None}
    if r0 > 1.0 and p.beta > 0:
        S_star = N_dfe / r0
        I_star = max(0.0, (p.B - p.mu * S_star) / (p.gamma + p.mu))
        R_star = max(0.0, N_dfe - S_star - I_star)
        out["endemic"] = (S_star, I_star, R_star)
    return out


# --------------------------------------------------------------------------
# Stochastic SIR: binomial chain + true Gillespie
# --------------------------------------------------------------------------

def _binomial_chain_step(carry, key, p: SIRParams, h):
    S, I, R = carry
    # integer-rounded compartments for the draws (:157-168)
    S_int = jnp.maximum(jnp.round(S), 0.0)
    I_int = jnp.maximum(jnp.round(I), 0.0)
    pI = 1.0 - jnp.exp(-jnp.where(p.N > 0, p.beta * I * h / p.N, 0.0))
    pR = 1.0 - jnp.exp(-p.gamma * h)
    pI = jnp.clip(pI, 0.0, 1.0)
    pR = jnp.clip(pR, 0.0, 1.0)
    k1, k2 = jax.random.split(key)
    new_I = jax.random.binomial(k1, S_int, pI)
    new_R = jax.random.binomial(k2, I_int, pR)
    # Reference parity (SIR_stochastic.cpp:171-177): the step freezes when
    # EITHER compartment empties — including the S == 0 case, where real
    # dynamics would still recover the remaining infecteds. That is the
    # reference's own quirk, reproduced deliberately; run_gillespie_sir is
    # the exact-dynamics alternative (its recovery channel stays active).
    active = (I_int > 0) & (S_int > 0)
    S_next = jnp.where(active, jnp.maximum(S_int - new_I, 0.0), S)
    I_next = jnp.where(active, jnp.maximum(I_int + new_I - new_R, 0.0), I)
    R_next = jnp.where(active, jnp.maximum(R + new_R, 0.0), R)
    return (S_next, I_next, R_next), jnp.stack([S_next, I_next, R_next])


def run_stochastic_sir(p: SIRParams, y0, t_start, t_end, h, num_simulations,
                       key) -> jnp.ndarray:
    """Binomial-chain SIR (Bailey 1975). Returns (num_simulations, steps+1, 3).

    All simulations advance in lockstep under one jit (vmap over the batch),
    replacing the reference's serial per-simulation loop (:75-141).
    """
    steps = int(np.floor((t_end - t_start) / h))
    # canonicalized: without jax_enable_x64 (the CLIs enable it) this is
    # float32 — fine for the reference-scale populations; counts above 2^24
    # need x64 for integer-exact binomials
    import jax.dtypes
    y0 = jnp.asarray(y0, dtype=jax.dtypes.canonicalize_dtype(jnp.float64))

    def one_sim(k):
        keys = jax.random.split(k, steps)
        carry = (y0[0], y0[1], y0[2])
        _, traj = jax.lax.scan(
            lambda c, kk: _binomial_chain_step(c, kk, p, h), carry, keys)
        return jnp.concatenate([y0[None, :], traj], axis=0)

    return jax.jit(jax.vmap(one_sim))(jax.random.split(key, num_simulations))


def run_gillespie_sir(p: SIRParams, y0, t_start, t_end, n_grid, num_simulations,
                      key, max_events: int = 500_000) -> jnp.ndarray:
    """Exact Gillespie SSA for the SIR jump process, sampled on a uniform grid.

    Events: infection at rate beta*S*I/N, recovery at rate gamma*I. Each
    trajectory runs a ``lax.while_loop`` over events writing into the grid;
    simulations are vmapped. (The reference README advertises this method but
    the C++ code only implements the binomial chain.)
    Returns (num_simulations, n_grid, 3) with grid times
    ``linspace(t_start, t_end, n_grid)``.
    """
    import jax.dtypes
    dt64 = jax.dtypes.canonicalize_dtype(jnp.float64)   # see run_stochastic_sir
    grid = jnp.linspace(t_start, t_end, n_grid, dtype=dt64)
    y0 = jnp.asarray(y0, dtype=dt64)

    def one_sim(k):
        def cond(state):
            t, S, I, _R, gi, _key, n, _out = state
            return (t < t_end) & (I > 0) & (n < max_events) & (gi < n_grid)

        def body(state):
            t, S, I, R, gi, kk, n, out = state
            k1, k2, kk = jax.random.split(kk, 3)
            rate_inf = jnp.where(p.N > 0, p.beta * S * I / p.N, 0.0)
            rate_rec = p.gamma * I
            total = rate_inf + rate_rec
            dt = jnp.where(total > 0,
                           jax.random.exponential(k1) / jnp.maximum(total, 1e-300),
                           jnp.inf)
            t_new = t + dt
            # fill all grid points passed by this jump with the pre-jump state
            def fill(carry):
                gi, out = carry
                out = out.at[gi].set(jnp.stack([S, I, R]))
                return gi + 1, out
            def fill_cond(carry):
                gi, _ = carry
                return (gi < n_grid) & (grid[jnp.minimum(gi, n_grid - 1)] < t_new) \
                    & (gi < n_grid)
            gi, out = jax.lax.while_loop(fill_cond, fill, (gi, out))

            infect = jax.random.uniform(k2) * total < rate_inf
            S = jnp.where(infect, S - 1, S)
            I = jnp.where(infect, I + 1, I - 1)
            R = jnp.where(infect, R, R + 1)
            return t_new, S, I, R, gi, kk, n + 1, out

        out0 = jnp.zeros((n_grid, 3), dtype=jnp.float64)
        state = (jnp.asarray(t_start, jnp.float64), y0[0], y0[1], y0[2],
                 jnp.asarray(0, jnp.int32), k, jnp.asarray(0, jnp.int32), out0)
        t, S, I, R, gi, _k, _n, out = jax.lax.while_loop(cond, body, state)

        # fill the remaining grid points with the final state
        def fill_rest(carry):
            gi, out = carry
            out = out.at[gi].set(jnp.stack([S, I, R]))
            return gi + 1, out
        _, out = jax.lax.while_loop(lambda c: c[0] < n_grid, fill_rest, (gi, out))
        return out

    return jax.jit(jax.vmap(one_sim))(jax.random.split(key, num_simulations))


def stochastic_statistics(trajectories: jnp.ndarray):
    """Per-(step, compartment) mean/median/p5/p95 across simulations
    (``SIR_stochastic.cpp:211-255``) in one vectorized reduction.

    ``trajectories``: (num_sims, T, 3). Returns dict of (T, 3) NumPy arrays.
    Computed host-side with double-precision NumPy: this is a post-hoc summary,
    not a jit-critical path, and ``jnp.percentile``'s interpolation arithmetic on
    some backends carries enough rounding noise that p05 of a constant array can
    exceed p95 (round-1 advisor finding).
    """
    traj = np.asarray(trajectories, dtype=np.float64)
    return {
        "mean": np.mean(traj, axis=0),
        "median": np.median(traj, axis=0),
        "p05": np.percentile(traj, 5.0, axis=0),
        "p95": np.percentile(traj, 95.0, axis=0),
    }


# --------------------------------------------------------------------------
# Age-structured SIR (reference src/sir_age_structured/AgeSIRModel.cpp)
# --------------------------------------------------------------------------

@struct.dataclass
class AgeSIRParams:
    """Parameters of the age-structured SIR (state (3, A): S, I, R rows)."""

    N: jnp.ndarray          # (A,)
    C_baseline: jnp.ndarray  # (A, A) contact matrix
    q: jnp.ndarray          # scalar transmissibility
    gamma: jnp.ndarray      # (A,) recovery rates
    scale_C: jnp.ndarray    # scalar overall contact scale

    @property
    def n_ages(self) -> int:
        return int(self.N.shape[-1])

    @property
    def dtype(self):
        return self.N.dtype

    def contact_matrix(self):
        return self.C_baseline * self.scale_C


def make_age_sir_params(*, N, C, q, gamma, scale_C=1.0, dtype=None) -> AgeSIRParams:
    """Validated construction (reference ``AgeSIRModel::create``, :10-38)."""
    N = np.asarray(N, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    gamma = np.asarray(gamma, dtype=np.float64)
    A = N.size
    if C.shape != (A, A):
        raise ValueError(f"contact matrix shape {C.shape} != ({A},{A})")
    if gamma.size != A:
        raise ValueError("gamma size mismatch")
    if q < 0 or scale_C < 0 or np.any(gamma < 0) or np.any(N < 0):
        raise ValueError("q, scale_C, gamma, N must be non-negative")
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    f = lambda x: jnp.asarray(x, dtype=dtype)
    return AgeSIRParams(N=f(N), C_baseline=f(C), q=f(q), gamma=f(gamma),
                        scale_C=f(scale_C))


def age_sir_rhs(t, y, p: AgeSIRParams):
    """lambda = q * C_current (I/N); zero-clamp outflows from ~empty compartments
    (``AgeSIRModel.cpp:106-139``)."""
    del t
    S, I, R = y[0], y[1], y[2]
    I_over_N = jnp.where(p.N > 1e-9, I / p.N, 0.0)
    # broadcast-multiply + sum, NOT a matmul: TPU f32 matmuls multiply in
    # bfloat16 (~1e-3 relative noise in the force of infection); same rule
    # as sepaihrd._contact_matvec, and cheaper on the VPU at A=4
    lam = jnp.maximum(
        p.q * jnp.sum(p.contact_matrix() * I_over_N[..., None, :], axis=-1),
        0.0)
    dS = -lam * S
    dI = lam * S - p.gamma * I
    dR = p.gamma * I
    dS = jnp.where((S < 1e-9) & (dS < 0), 0.0, dS)
    dI = jnp.where((I < 1e-9) & (dI < 0), 0.0, dI)
    dR = jnp.where((R < 1e-9) & (dR < 0), 0.0, dR)
    return jnp.stack([dS, dI, dR])


AGE_SIR_INTERVENTIONS = ("contact_reduction", "social_distancing", "lockdown",
                         "mask_mandate", "transmission_reduction")


def apply_age_sir_intervention(p: AgeSIRParams, name: str, value: float
                               ) -> AgeSIRParams:
    """Interventions as pure parameter transformations
    (``AgeSIRModel::applyIntervention``, :141-173): contact-scale interventions
    multiply scale_C; transmission interventions reduce q by the given fraction.
    Unknown names raise (same taxonomy as the reference)."""
    if name in ("contact_reduction", "social_distancing", "lockdown"):
        if value < 0:
            raise InterventionException("apply_age_sir_intervention",
                                        f"Contact scaling factor for '{name}' "
                                        "cannot be negative.")
        return p.replace(scale_C=p.scale_C * value)
    if name in ("mask_mandate", "transmission_reduction"):
        if not (0.0 <= value <= 1.0):
            raise InterventionException("apply_age_sir_intervention",
                                        f"Transmission reduction for '{name}' "
                                        "must be in [0, 1].")
        return p.replace(q=p.q * (1.0 - value))
    raise InterventionException("apply_age_sir_intervention",
                                f"Unknown intervention type: '{name}'.")


def solve_age_sir(p: AgeSIRParams, y0, ts, *, method="fixed", substeps=4,
                  tableau="dopri5", atol=1e-6, rtol=1e-6):
    """Integrate the age-SIR system over ``ts`` (same drivers as SEPAIHRD)."""
    from ..ode import integrate_times, integrate_times_fixed

    f = lambda t, y: age_sir_rhs(t, y, p)
    ts = jnp.asarray(ts, dtype=jnp.asarray(y0).dtype)
    if method == "fixed":
        return integrate_times_fixed(f, y0, ts, substeps=substeps, method=tableau)
    return integrate_times(f, y0, ts, atol=atol, rtol=rtol, method=tableau)


def sir_incidence(p: AgeSIRParams, traj: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct incidence lambda*S per output point
    (``SimulationResultProcessor::getIncidenceData``, :144-189)."""
    S, I = traj[:, 0], traj[:, 1]
    I_over_N = jnp.where(p.N > 1e-9, I / p.N, 0.0)
    # exact contraction over ages per output row (see age_sir_rhs note)
    lam = jnp.maximum(
        p.q * jnp.sum(p.contact_matrix() * I_over_N[:, None, :], axis=-1),
        0.0)
    return lam * S

"""Ensemble Adaptive-Metropolis MCMC: thousands of chains as one jitted program.

TPU-native re-design of ``MetropolisHastingsSampler``
(reference: ``src/sir_age_structured/optimizers/MetropolisHastingsSampler.cpp``).
The reference runs ONE sequential Haario-style Adaptive Metropolis chain; here an
ensemble of B chains advances in lockstep under ``lax.scan``, with the likelihood
vmapped across the ensemble (every chain-step is one fused device program; chains
shard over the mesh's ``chains`` axis).

Faithful pieces (same math as the reference):
- proposal Y = X + scale * L z with shared Cholesky factor L (:91-102)
- reflection constraints applied to proposals before evaluation (:305-309)
- accept/reject in log space with lowest()-on-failure semantics (:314-343)
- initial covariance: Phase-1 warm start or diag(sigma^2) * 2.38^2/d, plus
  regularization epsilon (:219-246)
- covariance re-estimation with (2.38^2/d) scaling + regularization (:168-199)
- Robbins-Monro global-scale adaptation toward the target acceptance rate with
  gamma = min(1/sqrt(t+1), 0.1) and log-scale clamped to [-6.9, 2.3] (:104-152)
- thinned sample storage, per-chain MAP tracking, acceptance statistics

Deliberate ensemble upgrades (documented deviations):
- The proposal covariance is re-estimated every ``adaptation_period`` steps from
  the CURRENT ensemble cross-section (B >> d samples) instead of the single
  chain's history — a standard ensemble-AM estimator that is both statistically
  stronger and TPU-trivial (one (B,d)^T(B,d) matmul + Cholesky, psum'd across
  shards). The reference's per-iteration rank-1 Welford updates and its
  emergency-shrink heuristics exist to stabilize a history-starved single chain
  and are unnecessary here.
- The Robbins-Monro scale is adapted per chain (a (B,) vector).
- RNG is fully key-threaded (jax.random) and reproducible, unlike the
  ``random_device``-seeded mt19937 of the reference (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .param_space import ParameterSpace


@dataclasses.dataclass(frozen=True)
class MHConfig:
    """Settings; names/defaults follow ``mcmc_settings.txt`` and
    ``MetropolisHastingsSampler::configure`` (:25-50)."""

    iterations: int = 10_000
    burn_in: int = 1_000
    adaptation_period: int = 100
    thinning: int = 1
    target_acceptance_rate: float = 0.234
    adapt_scale: bool = True
    regularization_epsilon: float = 1e-6
    store_samples: bool = True

    @classmethod
    def from_settings(cls, settings: dict) -> "MHConfig":
        g = settings.get
        return cls(
            iterations=int(g("mcmc_iterations", 10_000)),
            burn_in=int(g("burn_in", 1_000)),
            adaptation_period=int(g("adaptation_period", 100)),
            thinning=max(1, int(g("thinning", 1))),
            target_acceptance_rate=float(g("target_acceptance_rate", 0.234)),
            adapt_scale=bool(g("adapt_scale", 1.0)),
            regularization_epsilon=float(g("regularization_epsilon", 1e-6)),
            store_samples=bool(g("store_samples", 1.0)),
        )


def safe_logp(lp: jnp.ndarray) -> jnp.ndarray:
    """NaN/Inf objective values -> -1e18, mirroring
    ``MetropolisHastingsSampler::safeEvaluate`` (:65-74). Keeping the floor finite
    (not finfo.min) also keeps log-ratio arithmetic free of inf-inf NaNs."""
    return jnp.where(jnp.isfinite(lp), jnp.maximum(lp, -1e18), -1e18)


class MHState(NamedTuple):
    x: jnp.ndarray           # (B, d) current positions
    logp: jnp.ndarray        # (B,) current log-posteriors
    log_scale: jnp.ndarray   # (B,) per-chain Robbins-Monro log scale
    chol: jnp.ndarray        # (d, d) shared proposal Cholesky factor
    cov: jnp.ndarray         # (d, d) shared proposal covariance
    best_x: jnp.ndarray      # (B, d) per-chain MAP position
    best_logp: jnp.ndarray   # (B,)
    accept_count: jnp.ndarray  # (B,) accepted proposals so far
    step: jnp.ndarray        # () global step counter


class MHResult(NamedTuple):
    samples: jnp.ndarray             # (n_stored, B, d) thinned chain states
    sample_logps: jnp.ndarray        # (n_stored, B)
    best_x: jnp.ndarray              # (d,) global MAP
    best_logp: jnp.ndarray           # ()
    acceptance_rate: jnp.ndarray     # (B,)
    final_cov: jnp.ndarray           # (d, d)
    final_scale: jnp.ndarray         # (B,)
    final_state: MHState


def _init_covariance(space: ParameterSpace, d: int, dtype,
                     initial_cov: Optional[jnp.ndarray],
                     reg_eps: float) -> jnp.ndarray:
    if initial_cov is not None:
        cov = jnp.asarray(initial_cov, dtype=dtype)
    else:
        sig = space.sigmas.astype(dtype)
        cov = jnp.diag(jnp.where(sig > 0, sig * sig, 1e-6)) * (2.38 ** 2 / d)
    return cov + reg_eps * jnp.eye(d, dtype=dtype)


def _safe_cholesky(cov: jnp.ndarray, reg_eps: float, prev: jnp.ndarray):
    """Cholesky with the reference's fallback: keep the previous factor if the
    decomposition fails (:192-198)."""
    d = cov.shape[0]
    chol = jnp.linalg.cholesky(cov + reg_eps * jnp.eye(d, dtype=cov.dtype))
    ok = jnp.all(jnp.isfinite(chol))
    return jnp.where(ok, chol, prev), ok


def init_mh_state(space: ParameterSpace, theta0: jnp.ndarray,
                  loglik_batch: Callable, key: jax.Array, n_chains: int, *,
                  jitter: float = 1.0,
                  initial_cov: Optional[jnp.ndarray] = None,
                  reg_eps: float = 1e-6) -> MHState:
    """Initialize the ensemble around theta0 (each chain jittered by
    ``jitter * sigmas``, reflected into bounds)."""
    d = space.dim
    dtype = jnp.asarray(theta0).dtype
    theta0 = jnp.asarray(theta0, dtype=dtype)
    if theta0.ndim == 1:
        noise = jax.random.normal(key, (n_chains, d), dtype=dtype)
        x0 = theta0[None, :] + jitter * space.sigmas.astype(dtype) * noise
        x0 = x0.at[0].set(theta0)  # chain 0 starts exactly at theta0
    else:
        x0 = theta0
    x0 = jax.vmap(space.reflect)(x0)
    logp0 = safe_logp(loglik_batch(x0))
    cov = _init_covariance(space, d, dtype, initial_cov, reg_eps)
    chol = jnp.linalg.cholesky(cov)
    return MHState(
        x=x0, logp=logp0,
        log_scale=jnp.zeros((n_chains,), dtype=dtype),
        chol=chol, cov=cov,
        best_x=x0, best_logp=logp0,
        accept_count=jnp.zeros((n_chains,), dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def mh_step(state: MHState, key: jax.Array, space: ParameterSpace,
            loglik_batch: Callable, cfg: MHConfig) -> MHState:
    """One Metropolis step for the whole ensemble."""
    B, d = state.x.shape
    dtype = state.x.dtype
    k_prop, k_acc = jax.random.split(key)

    z = jax.random.normal(k_prop, (B, d), dtype=dtype)
    scale = jnp.exp(state.log_scale)[:, None]
    proposal = state.x + scale * (z @ state.chol.T)
    proposal = jax.vmap(space.reflect)(proposal)

    logp_prop = safe_logp(loglik_batch(proposal))
    log_ratio = logp_prop - state.logp
    log_u = jnp.log(jax.random.uniform(k_acc, (B,), dtype=dtype))
    accept = (log_ratio >= 0) | (log_u < log_ratio)

    x = jnp.where(accept[:, None], proposal, state.x)
    logp = jnp.where(accept, logp_prop, state.logp)

    better = logp > state.best_logp
    best_x = jnp.where(better[:, None], x, state.best_x)
    best_logp = jnp.where(better, logp, state.best_logp)

    step = state.step + 1
    if cfg.adapt_scale:
        gamma = jnp.minimum(1.0 / jnp.sqrt(step.astype(dtype) + 1.0), 0.1)
        log_scale = state.log_scale + gamma * (
            accept.astype(dtype) - cfg.target_acceptance_rate)
        log_scale = jnp.clip(log_scale, -6.9, 2.3)
    else:
        log_scale = state.log_scale

    return state._replace(
        x=x, logp=logp, log_scale=log_scale, best_x=best_x, best_logp=best_logp,
        accept_count=state.accept_count + accept.astype(jnp.int32), step=step)


def adapt_covariance(state: MHState, cfg: MHConfig) -> MHState:
    """Re-estimate the shared proposal covariance from the ensemble cross-section
    with the optimal (2.38^2/d) scaling (reference :168-199, ensemble estimator)."""
    B, d = state.x.shape
    dtype = state.x.dtype
    mean = jnp.mean(state.x, axis=0)
    centered = state.x - mean
    cov = (centered.T @ centered) / (B - 1)
    cov = (2.38 ** 2 / d) * cov + cfg.regularization_epsilon * jnp.eye(d, dtype=dtype)
    chol, _ok = _safe_cholesky(cov, cfg.regularization_epsilon, state.chol)
    return state._replace(cov=cov, chol=chol)


def run_mh(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MHConfig,
    *,
    n_chains: int = 8,
    initial_cov: Optional[jnp.ndarray] = None,
    jitter: float = 1.0,
    progress_fn: Optional[Callable] = None,
) -> MHResult:
    """Run the full ensemble sampler. jit-compiled as one program.

    ``loglik`` takes a single (d,) theta; it is vmapped across chains here.
    Returns thinned samples of shape (iterations // thinning, B, d).
    """
    loglik_batch = jax.vmap(loglik)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    state0 = init_mh_state(space, theta0, loglik_batch, k_init, n_chains,
                           jitter=jitter, initial_cov=initial_cov,
                           reg_eps=cfg.regularization_epsilon)

    thin = max(1, cfg.thinning)
    n_blocks = max(1, cfg.iterations // thin)
    # Adapt covariance at block boundaries once past burn-in; with the reference
    # production config (thinning=100, adaptation_period=100) this reproduces the
    # every-100-steps full recomputation exactly.
    adapt_every_blocks = max(1, cfg.adaptation_period // thin)

    def block(state: MHState, k_block: jax.Array):
        keys = jax.random.split(k_block, thin)

        def inner(s, k):
            return mh_step(s, k, space, loglik_batch, cfg), None

        state, _ = jax.lax.scan(inner, state, keys)

        do_adapt = (state.step > cfg.burn_in) & (
            (state.step // thin) % adapt_every_blocks == 0)
        state = jax.lax.cond(do_adapt, lambda s: adapt_covariance(s, cfg),
                             lambda s: s, state)
        return state, (state.x, state.logp)

    @jax.jit
    def run(state0, k_run):
        keys = jax.random.split(k_run, n_blocks)
        state, (samples, logps) = jax.lax.scan(block, state0, keys)
        best_chain = jnp.argmax(state.best_logp)
        return MHResult(
            samples=samples, sample_logps=logps,
            best_x=state.best_x[best_chain], best_logp=state.best_logp[best_chain],
            acceptance_rate=state.accept_count / jnp.maximum(state.step, 1),
            final_cov=state.cov, final_scale=jnp.exp(state.log_scale),
            final_state=state)

    return run(state0, k_run)

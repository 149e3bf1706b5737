"""Ensemble preconditioned MALA: gradient-guided MCMC at chain scale.

Beyond-the-reference capability: the reference's only gradient-based sampler
is single-chain NUTS fed by finite differences
(``src/model/optimizers/NUTSSampler.cpp``,
``SEPAIHRDGradientObjectiveFunction.cpp:15-171``); this module runs a
Metropolis-adjusted Langevin ensemble (thousands of chains in lockstep, like
:mod:`mmidv1_tpu.calibration.mh`) with EXACT ``jax.grad`` gradients through
the ODE solve.

The proposal is the preconditioned Langevin step

    x' = x + (eps^2 / 2) C grad logp(x) + eps L z,       C = L L^T

with the Metropolis-Hastings correction using the full asymmetric proposal
densities (computed via triangular solves against L). The preconditioner C is
re-estimated from the ensemble cross-section every ``adaptation_period`` steps
(the same estimator as :func:`mh.adapt_covariance`, without the RW-specific
2.38^2/d scaling — eps absorbs the global scale, Robbins-Monro-adapted toward
the MALA-optimal 0.574 acceptance rate, Roberts & Rosenthal 1998).

Bound handling: proposals outside the box support evaluate to the -1e18
floor and are rejected — exact detailed balance on the truncated posterior
(reflection would make the proposal density intractable). Gradients are
norm-clipped at ``grad_clip_norm`` per chain (mirroring the NUTS leapfrog
guard) so cliff-edge gradients cannot fling chains out of support.

Cost + fidelity note (measured, TPU v5e, Spain-2020, OPS_ANALYSIS.md): with
the Pallas adjoint engine (``ops.build_objective_pallas_grad``) a
value_and_grad costs ~13x one forward eval, and on the real float32
posterior ensemble-AM still wins ~4-8x in min-ESS/s: the f32 likelihood
noise enters the Langevin accept ratio twice (value + gradient-based
proposal correction), collapsing acceptance as eps grows and confounding
the Robbins-Monro adaptation (pseudo-marginal-style). Prefer :mod:`mh` or
:mod:`tempering` for f32 production sampling; MALA earns its keep for
well-conditioned/cheap-noise targets and f64 work.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .mh import _safe_cholesky, _shard_invariant_draws, safe_logp
from .param_space import ParameterSpace

GRAD_CLIP_NORM = 1000.0


@dataclasses.dataclass(frozen=True)
class MALAConfig:
    """Settings; the shared knobs follow ``mcmc_settings.txt`` naming."""

    iterations: int = 1_000
    burn_in: int = 100
    adaptation_period: int = 100
    thinning: int = 1
    target_acceptance_rate: float = 0.574
    adapt_scale: bool = True
    regularization_epsilon: float = 1e-6
    initial_step_size: float = 0.1      # eps0 (in preconditioner units)
    grad_clip_norm: float = GRAD_CLIP_NORM
    report_interval: int = 0

    @classmethod
    def from_settings(cls, settings: dict) -> "MALAConfig":
        g = settings.get
        return cls(
            iterations=int(g("mcmc_iterations", 1_000)),
            burn_in=int(g("burn_in", 100)),
            adaptation_period=int(g("adaptation_period", 100)),
            thinning=max(1, int(g("thinning", 1))),
            target_acceptance_rate=float(g("target_acceptance_rate", 0.574)),
            adapt_scale=bool(g("adapt_scale", 1.0)),
            regularization_epsilon=float(g("regularization_epsilon", 1e-6)),
            initial_step_size=float(g("mala_step_size", 0.1)),
            report_interval=int(g("report_interval", 0)),
        )


class MALAState(NamedTuple):
    x: jnp.ndarray            # (B, d) positions
    logp: jnp.ndarray         # (B,)
    grad: jnp.ndarray         # (B, d) clipped gradients at x
    log_eps: jnp.ndarray      # (B,) per-chain Robbins-Monro log step size
    chol: jnp.ndarray         # (d, d) preconditioner Cholesky factor L
    cov: jnp.ndarray          # (d, d) preconditioner C = L L^T
    best_x: jnp.ndarray       # (B, d)
    best_logp: jnp.ndarray    # (B,)
    accept_count: jnp.ndarray  # (B,) int32
    step: jnp.ndarray         # () int32


class MALAResult(NamedTuple):
    samples: jnp.ndarray          # (n_stored, B, d)
    sample_logps: jnp.ndarray     # (n_stored, B)
    best_x: jnp.ndarray           # (d,)
    best_logp: jnp.ndarray        # ()
    acceptance_rate: jnp.ndarray  # (B,)
    final_cov: jnp.ndarray        # (d, d)
    final_eps: jnp.ndarray        # (B,)
    final_state: MALAState


def _clip_grad(grad: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """Per-chain gradient-norm clipping (NUTS leapfrog guard,
    ``NUTSSampler.cpp:84-91``); also zeroes non-finite components so a -inf
    plateau cannot poison the drift."""
    grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
    nrm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    factor = jnp.where(nrm > max_norm, max_norm / jnp.maximum(nrm, 1e-30), 1.0)
    return grad * factor


def _bounded_value_and_grad(space: ParameterSpace, vg_batch: Callable,
                            max_norm: float):
    """Evaluate (logp, clipped grad) with out-of-support positions floored to
    -1e18 (hard-reject bound handling, see module docstring)."""

    def eval_batch(x):
        logp, grad = vg_batch(x)
        inside = space.in_bounds(x)
        logp = jnp.where(inside, safe_logp(logp), -1e18)
        grad = jnp.where(inside[:, None], _clip_grad(grad, max_norm), 0.0)
        return logp, grad

    return eval_batch


def init_mala_state(space: ParameterSpace, theta0: jnp.ndarray,
                    eval_batch: Callable, key: jax.Array, n_chains: int, *,
                    jitter: float = 1.0, initial_cov=None,
                    cfg: MALAConfig = MALAConfig()) -> MALAState:
    """Jittered ensemble init around theta0 (chain 0 exactly at theta0)."""
    d = space.dim
    dtype = jnp.asarray(theta0).dtype
    theta0 = jnp.asarray(theta0, dtype=dtype)
    if theta0.ndim == 1:
        noise, _ = _shard_invariant_draws(key, n_chains, 0, n_chains, d, dtype)
        x0 = theta0[None, :] + jitter * space.sigmas.astype(dtype) * noise
        x0 = jnp.where((jnp.arange(n_chains) == 0)[:, None], theta0[None, :], x0)
        x0 = jax.vmap(space.reflect)(x0)   # init inside support only
    else:
        x0 = theta0
    logp0, grad0 = eval_batch(x0)
    if initial_cov is not None:
        cov = jnp.asarray(initial_cov, dtype=dtype)
    else:
        sig = space.sigmas.astype(dtype)
        cov = jnp.diag(jnp.where(sig > 0, sig * sig, 1e-6))
    cov = cov + cfg.regularization_epsilon * jnp.eye(d, dtype=dtype)
    chol = jnp.linalg.cholesky(cov)
    log_eps0 = jnp.full((x0.shape[0],), jnp.log(cfg.initial_step_size),
                        dtype=dtype)
    return MALAState(
        x=x0, logp=logp0, grad=grad0, log_eps=log_eps0, chol=chol, cov=cov,
        best_x=x0, best_logp=logp0,
        accept_count=jnp.zeros((x0.shape[0],), dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32))


def mala_step(state: MALAState, step_key: jax.Array, space: ParameterSpace,
              eval_batch: Callable, cfg: MALAConfig) -> MALAState:
    """One preconditioned-MALA step for the whole ensemble."""
    B, d = state.x.shape
    dtype = state.x.dtype
    z, u = _shard_invariant_draws(step_key, B, 0, B, d, dtype)
    eps = jnp.exp(state.log_eps)[:, None]                       # (B, 1)
    L = state.chol

    def drift(grad):
        # HIGHEST precision — the accept ratio evaluates the EXACT
        # Gaussian q-density of this drift+noise kernel; a bf16-rounded
        # matmul would realize a slightly different kernel than log_q
        # assumes (detailed-balance bias)
        return 0.5 * jnp.matmul(grad, state.cov.T,
                                precision=jax.lax.Precision.HIGHEST)

    mean_fwd = state.x + eps ** 2 * drift(state.grad)
    proposal = mean_fwd + eps * jnp.matmul(
        z, L.T, precision=jax.lax.Precision.HIGHEST)

    logp_prop, grad_prop = eval_batch(proposal)
    mean_rev = proposal + eps ** 2 * drift(grad_prop)

    def log_q(y, mean, eps):
        # N(y; mean, eps^2 C): -||L^{-1}(y-mean)||^2 / (2 eps^2) - d log eps
        r = jax.scipy.linalg.solve_triangular(
            L, (y - mean).T, lower=True).T                      # (B, d)
        return (-0.5 * jnp.sum(r * r, axis=-1) / (eps[:, 0] ** 2)
                - d * jnp.log(eps[:, 0]))

    log_ratio = (logp_prop - state.logp
                 + log_q(state.x, mean_rev, eps)
                 - log_q(proposal, mean_fwd, eps))
    # u clamped away from 0: log(0) = -inf would accept unconditionally
    accept = (log_ratio >= 0) | (jnp.log(jnp.maximum(u, 1e-12)) < log_ratio)

    x = jnp.where(accept[:, None], proposal, state.x)
    logp = jnp.where(accept, logp_prop, state.logp)
    grad = jnp.where(accept[:, None], grad_prop, state.grad)

    better = logp > state.best_logp
    best_x = jnp.where(better[:, None], x, state.best_x)
    best_logp = jnp.where(better, logp, state.best_logp)

    step = state.step + 1
    if cfg.adapt_scale:
        gamma = jnp.minimum(1.0 / jnp.sqrt(step.astype(dtype) + 1.0), 0.1)
        log_eps = state.log_eps + gamma * (
            accept.astype(dtype) - cfg.target_acceptance_rate)
        log_eps = jnp.clip(log_eps, -6.9, 2.3)
    else:
        log_eps = state.log_eps
    return state._replace(
        x=x, logp=logp, grad=grad, log_eps=log_eps,
        best_x=best_x, best_logp=best_logp,
        accept_count=state.accept_count + accept.astype(jnp.int32), step=step)


def adapt_preconditioner(state: MALAState, cfg: MALAConfig) -> MALAState:
    """Ensemble-cross-section covariance as the Langevin preconditioner
    (no 2.38^2/d: eps carries the global scale)."""
    B, d = state.x.shape
    mean = jnp.mean(state.x, axis=0)
    centered = state.x - mean
    # max(B-1, 1): a single-chain ensemble would otherwise produce a 0/0 NaN
    # covariance that poisons the Langevin drift permanently.
    cov = jnp.matmul(centered.T, centered,
                     precision=jax.lax.Precision.HIGHEST) / max(B - 1, 1)
    cov = cov + cfg.regularization_epsilon * jnp.eye(d, dtype=state.x.dtype)
    chol, ok = _safe_cholesky(cov, cfg.regularization_epsilon, state.chol)
    # Commit cov only when the factorization succeeded, so a fallback keeps
    # cov and chol consistent (chol stays the previous factor on failure).
    cov = jnp.where(ok, cov, state.cov)
    return state._replace(cov=cov, chol=chol)


def run_mala(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MALAConfig,
    *,
    n_chains: int = 8,
    initial_cov: Optional[jnp.ndarray] = None,
    initial_state: Optional[MALAState] = None,
    jitter: float = 1.0,
    progress_fn: Optional[Callable] = None,
    value_and_grad_batch: Optional[Callable] = None,
) -> MALAResult:
    """Run the jitted ensemble MALA sampler.

    ``loglik`` takes one (d,) theta; gradients default to
    ``vmap(value_and_grad(loglik))``. Pass ``value_and_grad_batch`` to supply
    a batch-native engine. Returns thinned samples
    (ceil(iterations/thinning), B, d), matching :class:`mh.MHResult` shapes.
    """
    if cfg.iterations <= 0:
        raise ValueError(f"iterations must be positive, got {cfg.iterations}")
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))
    eval_batch = _bounded_value_and_grad(space, value_and_grad_batch,
                                         cfg.grad_clip_norm)
    k_init, k_run = jax.random.split(key)
    if initial_state is not None:
        state0 = initial_state
    else:
        state0 = init_mala_state(space, theta0, eval_batch, k_init, n_chains,
                                 jitter=jitter, initial_cov=initial_cov,
                                 cfg=cfg)

    thin = max(1, cfg.thinning)
    n_blocks = -(-cfg.iterations // thin)
    adapt_every_blocks = max(1, cfg.adaptation_period // thin)
    report_every = max(1, cfg.report_interval)

    def block(state, xs):
        block_idx, k_block = xs
        step_keys = jax.random.split(k_block, thin)

        def inner(s, k):
            return mala_step(s, k, space, eval_batch, cfg), None

        state, _ = jax.lax.scan(inner, state, step_keys)
        do_adapt = (state.step > cfg.burn_in) & (
            (state.step // thin) % adapt_every_blocks == 0)
        state = jax.lax.cond(do_adapt,
                             lambda s: adapt_preconditioner(s, cfg),
                             lambda s: s, state)
        if progress_fn is not None:
            def report(s):
                acc = jnp.mean(s.accept_count / jnp.maximum(s.step, 1))
                jax.debug.callback(progress_fn, s.step, acc,
                                   jnp.max(s.best_logp),
                                   jnp.mean(jnp.exp(s.log_eps)), ordered=False)
                return 0
            jax.lax.cond((block_idx + 1) % report_every == 0, report,
                         lambda s: 0, state)
        return state, (state.x, state.logp)

    @jax.jit
    def run(state0, k_run):
        keys = jax.random.split(k_run, n_blocks)
        state, (samples, logps) = jax.lax.scan(
            block, state0, (jnp.arange(n_blocks), keys))
        i = jnp.argmax(state.best_logp)
        return MALAResult(
            samples=samples, sample_logps=logps,
            best_x=state.best_x[i], best_logp=state.best_logp[i],
            acceptance_rate=state.accept_count / jnp.maximum(state.step, 1),
            final_cov=state.cov, final_eps=jnp.exp(state.log_eps),
            final_state=state)

    return run(state0, k_run)

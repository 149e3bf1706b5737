"""Replica-exchange (parallel tempering) ensemble MCMC.

Beyond the reference: the campaign diagnostics (``analysis/diagnostics.py``)
show the Spain-2020 posterior is multimodal enough that plain ensemble
Adaptive Metropolis leaves chains stuck in their starting basins
(split-R-hat >> 1 across 8192 chains). The reference's single sequential AM
chain (``MetropolisHastingsSampler.cpp:283-384``) has the same pathology with
no remedy. Parallel tempering is the TPU-natural fix: K temperature rungs x
N chains is just a larger batch for the same fused objective — the ONLY new
costs are the per-rung proposal scaling and the swap moves, both trivial
array ops.

Design (one jitted program, like :func:`mmidv1_tpu.calibration.mh.run_mh`):

- state ``x`` is (K, N, d): rung 0 is the cold (true) posterior, rung K-1 the
  hottest. Inverse temperatures follow a geometric ladder
  ``beta_k = beta_min ** (k / (K-1))`` (beta_0 = 1).
- ``logp`` is stored UNTEMPERED; tempering enters only the accept ratios, so
  a swap move just exchanges (x, logp) rows.
- each rung keeps its OWN proposal covariance, re-estimated from the rung's
  ensemble cross-section (hot rungs need wider proposals), plus the same
  per-chain Robbins-Monro scale as :func:`mh.mh_step`.
- swaps use the deterministic even-odd pairing scheme: on parity p, every
  adjacent pair (k, k+1) with k = p (mod 2) attempts an exchange with
  log-acceptance (beta_k - beta_{k+1}) * (logp_{k+1} - logp_k), chain i of
  rung k swapping only with chain i of rung k+1. All K/2 pair attempts for
  all N chain columns happen in one masked array op.
- RNG reuses the shard-invariant global-table discipline of :mod:`mh`.

The cold rung's thinned history is the returned posterior sample; the global
MAP is taken over ALL rungs (hot-chain log-densities are untempered, hence
comparable — a hot chain that stumbles on a better mode reports it).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mh import _safe_cholesky, _shard_invariant_draws, safe_logp
from .param_space import ParameterSpace


@dataclasses.dataclass(frozen=True)
class PTConfig:
    """Settings. MH knobs mirror :class:`mh.MHConfig`; tempering adds the
    ladder (``n_rungs``, ``beta_min``) and the swap cadence."""

    iterations: int = 10_000
    burn_in: int = 1_000
    adaptation_period: int = 100
    thinning: int = 1
    target_acceptance_rate: float = 0.234
    adapt_scale: bool = True
    regularization_epsilon: float = 1e-6
    n_rungs: int = 8
    beta_min: float = 0.05
    swap_every: int = 1          # steps between swap sweeps
    # Ladder adaptation (Vousden, Farr & Mandel 2016 MNRAS 455:1919 scheme):
    # equalize adjacent swap rates by Robbins-Monro on the log temperature
    # spacings, with fixed endpoints beta_0 = 1 and beta_{K-1} = beta_min.
    # Adaptation runs during burn-in only (vanishing gain, then frozen), so
    # the retained cold-rung samples come from a fixed ladder. This is what
    # closes the near-zero hot-end swap rates a geometric ladder shows on
    # LL-scale ~1e6 targets (measured: 0.004-0.03 on Spain-2020, PARITY.md).
    adapt_ladder: bool = True
    ladder_kappa: float = 0.3    # initial RM gain on log spacings
    ladder_t0: float = 1000.0    # gain decay timescale (in swap sweeps)
    ladder_ema: float = 0.1      # per-pair swap-probability EMA weight

    def ladder(self, dtype) -> jnp.ndarray:
        """Geometric inverse-temperature ladder, beta_0 = 1 .. beta_min."""
        K = self.n_rungs
        if K < 1:
            raise ValueError("n_rungs must be >= 1")
        if not (0.0 < self.beta_min <= 1.0):
            raise ValueError("beta_min must be in (0, 1]")
        if K == 1:
            return jnp.ones((1,), dtype=dtype)
        expo = np.arange(K) / (K - 1)
        return jnp.asarray(self.beta_min ** expo, dtype=dtype)


class PTState(NamedTuple):
    x: jnp.ndarray           # (K, N, d) positions
    logp: jnp.ndarray        # (K, N) UNTEMPERED log-posteriors
    log_scale: jnp.ndarray   # (K, N) per-chain Robbins-Monro log scale
    chol: jnp.ndarray        # (K, d, d) per-rung proposal Cholesky factors
    cov: jnp.ndarray         # (K, d, d)
    best_x: jnp.ndarray      # (K, N, d) per-slot MAP (slot-attached: swap
    best_logp: jnp.ndarray   # (K, N)     moves do NOT migrate the records)
    accept_count: jnp.ndarray   # (K, N)
    swap_accept: jnp.ndarray    # (K-1,) accepted swaps per adjacent pair
    swap_tries: jnp.ndarray     # (K-1,)
    step: jnp.ndarray        # ()
    betas: jnp.ndarray       # (K,) current inverse-temperature ladder
    ladder_s: jnp.ndarray    # (K-1,) log spacings of T=1/beta (softmax param)
    swap_prob: jnp.ndarray   # (K-1,) per-pair mean swap-probability EMA


class PTResult(NamedTuple):
    samples: jnp.ndarray         # (n_stored, N, d) cold-rung thinned history
    sample_logps: jnp.ndarray    # (n_stored, N)
    best_x: jnp.ndarray          # (d,)
    best_logp: jnp.ndarray       # ()
    acceptance_rate: jnp.ndarray  # (K, N)
    swap_rate: jnp.ndarray       # (K-1,) exchange acceptance per pair
    final_state: PTState


def _ladder_from_spacings(ladder_s: jnp.ndarray, t_max) -> jnp.ndarray:
    """(K,) inverse temperatures from (K-1,) log T-spacings: endpoints are
    pinned at T_0 = 1 and T_{K-1} = t_max; interior rungs sit at the
    softmax-normalized cumulative spacings."""
    w = jax.nn.softmax(ladder_s)
    cum = jnp.cumsum(w)
    T = jnp.concatenate([jnp.ones((1,), ladder_s.dtype),
                         1.0 + (t_max - 1.0) * cum])
    return 1.0 / T


def _spacings_from_betas(betas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_ladder_from_spacings` (softmax is shift-invariant,
    so any representative works)."""
    T = 1.0 / np.asarray(betas, np.float64)
    if len(T) < 2:
        return np.zeros((1,))
    return np.log(np.maximum(np.diff(T), 1e-30))


def init_pt_state(space: ParameterSpace, theta0: jnp.ndarray,
                  loglik_batch: Callable, key: jax.Array, *,
                  n_rungs: int, n_chains: int, jitter: float = 1.0,
                  initial_cov: Optional[jnp.ndarray] = None,
                  reg_eps: float = 1e-6,
                  betas: Optional[jnp.ndarray] = None,
                  beta_min: float = 0.05) -> PTState:
    """Initialize all rungs around theta0 (rung-0 chain 0 starts exactly
    there); every rung starts from the same conditioned covariance.
    ``betas`` seeds the ladder (default: the geometric ``beta_min`` ladder);
    with ladder adaptation on it is only the starting point."""
    d = space.dim
    dtype = jnp.asarray(theta0).dtype
    theta0 = jnp.asarray(theta0, dtype=dtype)
    K, N = n_rungs, n_chains
    noise, _ = _shard_invariant_draws(key, K * N, 0, K * N, d, dtype)
    x0 = theta0[None, :] + jitter * space.sigmas.astype(dtype) * noise
    x0 = x0.at[0].set(theta0)
    x0 = jax.vmap(space.reflect)(x0).reshape(K, N, d)
    logp0 = safe_logp(loglik_batch(x0.reshape(K * N, d))).reshape(K, N)

    if initial_cov is not None:
        cov1 = jnp.asarray(initial_cov, dtype=dtype)
    else:
        sig = space.sigmas.astype(dtype)
        cov1 = jnp.diag(jnp.where(sig > 0, sig * sig, 1e-6)) * (2.38 ** 2 / d)
    cov1 = cov1 + reg_eps * jnp.eye(d, dtype=dtype)
    cov = jnp.broadcast_to(cov1, (K, d, d))
    chol = jnp.broadcast_to(jnp.linalg.cholesky(cov1), (K, d, d))

    if betas is None:
        betas = PTConfig(n_rungs=K, beta_min=beta_min).ladder(dtype)
    betas = jnp.asarray(betas, dtype=dtype)
    ladder_s = jnp.asarray(_spacings_from_betas(np.asarray(betas, np.float64)),
                           dtype=dtype)

    return PTState(
        x=x0, logp=logp0,
        log_scale=jnp.zeros((K, N), dtype=dtype),
        chol=chol, cov=cov,
        best_x=x0, best_logp=logp0,
        accept_count=jnp.zeros((K, N), dtype=jnp.int32),
        swap_accept=jnp.zeros((max(K - 1, 1),), dtype=jnp.int32),
        swap_tries=jnp.zeros((max(K - 1, 1),), dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32),
        betas=betas,
        ladder_s=ladder_s,
        swap_prob=jnp.zeros((max(K - 1, 1),), dtype=dtype),
    )


def pt_mh_step(state: PTState, step_key: jax.Array, space: ParameterSpace,
               loglik_batch: Callable, cfg: PTConfig,
               betas: jnp.ndarray) -> PTState:
    """One tempered Metropolis update of every chain on every rung."""
    K, N, d = state.x.shape
    dtype = state.x.dtype
    z, u = _shard_invariant_draws(step_key, K * N, 0, K * N, d, dtype)
    z = z.reshape(K, N, d)
    u = u.reshape(K, N)
    scale = jnp.exp(state.log_scale)[..., None]
    # per-rung correlated proposal: z @ L_k^T, exact contraction (the TPU f32
    # matmul default would bf16-round the applied step — OPS_ANALYSIS.md)
    corr = jnp.einsum("knd,ked->kne", z, state.chol,
                      precision=jax.lax.Precision.HIGHEST)
    proposal = state.x + scale * corr
    proposal = space.reflect(proposal)

    logp_prop = safe_logp(loglik_batch(proposal.reshape(K * N, d))).reshape(K, N)
    log_ratio = betas[:, None] * (logp_prop - state.logp)
    accept = (log_ratio >= 0) | (jnp.log(jnp.maximum(u, 1e-12)) < log_ratio)

    x = jnp.where(accept[..., None], proposal, state.x)
    logp = jnp.where(accept, logp_prop, state.logp)

    better = logp > state.best_logp
    best_x = jnp.where(better[..., None], x, state.best_x)
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
        x=x, logp=logp, log_scale=log_scale, best_x=best_x,
        best_logp=best_logp,
        accept_count=state.accept_count + accept.astype(jnp.int32), step=step)


def pt_swap_step(state: PTState, swap_key: jax.Array, betas: jnp.ndarray,
                 parity: jnp.ndarray, ema: float = 0.1) -> PTState:
    """One even-odd swap sweep: adjacent pairs (k, k+1) with k = parity
    (mod 2) exchange (x, logp) chain-column-wise with the replica-exchange
    acceptance probability. Also maintains the per-pair mean
    swap-probability EMA the ladder adaptation consumes (the analytic
    ``min(1, exp(log_alpha))`` averaged over chains — lower variance than
    the realized accept indicator)."""
    K, N, _d = state.x.shape
    if K == 1:
        return state
    dtype = state.logp.dtype

    u = jax.random.uniform(swap_key, (K - 1, N), dtype=dtype)
    dlogp = state.logp[1:] - state.logp[:-1]                 # (K-1, N)
    dbeta = (betas[:-1] - betas[1:])[:, None]                # (K-1, 1)
    log_alpha = dbeta * dlogp
    pair_on = (jnp.arange(K - 1) % 2) == (parity % 2)        # (K-1,)
    accept = ((log_alpha >= 0) | (jnp.log(jnp.maximum(u, 1e-12)) < log_alpha)) & pair_on[:, None]

    p_pair = jnp.mean(jnp.exp(jnp.minimum(log_alpha, 0.0)), axis=1)  # (K-1,)
    swap_prob = jnp.where(pair_on,
                          (1.0 - ema) * state.swap_prob + ema * p_pair,
                          state.swap_prob)

    pad = jnp.zeros((1, N), dtype=bool)
    take_upper = jnp.concatenate([accept, pad], axis=0)      # rung k <- k+1
    take_lower = jnp.concatenate([pad, accept], axis=0)      # rung k <- k-1

    def exchange(a):
        down = jnp.concatenate([a[1:], a[-1:]], axis=0)      # a[k+1]
        up = jnp.concatenate([a[:1], a[:-1]], axis=0)        # a[k-1]
        m_up = take_upper.reshape(take_upper.shape + (1,) * (a.ndim - 2))
        m_lo = take_lower.reshape(take_lower.shape + (1,) * (a.ndim - 2))
        return jnp.where(m_up, down, jnp.where(m_lo, up, a))

    return state._replace(
        x=exchange(state.x), logp=exchange(state.logp),
        swap_accept=state.swap_accept + jnp.sum(accept, axis=1).astype(jnp.int32),
        swap_tries=state.swap_tries + (pair_on * N).astype(jnp.int32),
        swap_prob=swap_prob)


def pt_adapt_ladder(state: PTState, cfg: PTConfig) -> PTState:
    """One Robbins-Monro update of the temperature ladder (Vousden, Farr &
    Mandel 2016 eq. 11-12, fixed endpoints): widen the log T-spacing of
    pairs swapping more than average, shrink the rest — the fixed point is
    equal swap rates across all adjacent pairs. Gain decays as
    ``kappa * t0 / (t + t0)`` in swap sweeps; callers freeze adaptation
    after burn-in so the retained samples come from a fixed ladder."""
    K = state.x.shape[0]
    if K < 3:          # endpoints are pinned; nothing to adapt below 3 rungs
        return state
    dtype = state.ladder_s.dtype
    # gain timescale is documented in SWAP SWEEPS; state.step counts MH
    # steps, which advance swap_every times per sweep
    t = (state.step // max(1, cfg.swap_every)).astype(dtype)
    gain = cfg.ladder_kappa * cfg.ladder_t0 / (t + cfg.ladder_t0)
    # hold adaptation until BOTH swap parities have been attempted at least
    # once: before that, the not-yet-tried pairs' EMA still carries its 0.0
    # initialization and the near-maximal early gain would distort the
    # ladder from fabricated zero swap probabilities
    gain = jnp.where(t >= 2.0, gain, 0.0)
    s = state.ladder_s + gain * (state.swap_prob
                                 - jnp.mean(state.swap_prob))
    t_max = 1.0 / state.betas[-1]   # hottest endpoint stays pinned
    betas = _ladder_from_spacings(s, t_max)
    return state._replace(ladder_s=s, betas=betas)


def pt_adapt_covariance(state: PTState, cfg: PTConfig) -> PTState:
    """Per-rung ensemble covariance re-estimation (the per-rung analogue of
    :func:`mh.adapt_covariance`)."""
    K, N, d = state.x.shape
    dtype = state.x.dtype
    mean = jnp.mean(state.x, axis=1, keepdims=True)
    c = state.x - mean
    cov = jnp.einsum("knd,kne->kde", c, c,
                     precision=jax.lax.Precision.HIGHEST) / max(N - 1, 1)
    cov = (2.38 ** 2 / d) * cov + cfg.regularization_epsilon * jnp.eye(d, dtype=dtype)
    chol, _ok = jax.vmap(lambda cv, pr: _safe_cholesky(
        cv, cfg.regularization_epsilon, pr))(cov, state.chol)
    return state._replace(cov=cov, chol=chol)


def run_pt(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: PTConfig,
    *,
    n_chains: int = 8,
    initial_cov: Optional[jnp.ndarray] = None,
    initial_state: Optional[PTState] = None,
    jitter: float = 1.0,
    loglik_batch: Optional[Callable] = None,
) -> PTResult:
    """Run the replica-exchange sampler as one jitted program.

    ``loglik`` takes a single (d,) theta (vmapped here); ``loglik_batch``
    overrides with a batch-native objective (e.g. the Pallas kernel) — it
    sees batches of ``n_rungs * n_chains`` thetas. Returns the COLD rung's
    thinned samples; ``swap_rate`` should sit in ~[0.2, 0.6] per pair — a
    near-zero entry means the ladder has a gap (raise ``n_rungs`` or
    ``beta_min``)."""
    if cfg.iterations <= 0:
        raise ValueError(f"iterations must be positive, got {cfg.iterations}")
    if loglik_batch is None:
        loglik_batch = jax.vmap(loglik)
    dtype = jnp.asarray(theta0).dtype
    k_init, k_run = jax.random.split(key)

    if initial_state is not None:
        state0 = initial_state
    else:
        state0 = init_pt_state(space, theta0, loglik_batch, k_init,
                               n_rungs=cfg.n_rungs, n_chains=n_chains,
                               jitter=jitter, initial_cov=initial_cov,
                               reg_eps=cfg.regularization_epsilon,
                               betas=cfg.ladder(dtype))

    run = make_pt_runner(space, cfg, loglik_batch)
    return run(state0, k_run)


def make_pt_runner(space: ParameterSpace, cfg: PTConfig,
                   loglik_batch: Callable, *,
                   jit: bool = True) -> Callable:
    """Build the reusable jitted segment program ``(state0, key) -> PTResult``
    (the PT analogue of :func:`mh.make_mh_runner`; campaign drivers running
    many segments should build it once to avoid per-segment re-tracing)."""
    thin = max(1, cfg.thinning)
    n_blocks = -(-cfg.iterations // thin)
    adapt_every_blocks = max(1, cfg.adaptation_period // thin)
    swap_every = max(1, cfg.swap_every)

    def block(state: PTState, k_block):
        step_keys = jax.random.split(k_block, thin)

        def inner(s, k):
            k_mh, k_swap = jax.random.split(k)
            s = pt_mh_step(s, k_mh, space, loglik_batch, cfg, s.betas)
            do_swap = (s.step % swap_every) == 0

            def swap_and_adapt(st):
                st = pt_swap_step(st, k_swap, st.betas,
                                  (st.step // swap_every),
                                  ema=cfg.ladder_ema)
                if cfg.adapt_ladder:
                    st = jax.lax.cond(st.step <= cfg.burn_in,
                                      lambda z: pt_adapt_ladder(z, cfg),
                                      lambda z: z, st)
                return st

            # alternate pair parity between swap sweeps
            s = jax.lax.cond(do_swap, swap_and_adapt, lambda st: st, s)
            return s, None

        state, _ = jax.lax.scan(inner, state, step_keys)
        # Unlike mh.py, covariance adaptation runs from step 0: PT burn-in
        # doubles as the ladder-adaptation window (often tens of thousands
        # of steps), and freezing every rung's proposal covariance at the
        # warm init for that long would both cripple burn-in mixing and
        # feed the ladder adaptation swap rates from a mis-scaled sampler.
        # Burn-in still gates the ladder freeze and which draws are kept.
        do_adapt = (state.step // thin) % adapt_every_blocks == 0
        state = jax.lax.cond(do_adapt,
                             lambda s: pt_adapt_covariance(s, cfg),
                             lambda s: s, state)
        return state, (state.x[0], state.logp[0])

    def run(state0, k_run):
        keys = jax.random.split(k_run, n_blocks)
        state, (samples, logps) = jax.lax.scan(block, state0, keys)
        K, N, d = state.x.shape
        flat_lp = state.best_logp.reshape(-1)
        i = jnp.argmax(flat_lp)
        return PTResult(
            samples=samples, sample_logps=logps,
            best_x=state.best_x.reshape(K * N, d)[i], best_logp=flat_lp[i],
            acceptance_rate=state.accept_count / jnp.maximum(state.step, 1),
            swap_rate=state.swap_accept / jnp.maximum(state.swap_tries, 1),
            final_state=state)

    return jax.jit(run) if jit else run

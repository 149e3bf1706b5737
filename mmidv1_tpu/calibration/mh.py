"""Ensemble Adaptive-Metropolis MCMC: thousands of chains as one jitted program.

TPU-native re-design of ``MetropolisHastingsSampler``
(reference: ``src/sir_age_structured/optimizers/MetropolisHastingsSampler.cpp``).
The reference runs ONE sequential Haario-style Adaptive Metropolis chain; here an
ensemble of B chains advances in lockstep under ``lax.scan``, with the likelihood
vmapped across the ensemble (every chain-step is one fused device program; chains
shard over the mesh's ``chains`` axis — see :mod:`mmidv1_tpu.parallel`).

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
- periodic progress reporting (acceptance rate / scale / best logL) mirroring
  the reference's ``report_interval`` lines (:363-378), via ``jax.debug.callback``

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
  Per-step draws are rows of a GLOBAL (n_total_chains, d) table generated from
  the step key (each shard slices its rows), so the random stream of chain i is
  IDENTICAL whether the ensemble runs on one device or sharded across a mesh —
  the sharded-vs-unsharded parity tests rely on this (the analogue of the
  reference's ``ParallelConsistencyTest``,
  ``tests/model/SEPAIHRDObjectivefunctionTest.cpp:492``).

Multi-chip: pass ``axis_name`` (inside ``shard_map``) to make the covariance
re-estimation and final best-reduction collective (``psum``/``all_gather``); see
:func:`mmidv1_tpu.parallel.run_mh_sharded`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger
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
    report_interval: int = 0   # blocks between progress callbacks (0 = every block)
    # proposal family: "am" = adaptive-Metropolis Gaussian (reference
    # semantics); "de" = differential evolution (ter Braak 2006): the proposal
    # is gamma * (x_j - x_k) between two other ensemble walkers, which tracks
    # curved posterior manifolds no fixed Gaussian covariance can (the
    # Spain-2020 typical set is such a manifold: straight-line moves from the
    # MAP lose likelihood 15-90x faster than the global covariance predicts,
    # measured). Symmetric, so the accept rule is unchanged. Batch-native:
    # partner differences are two gathers over the ensemble axis.
    # Updating every walker simultaneously from the same pre-step ensemble
    # would break detailed balance of the joint kernel (the naive-parallel
    # DE-MC pitfall), so the step alternates RED-BLACK half-ensembles by
    # global chain parity — the complementary half is frozen while the
    # active half proposes with partners drawn ONLY from the frozen half
    # (the same fix emcee uses for its parallel stretch move,
    # Foreman-Mackey et al. 2013 §3). A given chain is therefore proposed
    # every SECOND mh_step; n_chains must be even.
    proposal: str = "am"
    de_gamma1_prob: float = 0.1   # P(gamma = 1) per chain-step (mode jumps)
    de_noise: float = 1e-6        # residual N(0, (de_noise*sigmas)^2) jitter

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
            report_interval=int(g("report_interval", 0)),
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


def _shard_invariant_draws(step_key: jax.Array, n_total: int, offset, n_local: int,
                           d: int, dtype):
    """Per-chain Gaussian proposals + accept uniforms for the LOCAL shard.

    The GLOBAL (n_total, d) normal / (n_total,) uniform tables are generated
    from ``step_key`` and the local rows sliced out, so chain i sees the same
    stream on 1 device or N (each device redundantly generates the full table —
    at production chain counts that's <1 ms, ~5x cheaper than per-chain
    ``fold_in`` keys, measured on TPU v5e)."""
    k1, k2 = jax.random.split(step_key)
    z_all = jax.random.normal(k1, (n_total, d), dtype=dtype)
    u_all = jax.random.uniform(k2, (n_total,), dtype=dtype)
    z = jax.lax.dynamic_slice_in_dim(z_all, offset, n_local, 0)
    u = jax.lax.dynamic_slice_in_dim(u_all, offset, n_local, 0)
    return z, u


def init_mh_state(space: ParameterSpace, theta0: jnp.ndarray,
                  loglik_batch: Callable, key: jax.Array, n_chains: int, *,
                  jitter: float = 1.0,
                  initial_cov: Optional[jnp.ndarray] = None,
                  reg_eps: float = 1e-6,
                  n_total: Optional[int] = None,
                  offset=0) -> MHState:
    """Initialize the ensemble around theta0 (each chain jittered by
    ``jitter * sigmas``, reflected into bounds; global chain 0 starts exactly
    at theta0). ``n_total``/``offset`` select this shard's rows of the global
    jitter table (multi-chip)."""
    d = space.dim
    dtype = jnp.asarray(theta0).dtype
    theta0 = jnp.asarray(theta0, dtype=dtype)
    if n_total is None:
        n_total = n_chains
    if theta0.ndim == 1:
        noise, _ = _shard_invariant_draws(key, n_total, offset, n_chains, d, dtype)
        x0 = theta0[None, :] + jitter * space.sigmas.astype(dtype) * noise
        chain_ids = offset + jnp.arange(n_chains)
        x0 = jnp.where((chain_ids == 0)[:, None], theta0[None, :], x0)
    else:
        x0 = theta0
    x0 = jax.vmap(space.reflect)(x0)
    logp0 = safe_logp(loglik_batch(x0))
    cov = _init_covariance(space, d, dtype, initial_cov, reg_eps)
    chol = jnp.linalg.cholesky(cov)
    n_local = x0.shape[0]
    return MHState(
        x=x0, logp=logp0,
        log_scale=jnp.zeros((n_local,), dtype=dtype),
        chol=chol, cov=cov,
        best_x=x0, best_logp=logp0,
        accept_count=jnp.zeros((n_local,), dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def mh_step(state: MHState, step_key: jax.Array, space: ParameterSpace,
            loglik_batch: Callable, cfg: MHConfig, *,
            n_total: Optional[int] = None, offset=0,
            axis_name: Optional[str] = None) -> MHState:
    """One Metropolis step for the whole (local shard of the) ensemble."""
    B, d = state.x.shape
    dtype = state.x.dtype
    n_tot = n_total or B
    z, u = _shard_invariant_draws(step_key, n_tot, offset, B, d, dtype)
    scale = jnp.exp(state.log_scale)[:, None]
    active = None
    if cfg.proposal == "de":
        # differential evolution: x + gamma (x_j - x_k) + tiny jitter,
        # updated RED-BLACK by global chain parity (see MHConfig): only the
        # half whose parity matches the step moves, and its partners j, k
        # are drawn from the FROZEN other half, so each substep is a valid
        # MH kernel on the active coordinates given the complement.
        # Partner indices come from GLOBAL tables (shard-invariant like the
        # Gaussian draws); j != i holds because partners live in the other
        # parity class, j == k is allowed (the move degenerates to the
        # jitter; the (j,k)<->(k,j) symmetry keeps it symmetric either way).
        if n_tot % 2:
            raise ValueError(f"proposal='de' needs an even ensemble, "
                             f"got n_chains={n_tot}")
        kj, kk, kg = jax.random.split(jax.random.fold_in(step_key, 1), 3)
        ids = offset + jnp.arange(B)
        parity = state.step % 2
        active = (ids % 2) == parity
        half = n_tot // 2
        j_all = jax.random.randint(kj, (n_tot,), 0, half)
        k_all = jax.random.randint(kk, (n_tot,), 0, half)
        g_all = jax.random.uniform(kg, (n_tot,), dtype=dtype)
        # global index of a frozen-half walker: 2 r + (1 - parity)
        j = 2 * jax.lax.dynamic_slice_in_dim(j_all, offset, B, 0) + (1 - parity)
        k = 2 * jax.lax.dynamic_slice_in_dim(k_all, offset, B, 0) + (1 - parity)
        g_u = jax.lax.dynamic_slice_in_dim(g_all, offset, B, 0)
        if axis_name is None:
            x_all = state.x
        else:
            x_all = jax.lax.all_gather(state.x, axis_name).reshape(n_tot, d)
        gamma = jnp.where(g_u < cfg.de_gamma1_prob,
                          jnp.asarray(1.0, dtype),
                          jnp.asarray(2.38 / np.sqrt(2 * d), dtype))
        diff = x_all[j] - x_all[k]
        jit_e = cfg.de_noise * space.sigmas.astype(dtype) * z
        proposal = state.x + (scale * gamma[:, None]) * diff + jit_e
        proposal = jnp.where(active[:, None], proposal, state.x)
    else:
        # HIGHEST precision: TPU f32 matmuls multiply in bfloat16 by
        # default, which would distort the proposal kernel relative to
        # the adapted Cholesky factor (see param_space.apply's rule)
        proposal = state.x + scale * jnp.matmul(
            z, state.chol.T, precision=jax.lax.Precision.HIGHEST)
    proposal = jax.vmap(space.reflect)(proposal)

    logp_prop = safe_logp(loglik_batch(proposal))
    log_ratio = logp_prop - state.logp
    # clamp: f32 uniform hits exactly 0 ~2^-23/draw; log(0) = -inf
    # would unconditionally accept arbitrarily bad proposals
    log_u = jnp.log(jnp.maximum(u, 1e-12))
    accept = (log_ratio >= 0) | (log_u < log_ratio)
    if active is not None:
        # frozen half: proposal == state.x would self-accept and pollute the
        # acceptance statistics, so mask it out of accept entirely
        accept = accept & active

    x = jnp.where(accept[:, None], proposal, state.x)
    logp = jnp.where(accept, logp_prop, state.logp)

    better = logp > state.best_logp
    best_x = jnp.where(better[:, None], x, state.best_x)
    best_logp = jnp.where(better, logp, state.best_logp)

    step = state.step + 1
    if cfg.adapt_scale:
        gamma = jnp.minimum(1.0 / jnp.sqrt(step.astype(dtype) + 1.0), 0.1)
        delta = accept.astype(dtype) - cfg.target_acceptance_rate
        if active is not None:
            delta = jnp.where(active, delta, 0.0)   # frozen half: no signal
        log_scale = state.log_scale + gamma * delta
        log_scale = jnp.clip(log_scale, -6.9, 2.3)
    else:
        log_scale = state.log_scale

    return state._replace(
        x=x, logp=logp, log_scale=log_scale, best_x=best_x, best_logp=best_logp,
        accept_count=state.accept_count + accept.astype(jnp.int32), step=step)


def adapt_covariance(state: MHState, cfg: MHConfig,
                     axis_name: Optional[str] = None) -> MHState:
    """Re-estimate the shared proposal covariance from the ensemble cross-section
    with the optimal (2.38^2/d) scaling (reference :168-199, ensemble estimator).

    With ``axis_name`` (inside shard_map) the moments are psum'd across the mesh
    so every shard sees the GLOBAL ensemble covariance."""
    B_local, d = state.x.shape
    dtype = state.x.dtype
    if axis_name is None:
        B = B_local
        mean = jnp.mean(state.x, axis=0)
        centered = state.x - mean
        cov = jnp.matmul(centered.T, centered,
                         precision=jax.lax.Precision.HIGHEST) / (B - 1)
    else:
        n_dev = jax.lax.psum(1, axis_name)
        B = B_local * n_dev
        mean = jax.lax.psum(jnp.sum(state.x, axis=0), axis_name) / B
        centered = state.x - mean
        cov = jax.lax.psum(
            jnp.matmul(centered.T, centered,
                       precision=jax.lax.Precision.HIGHEST),
            axis_name) / (B - 1)
    cov = (2.38 ** 2 / d) * cov + cfg.regularization_epsilon * jnp.eye(d, dtype=dtype)
    chol, _ok = _safe_cholesky(cov, cfg.regularization_epsilon, state.chol)
    return state._replace(cov=cov, chol=chol)


def _global_best(state: MHState, axis_name: Optional[str]):
    """Global MAP across the (possibly sharded) ensemble."""
    i = jnp.argmax(state.best_logp)
    bl, bx = state.best_logp[i], state.best_x[i]
    if axis_name is None:
        return bx, bl
    all_bl = jax.lax.all_gather(bl, axis_name)       # (n_dev,)
    all_bx = jax.lax.all_gather(bx, axis_name)       # (n_dev, d)
    j = jnp.argmax(all_bl)
    return all_bx[j], all_bl[j]


def run_mh(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MHConfig,
    *,
    n_chains: int = 8,
    initial_cov: Optional[jnp.ndarray] = None,
    initial_state: Optional[MHState] = None,
    jitter: float = 1.0,
    progress_fn: Optional[Callable] = None,
    axis_name: Optional[str] = None,
    n_total: Optional[int] = None,
    offset=0,
    loglik_batch: Optional[Callable] = None,
    _jit: bool = True,
) -> MHResult:
    """Run the full ensemble sampler. jit-compiled as one program.

    ``loglik`` takes a single (d,) theta; it is vmapped across chains here.
    Returns thinned samples of shape (ceil(iterations/thinning), B, d).

    ``initial_state`` resumes a previous run (checkpoint/resume: save
    ``result.final_state`` with :mod:`mmidv1_tpu.utils.checkpoint` and pass it
    back here; the step counter, covariance, and scales carry over).

    ``axis_name``/``n_total``/``offset``/``_jit`` are the multi-chip hooks used
    by :func:`mmidv1_tpu.parallel.run_mh_sharded` (inside shard_map, the outer
    jit is applied by the caller; ``n_total`` is the global chain count and
    ``offset`` this shard's first global chain index).

    ``progress_fn(step, accept_rate, best_logp, mean_scale)`` is invoked from
    device code via ``jax.debug.callback`` every ``report_interval`` blocks —
    the TPU-side equivalent of the reference's progress lines
    (``MetropolisHastingsSampler.cpp:363-378``).
    """
    if cfg.iterations <= 0:
        raise ValueError(f"iterations must be positive, got {cfg.iterations}")
    # loglik_batch overrides the default vmap (e.g. the fused Pallas objective,
    # mmidv1_tpu.ops.build_objective_pallas, which is batch-native).
    if loglik_batch is None:
        loglik_batch = jax.vmap(loglik)
    if n_total is None:
        n_total = n_chains
    k_init, k_run = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    if initial_state is not None:
        state0 = initial_state
    else:
        state0 = init_mh_state(space, theta0, loglik_batch, k_init, n_chains,
                               jitter=jitter, initial_cov=initial_cov,
                               reg_eps=cfg.regularization_epsilon,
                               n_total=n_total, offset=offset)

    run = make_mh_runner(space, cfg, loglik_batch, axis_name=axis_name,
                         n_total=n_total, offset=offset,
                         progress_fn=progress_fn, jit=_jit)
    return run(state0, k_run)


def make_mh_runner(space: ParameterSpace, cfg: MHConfig, loglik_batch: Callable,
                   *, axis_name: Optional[str] = None,
                   n_total: Optional[int] = None, offset=0,
                   progress_fn: Optional[Callable] = None,
                   jit: bool = True) -> Callable:
    """Build the reusable jitted segment program ``(state0, key) -> MHResult``.

    ``run_mh`` builds one per call; callers that run MANY segments with the
    same configuration (the checkpointed campaign driver) should build it once
    — re-tracing each segment costs ~10 s of host time on this machine, ~40%
    of a 40-segment campaign's wall clock.
    """
    thin = max(1, cfg.thinning)
    # Ceil-division: run at least `iterations` steps, rounded UP to a whole
    # number of thinning blocks (never silently fewer than configured).
    n_blocks = -(-cfg.iterations // thin)
    # Adapt covariance at block boundaries once past burn-in; with the reference
    # production config (thinning=100, adaptation_period=100) this reproduces the
    # every-100-steps full recomputation exactly.
    adapt_every_blocks = max(1, cfg.adaptation_period // thin)
    report_every = max(1, cfg.report_interval)

    def block(state: MHState, xs):
        block_idx, k_block = xs
        step_keys = jax.random.split(k_block, thin)

        def inner(s, k):
            return mh_step(s, k, space, loglik_batch, cfg,
                           n_total=n_total, offset=offset,
                           axis_name=axis_name), None

        state, _ = jax.lax.scan(inner, state, step_keys)

        if cfg.proposal != "de":    # DE proposals don't use the covariance
            do_adapt = (state.step > cfg.burn_in) & (
                (state.step // thin) % adapt_every_blocks == 0)
            state = jax.lax.cond(do_adapt,
                                 lambda s: adapt_covariance(s, cfg, axis_name),
                                 lambda s: s, state)
        if progress_fn is not None:
            def report(s):
                ps = s.step // 2 if cfg.proposal == "de" else s.step
                acc = jnp.mean(s.accept_count / jnp.maximum(ps, 1))
                jax.debug.callback(progress_fn, s.step, acc,
                                   jnp.max(s.best_logp),
                                   jnp.mean(jnp.exp(s.log_scale)), ordered=False)
                return 0
            jax.lax.cond((block_idx + 1) % report_every == 0, report,
                         lambda s: 0, state)
        if not cfg.store_samples:
            # store_samples=0 (mcmc_settings.txt): optimization-only runs
            # keep the MAP/acceptance state but no (n_blocks, B, d) history
            # — at 8192 chains x 10k iterations that history is ~GBs of HBM
            return state, (state.x[:0], state.logp[:0])
        return state, (state.x, state.logp)

    def run(state0, k_run):
        keys = jax.random.split(k_run, n_blocks)
        state, (samples, logps) = jax.lax.scan(
            block, state0, (jnp.arange(n_blocks), keys))
        best_x, best_logp = _global_best(state, axis_name)
        # per-PROPOSAL acceptance: under the red-black DE scheme a chain is
        # only proposed every second step
        prop_steps = state.step // 2 if cfg.proposal == "de" else state.step
        return MHResult(
            samples=samples, sample_logps=logps,
            best_x=best_x, best_logp=best_logp,
            acceptance_rate=state.accept_count / jnp.maximum(prop_steps, 1),
            final_cov=state.cov, final_scale=jnp.exp(state.log_scale),
            final_state=state)

    return jax.jit(run) if jit else run


def run_mh_checkpointed(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MHConfig,
    *,
    n_chains: int = 8,
    segments: int = 10,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
    initial_cov: Optional[jnp.ndarray] = None,
    jitter: float = 1.0,
    progress_fn: Optional[Callable] = None,
    loglik_batch: Optional[Callable] = None,
    on_segment: Optional[Callable] = None,
) -> MHResult:
    """Production campaign driver: the run split into ``segments`` device
    programs with a disk checkpoint between each.

    ``on_segment(segment_index, segment_result)`` fires after each segment,
    BEFORE the state checkpoint is written (artifacts first, state last: the
    checkpoint is the commit point). Use it to persist per-segment samples —
    the returned ``MHResult.samples`` covers only segments run in THIS
    process, so a resumed campaign's full posterior must be reassembled from
    per-segment files (see ``scripts/production_campaign.py``).

    Long single XLA programs are fragile (device watchdogs/preemption — on
    this environment programs beyond a few minutes of device time crash the
    TPU worker); the reference has the same concern with multi-hour runs and
    solves it with write-only trace checkpoints but NO resume path
    (``MetropolisHastingsSampler.cpp:380-409``, SURVEY.md §5). Here each
    segment is an ordinary :func:`run_mh` program, the full sampler state is
    checkpointed after every segment, and ``resume=True`` continues an
    interrupted campaign from the last checkpoint: a killed-and-restarted
    campaign produces EXACTLY the completed campaign's samples (tested).

    Per-segment RNG is ``fold_in(key, segment_index)``, so the stream depends
    only on (key, segment index), not on where the campaign was interrupted.
    Returns an :class:`MHResult` whose thinned samples span all segments run
    in THIS process (segments completed before a resume live in their trace
    files / the checkpoint).
    """
    if segments <= 0:
        raise ValueError("segments must be positive")
    per_segment = -(-cfg.iterations // segments)
    seg_cfg = dataclasses.replace(cfg, iterations=per_segment)

    state = None
    start_segment = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        from ..utils.checkpoint import load_mh_state

        state = load_mh_state(checkpoint_path)
        # each segment actually runs ceil(per_segment/thinning)*thinning
        # steps (run_mh rounds UP to whole thinning blocks) — dividing by
        # per_segment would drift the resume index whenever thinning does
        # not divide per_segment, silently skipping segments
        thin = max(1, cfg.thinning)
        steps_per_segment = -(-per_segment // thin) * thin
        start_segment = int(np.asarray(state.step)) // steps_per_segment
        get_logger("mh").info(
            f"resuming campaign from {checkpoint_path} at step "
            f"{int(np.asarray(state.step))} (segment {start_segment})")

    if loglik_batch is None:
        loglik_batch = jax.vmap(loglik)
    runner = None   # built on first use, reused across segments (one trace)
    all_samples, all_logps = [], []
    result = None
    for s in range(start_segment, segments):
        k_init, k_run = jax.random.split(jax.random.fold_in(key, s))
        if state is None:
            state = init_mh_state(space, theta0, loglik_batch, k_init,
                                  n_chains, jitter=jitter,
                                  initial_cov=initial_cov,
                                  reg_eps=seg_cfg.regularization_epsilon)
        if runner is None:
            runner = make_mh_runner(space, seg_cfg, loglik_batch,
                                    progress_fn=progress_fn)
        result = runner(state, k_run)
        state = result.final_state
        all_samples.append(np.asarray(result.samples))
        all_logps.append(np.asarray(result.sample_logps))
        if on_segment is not None:
            on_segment(s, result)
        if checkpoint_path:
            from ..utils.checkpoint import save_mh_state

            save_mh_state(checkpoint_path, state)
    if result is None:   # fully resumed campaign with nothing left to run
        raise ValueError(
            f"checkpoint already covers all {segments} segments "
            f"({int(np.asarray(state.step))} steps); nothing to run")
    return result._replace(
        samples=jnp.asarray(np.concatenate(all_samples, axis=0)),
        sample_logps=jnp.asarray(np.concatenate(all_logps, axis=0)))

"""No-U-Turn Sampler with exact gradients through the ODE solve.

TPU-native re-design of ``NUTSSampler``
(reference: ``src/model/optimizers/NUTSSampler.cpp``, Hoffman & Gelman 2014
Alg. 6). The single biggest qualitative upgrade over the reference: the gradient
comes from ``jax.grad`` through the fixed-grid RK solve (exact reverse-mode
adjoint), replacing the reference's OpenMP-parallel forward finite differences
(``SEPAIHRDGradientObjectiveFunction.cpp:15-171``) which cost d+1 ODE solves per
gradient and carry O(eps) truncation error.

Faithful pieces:
- heuristic initial step size with <=5 doubling/halving probes (:215-286)
- dual-averaging adaptation (mu = log(10 eps0), gamma=0.05, t0=10, kappa=0.75,
  delta target from settings) (:66-71, :167-181)
- leapfrog with gradient-norm clipping at 1000 and constraint clamping (:289-318)
- slice-variable doubling tree with DELTA_MAX=1000 divergence check and the
  U-turn criterion (:321-427)
- non-finite iterations repeat the previous sample (:99-106)

Design notes: ``max_tree_depth`` is small in the reference configuration (3), so
the doubling recursion is unrolled AT TRACE TIME — the whole tree build becomes
one fused device program with 2^depth leapfrog steps. The sampler is
BATCH-NATIVE: every tree operation acts on (B, d) ensembles with per-chain
masks (the same select semantics a vmapped ``lax.cond`` lowers to), so the
gradient engine can be a batch-level function — pass
``value_and_grad_batch=mmidv1_tpu.ops.build_objective_pallas_grad(...)`` to run
every leapfrog's gradient through the Pallas adjoint kernels
(3.2x the XLA adjoint, OPS_ANALYSIS.md).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .param_space import ParameterSpace

DELTA_MAX = 1000.0
GRAD_CLIP_NORM = 1000.0


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    """Settings mirror ``nuts_settings.txt``."""

    iterations: int = 25
    adaptation_window: int = 5
    delta_target: float = 0.8
    max_tree_depth: int = 3
    # Dual-averaging step clamps. On a float32 target whose evaluation
    # noise floor already costs ~1 nat of Hamiltonian error per trajectory
    # (measured: Spain-2020 Pallas engine, scripts/energy_error_probe.py —
    # accept tops out at 0.78 for ANY small step), a delta_target above
    # that ceiling makes the adaptation spiral the step toward zero
    # (observed: 4e-4 and falling, mixing frozen). The floor bounds the
    # spiral; pair it with delta_target at or below the measured ceiling.
    eps_floor: float = 0.0
    eps_ceil: float = float("inf")

    @classmethod
    def from_settings(cls, s: dict) -> "NUTSConfig":
        g = s.get
        return cls(iterations=int(g("nuts_iterations", 25)),
                   adaptation_window=int(g("nuts_adaptation_window", 5)),
                   delta_target=float(g("nuts_delta_target", 0.8)),
                   max_tree_depth=int(g("nuts_max_tree_depth", 3)),
                   eps_floor=float(g("nuts_eps_floor", 0.0)),
                   eps_ceil=float(g("nuts_eps_ceil", float("inf"))))


class NUTSState(NamedTuple):
    """Full sampler state between iterations — checkpoint/resume unit.

    The reference's NUTS writes traces but has no resume path
    (``NUTSSampler.cpp`` trace handling); here the state is a pytree, so
    resume is EXACT: ``run_nuts(..., initial_state=s)`` with the same master
    key and config continues bit-for-bit (the per-iteration key table is
    derived from the master key and sliced at ``it``; tested in
    ``tests/test_checkpoint.py``).
    """

    x: jnp.ndarray              # (B, d) current positions
    logp: jnp.ndarray           # (B,)
    grad: jnp.ndarray           # (B, d)
    eps: jnp.ndarray            # (B,) current step sizes
    log_eps_bar: jnp.ndarray    # (B,) dual-averaging iterate
    h_bar: jnp.ndarray          # (B,) dual-averaging statistic
    mu: jnp.ndarray             # (B,) dual-averaging anchor log(10 eps0)
    it: jnp.ndarray             # () int32 iterations completed
    best_x: jnp.ndarray         # (B, d)
    best_logp: jnp.ndarray      # (B,)


class NUTSResult(NamedTuple):
    samples: jnp.ndarray        # (iterations, B, d)
    sample_logps: jnp.ndarray   # (iterations, B)
    best_x: jnp.ndarray
    best_logp: jnp.ndarray
    step_sizes: jnp.ndarray     # (B,) final adapted step sizes
    mean_accept: jnp.ndarray    # (B,)
    mean_depth: jnp.ndarray     # (B,) mean doublings completed per iteration
    # (== max_tree_depth when the U-turn/divergence criteria never bind —
    # the signal that deeper trees would extend the trajectory)


def _clip_grad(g):
    """Per-chain gradient-norm clipping; g is (B, d)."""
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    factor = jnp.where(norm > GRAD_CLIP_NORM, GRAD_CLIP_NORM / norm, 1.0)
    return jnp.where(jnp.isfinite(factor), g * factor, jnp.zeros_like(g))


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)                       # (B,)


def _w(cond, x, y):
    """Per-chain select: cond (B,) against (B,) or (B, d) operands."""
    if x.ndim == cond.ndim + 1:
        cond = cond[..., None]
    return jnp.where(cond, x, y)


def _mm(a, b):
    """Mass-transform matmul at HIGHEST precision: the TPU's default-f32
    matmul runs bf16 passes whose ~4e-3 relative noise on ``z @ S.T`` /
    ``g @ S`` dominates the leapfrog's Hamiltonian error (measured: dH std
    2.8 at eps=1e-3 on TPU vs 0.098 for the identical trajectory on CPU —
    the whole NUTS acceptance gap; same trap as the AM/PT proposal matmuls,
    OPS_ANALYSIS.md bf16 addendum)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


class _Tree(NamedTuple):
    theta_minus: jnp.ndarray    # (B, d)
    r_minus: jnp.ndarray
    grad_minus: jnp.ndarray
    theta_plus: jnp.ndarray
    r_plus: jnp.ndarray
    grad_plus: jnp.ndarray
    theta_prime: jnp.ndarray
    logp_prime: jnp.ndarray     # (B,)
    n_prime: jnp.ndarray        # (B,)
    s_prime: jnp.ndarray        # (B,)
    alpha: jnp.ndarray          # (B,)
    n_alpha: jnp.ndarray        # (B,)


def _build_tree(vag_batch, space, theta, r, grad, log_u, v, j, eps, logp0_r0,
                key):
    """ITERATIVE subtree of 2^j leapfrogs in direction ``v`` (j: python int).

    Equivalent to Hoffman & Gelman's recursive doubling but built as one
    ``lax.scan`` over the 2^j leapfrog steps with an O(j) checkpoint stack,
    so the COMPILED program is O(j) per doubling instead of O(2^j): the
    trace-time-unrolled recursion was fine at the reference's depth 3 but at
    the depth 8-10 this posterior's pinned step size demands (PARITY.md
    round-2 addendum) its HLO blow-up stalls XLA for tens of minutes.

    Mechanics (the standard iterative-NUTS scheme, cf. numpyro): leaf k's
    state starts every complete power-of-two block whose first leaf index s
    satisfies s % 2^m == 0; simultaneously-open starts have strictly
    decreasing trailing-zero counts, so storing leaf s in checkpoint slot
    min(tz(s), j) never collides and j+1 slots suffice. After leaf k, for
    every m with (k+1) % 2^m == 0 the U-turn criterion is checked between
    checkpoint slot(s = k+1-2^m) and the current leaf. The in-subtree
    proposal is reservoir-sampled leaf-by-leaf (prob n_leaf / n_sum), which
    reproduces the recursive join's uniform-over-valid-leaves law. All tree
    indices are scalars shared by the whole (B, ...) ensemble; only states
    are per-chain, joined by masked selects (Pallas-engine compatible).
    """
    dtype = theta.dtype
    B = theta.shape[0]
    n_leaf_total = 1 << j
    ve = (v * eps)[:, None]

    def leapfrog(th, rr, gg):
        r_half = rr + 0.5 * ve * _clip_grad(gg)
        th1 = space.clamp(th + ve * r_half)
        logp1, g1 = vag_batch(th1)
        r1 = r_half + 0.5 * ve * _clip_grad(g1)
        return th1, r1, g1, logp1

    # checkpoint stacks: slot -> (theta, r) of the stored leaf
    ck_theta = jnp.zeros((j + 1, B, theta.shape[1]), dtype)
    ck_r = jnp.zeros((j + 1, B, theta.shape[1]), dtype)

    def tz_slot(s):
        """min(trailing zeros of s, j) as a traced scalar; tz(0) -> j."""
        s = jnp.asarray(s, jnp.int32)
        lowbit = s & -s                       # 0 when s == 0
        t = jnp.round(jnp.log2(jnp.maximum(lowbit, 1))).astype(jnp.int32)
        return jnp.minimum(jnp.where(s == 0, j, t), j)

    def step(carry, k_key):
        k, key_k = k_key
        (th, rr, gg, ck_t, ck_r_, live, s_flag, n_sum, prop_th, prop_lp,
         alpha, n_alpha, first) = carry
        th1, r1, g1, logp1 = leapfrog(th, rr, gg)

        joint = logp1 - 0.5 * _dot(r1, r1)
        finite = jnp.isfinite(joint)
        n1 = jnp.where(finite & (log_u <= joint), 1, 0)
        div_ok = finite & (log_u < joint + DELTA_MAX)
        a1 = jnp.where(finite, jnp.minimum(1.0, jnp.exp(joint - logp0_r0)),
                       0.0)

        # reservoir-sample this leaf into the subtree proposal (only chains
        # still live extend their subtree; dead chains keep everything)
        n_new = n_sum + n1
        u = jax.random.uniform(key_k, (B,), dtype=dtype)
        take = live & (u * jnp.maximum(n_new, 1).astype(dtype)
                       < n1.astype(dtype))
        prop_th = _w(take, th1, prop_th)
        prop_lp = jnp.where(take, logp1, prop_lp)
        n_sum = jnp.where(live, n_new, n_sum)
        alpha = jnp.where(live, alpha + a1, alpha)
        n_alpha = jnp.where(live, n_alpha + 1.0, n_alpha)

        # store checkpoint (k even starts blocks; storing every k is simpler
        # and equally correct since slot(k) only matters for even k)
        slot = tz_slot(k)
        ck_t = jax.lax.dynamic_update_index_in_dim(
            ck_t, _w(live, th1, ck_t[slot]), slot, 0)
        ck_r_ = jax.lax.dynamic_update_index_in_dim(
            ck_r_, _w(live, r1, ck_r_[slot]), slot, 0)

        # U-turn checks for every complete block ending at this leaf
        ok = div_ok
        for m in range(1, j + 1):
            ends_block = (k + 1) % (1 << m) == 0
            s0 = k + 1 - (1 << m)
            sl = tz_slot(s0)
            th_s = jax.lax.dynamic_index_in_dim(ck_t, sl, 0, keepdims=False)
            r_s = jax.lax.dynamic_index_in_dim(ck_r_, sl, 0, keepdims=False)
            # oriented span theta_plus - theta_minus = v * (leaf_k - leaf_s);
            # momenta enter RAW (H&G Alg 6: backward trees leapfrog with -eps
            # but the stop criterion uses the stored momenta unchanged)
            dth = (th1 - th_s) * v[:, None]
            no_ut = (_dot(dth, r_s) >= 0) & (_dot(dth, r1) >= 0)
            ok = ok & (no_ut | ~ends_block)
        live_new = live & ok
        s_flag = jnp.where(live, ok.astype(jnp.int32), s_flag)

        first_new = [_w(live & (k == 0), x, f)
                     for x, f in zip((th1, r1, g1), first)]
        # dead chains freeze their end state too
        th_keep = _w(live, th1, th)
        r_keep = _w(live, r1, rr)
        g_keep = _w(live, g1, gg)
        return (th_keep, r_keep, g_keep, ck_t, ck_r_, live_new, s_flag,
                n_sum, prop_th, prop_lp, alpha, n_alpha, tuple(first_new)), None

    keys = jax.random.split(key, n_leaf_total)
    carry0 = (theta, r, grad, ck_theta, ck_r,
              jnp.ones((B,), bool), jnp.ones((B,), jnp.int32),
              jnp.zeros((B,), jnp.int32), theta, jnp.full((B,), -jnp.inf, dtype),
              jnp.zeros((B,), dtype), jnp.zeros((B,), dtype),
              (theta, r, grad))
    (th_end, r_end, g_end, _ckt, _ckr, _live, s_flag, n_sum, prop_th,
     prop_lp, alpha, n_alpha, first), _ = jax.lax.scan(
        step, carry0, (jnp.arange(n_leaf_total), keys))

    th_first, r_first, g_first = first
    pos = v > 0
    theta_minus = _w(pos, th_first, th_end)
    r_minus = _w(pos, r_first, r_end)
    grad_minus = _w(pos, g_first, g_end)
    theta_plus = _w(pos, th_end, th_first)
    r_plus = _w(pos, r_end, r_first)
    grad_plus = _w(pos, g_end, g_first)
    # chains that never accepted a leaf keep the entry point as proposal
    none_taken = n_sum == 0
    prop_th = _w(none_taken, theta, prop_th)
    prop_lp = jnp.where(none_taken, logp0_r0, prop_lp)  # unused when n==0
    return _Tree(theta_minus, r_minus, grad_minus, theta_plus, r_plus,
                 grad_plus, prop_th, prop_lp, n_sum, s_flag, alpha, n_alpha)


def find_reasonable_epsilon(vag_batch, space, theta0, sigmas, key,
                            max_probes: int = 5):
    """Heuristic initial epsilon per chain (:215-286): start from the mean
    proposal sigma, then double/halve until the one-step acceptance crosses
    0.5. ``theta0``: (B, d); returns (B,)."""
    dtype = theta0.dtype
    B = theta0.shape[0]
    eps0 = jnp.full((B,), jnp.maximum(jnp.mean(sigmas.astype(dtype)), 1e-4),
                    dtype=dtype)
    logp0, grad0 = vag_batch(theta0)
    r0 = jax.random.normal(key, theta0.shape, dtype=dtype)
    joint0 = logp0 - 0.5 * _dot(r0, r0)

    def full_ratio(eps):
        r_half = r0 + 0.5 * eps[:, None] * _clip_grad(grad0)
        theta1 = space.clamp(theta0 + eps[:, None] * r_half)
        logp1, grad1 = vag_batch(theta1)
        r1 = r_half + 0.5 * eps[:, None] * _clip_grad(grad1)
        return logp1 - 0.5 * _dot(r1, r1) - joint0

    ratio = full_ratio(eps0)
    direction = jnp.where(ratio > jnp.log(0.5), 1.0, -1.0)

    def body(carry, _):
        eps, done = carry
        ratio = full_ratio(eps)
        crossed = jnp.where(direction > 0, ratio <= jnp.log(0.5),
                            ratio > jnp.log(0.5))
        done = done | crossed | ~jnp.isfinite(ratio)
        eps_new = jnp.where(done, eps,
                            eps * jnp.where(direction > 0, 2.0, 0.5))
        return (eps_new, done), None

    (eps, _), _ = jax.lax.scan(body, (eps0, jnp.zeros((B,), bool)),
                               None, length=max_probes)
    return jnp.clip(eps, 1e-8, 1e2)


def run_nuts(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: NUTSConfig,
    *,
    n_chains: int = 1,
    jitter: float = 0.1,
    value_and_grad_batch: Optional[Callable] = None,
    chain_sharding=None,
    segments: int = 1,
    initial_state: Optional[NUTSState] = None,
    on_segment: Optional[Callable] = None,
) -> NUTSResult:
    """Run NUTS for an ensemble of chains (batched trees, scanned iterations).

    ``value_and_grad_batch(thetas (B, d)) -> (logp (B,), grad (B, d))``
    overrides the default ``vmap(value_and_grad(loglik))`` — pass the Pallas
    adjoint engine (:func:`mmidv1_tpu.ops.build_objective_pallas_grad`) to
    run the gradients through the kernel pair.

    ``chain_sharding`` (a ``NamedSharding`` splitting the leading axis over a
    mesh) places the initial ensemble state; XLA then propagates the chain
    partitioning through the whole scanned tree program (GSPMD — every tree
    operation is chain-local, so no collectives are needed until the final
    best-chain argmax). Use :func:`mmidv1_tpu.parallel.run_nuts_gspmd`.

    ``segments`` splits the iteration scan into that many equal device
    dispatches (one compiled program, called repeatedly with the carried
    sampler state — adaptation state included, so the result is identical
    to a single scan). Long campaigns need this: a production run is
    minutes of device time, and a single monolithic dispatch holds one
    RPC/driver deadline open for the whole run (observed: UNAVAILABLE
    device errors on a tunneled TPU at ~3 min), while segmenting also
    bounds the (iterations, B, d) sample history the device must hold.

    ``initial_state`` (a :class:`NUTSState`) resumes a checkpointed run:
    with the same master ``key`` and ``cfg`` the continuation is
    bit-identical to the uninterrupted run, because the per-iteration key
    table is a pure function of the master key sliced at ``state.it``.
    The returned samples cover only the iterations run by THIS call
    (``state.it`` .. ``cfg.iterations``); the caller concatenates across
    resumes. ``on_segment(state, xs, lps)`` fires after each segment with
    the carried :class:`NUTSState` and that segment's samples — hook for
    atomic on-disk checkpoints during multi-hour campaigns on preemptible
    or tunnel-flaky devices. A truthy return stops the run after that
    segment (early convergence stop); the samples gathered so far are
    returned, and a later resume continues bit-exactly from the stop.
    """
    dtype = jnp.asarray(theta0).dtype
    d = space.dim
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))

    def safe_vag(thetas):
        lp, g = value_and_grad_batch(thetas)
        lp = jnp.where(jnp.isfinite(lp), lp, -1e18)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return lp, g

    k_init, k_eps, k_run = jax.random.split(key, 3)
    if initial_state is None:
        theta0 = jnp.asarray(theta0, dtype=dtype)
        if theta0.ndim == 2:
            # warm ensemble start: one row per chain, used verbatim (mass
            # re-adaptation rounds continue chains from their current
            # positions)
            if theta0.shape[0] != n_chains:
                raise ValueError(
                    f"2-D theta0 warm start must have n_chains rows: got "
                    f"{theta0.shape[0]} rows for n_chains={n_chains}")
            x0 = space.clamp(theta0)
        else:
            noise = jax.random.normal(k_init, (n_chains, d), dtype=dtype)
            x0 = theta0[None, :] + \
                jitter * space.sigmas.astype(dtype) * noise
            x0 = x0.at[0].set(theta0)
            x0 = space.clamp(x0)

        if chain_sharding is not None:
            x0 = jax.device_put(x0, chain_sharding)
        eps0 = find_reasonable_epsilon(safe_vag, space, x0, space.sigmas,
                                       k_eps)
        if chain_sharding is not None:
            eps0 = jax.device_put(eps0, chain_sharding)

    gamma, t0, kappa = 0.05, 10.0, 0.75
    B = n_chains

    def one_iteration(carry, k_iter):
        (x, logp, grad, eps, log_eps_bar, h_bar, mu, it, best_x,
         best_logp) = carry
        k_r, k_u, k_tree = jax.random.split(k_iter, 3)
        r0 = jax.random.normal(k_r, x.shape, dtype=dtype)
        joint0 = logp - 0.5 * _dot(r0, r0)
        log_u = joint0 + jnp.log(jax.random.uniform(k_u, (B,), dtype=dtype,
                                                    minval=1e-12))

        # doubling loop, unrolled over depth with per-chain validity masking
        state = _Tree(x, r0, grad, x, r0, grad, x, logp,
                      jnp.ones((B,), jnp.int32), jnp.ones((B,), jnp.int32),
                      jnp.zeros((B,), dtype), jnp.ones((B,), dtype))
        sample_x, sample_logp = x, logp
        # Hoffman & Gelman Alg. 6 starts the dual-averaging accept statistic
        # empty; a pseudo-observation (0.5, 1) would bias it toward 0.5 for
        # shallow trees and slow step-size adaptation (round-1 advisor).
        alpha_stat = jnp.zeros((B,), dtype)
        n_alpha_stat = jnp.zeros((B,), dtype)
        keys = jax.random.split(k_tree, cfg.max_tree_depth)
        n_cum = jnp.ones((B,), dtype)
        depth_count = jnp.zeros((B,), dtype)
        for j in range(cfg.max_tree_depth):
            kv, kt, ks = jax.random.split(keys[j], 3)
            v = jnp.where(jax.random.uniform(kv, (B,), dtype=dtype) < 0.5,
                          -1.0, 1.0)
            pos = v > 0
            edge_theta = _w(pos, state.theta_plus, state.theta_minus)
            edge_r = _w(pos, state.r_plus, state.r_minus)
            edge_grad = _w(pos, state.grad_plus, state.grad_minus)
            sub = _build_tree(safe_vag, space, edge_theta, edge_r, edge_grad,
                              log_u, v, j, eps, joint0, kt)
            valid = state.s_prime == 1
            depth_count = depth_count + valid.astype(dtype)
            # Metropolis-within-doubling acceptance of the new subtree sample
            accept_prob = sub.n_prime.astype(dtype) / jnp.maximum(n_cum, 1.0)
            take = valid & (sub.s_prime == 1) & \
                (jax.random.uniform(ks, (B,), dtype=dtype) < accept_prob)
            sample_x = _w(take, sub.theta_prime, sample_x)
            sample_logp = _w(take, sub.logp_prime, sample_logp)
            alpha_stat = jnp.where(valid, alpha_stat + sub.alpha, alpha_stat)
            n_alpha_stat = jnp.where(valid, n_alpha_stat + sub.n_alpha,
                                     n_alpha_stat)
            n_cum = jnp.where(valid, n_cum + sub.n_prime, n_cum)

            theta_minus = _w(valid & ~pos, sub.theta_minus, state.theta_minus)
            r_minus = _w(valid & ~pos, sub.r_minus, state.r_minus)
            grad_minus = _w(valid & ~pos, sub.grad_minus, state.grad_minus)
            theta_plus = _w(valid & pos, sub.theta_plus, state.theta_plus)
            r_plus = _w(valid & pos, sub.r_plus, state.r_plus)
            grad_plus = _w(valid & pos, sub.grad_plus, state.grad_plus)
            dtheta = theta_plus - theta_minus
            no_uturn = ((_dot(dtheta, r_minus) >= 0) &
                        (_dot(dtheta, r_plus) >= 0))
            s_new = jnp.where(valid,
                              sub.s_prime * no_uturn.astype(jnp.int32),
                              state.s_prime)
            state = state._replace(
                theta_minus=theta_minus, r_minus=r_minus,
                grad_minus=grad_minus, theta_plus=theta_plus, r_plus=r_plus,
                grad_plus=grad_plus, s_prime=s_new)

        accept_stat = alpha_stat / jnp.maximum(n_alpha_stat, 1.0)
        new_logp, new_grad = safe_vag(sample_x)
        # non-finite iteration -> repeat previous sample (:99-106)
        ok = jnp.isfinite(new_logp) & (new_logp > -1e17)
        x_new = _w(ok, sample_x, x)
        logp_new = jnp.where(ok, new_logp, logp)
        grad_new = _w(ok, new_grad, grad)

        # dual averaging (:167-181)
        in_window = it < cfg.adaptation_window
        t = it.astype(dtype) + 1.0
        h_bar_new = (1.0 - 1.0 / (t + t0)) * h_bar + \
            (cfg.delta_target - accept_stat) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar_new
        eta = t ** (-kappa)
        log_eps_bar_new = eta * log_eps + (1 - eta) * log_eps_bar
        eps_new = jnp.where(in_window, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        eps_new = jnp.clip(eps_new, cfg.eps_floor, cfg.eps_ceil)
        h_bar = jnp.where(in_window, h_bar_new, h_bar)
        log_eps_bar = jnp.where(in_window, log_eps_bar_new, log_eps_bar)

        better = logp_new > best_logp
        best_x = _w(better, x_new, best_x)
        best_logp = jnp.where(better, logp_new, best_logp)

        carry = NUTSState(x_new, logp_new, grad_new, eps_new, log_eps_bar,
                          h_bar, mu, it + 1, best_x, best_logp)
        return carry, (x_new, logp_new, accept_stat, depth_count)

    @jax.jit
    def init_carry(x0, eps0):
        logp0, grad0 = safe_vag(x0)
        return NUTSState(x0, logp0, grad0, eps0, jnp.log(eps0),
                         jnp.zeros((n_chains,), dtype=dtype),
                         jnp.log(10.0 * eps0),
                         jnp.zeros((), jnp.int32), x0, logp0)

    @jax.jit
    def run_segment(carry, keys):
        return jax.lax.scan(one_iteration, carry, keys)

    # One host-side key split for ALL iterations, sliced per segment: the
    # draws (and therefore the chains) are identical for any `segments`
    # and across checkpoint/resume boundaries.
    all_keys = jax.random.split(k_run, cfg.iterations)
    seg_len = -(-cfg.iterations // max(1, segments))
    if initial_state is not None:
        carry = initial_state
        if chain_sharding is not None:
            carry = jax.tree_util.tree_map(
                lambda v: jax.device_put(v, chain_sharding)
                if jnp.ndim(v) >= 1 else v, carry)
        start = int(carry.it)
    else:
        carry = init_carry(x0, eps0)
        start = 0
    xs_parts, lps_parts, acc_sum, dep_sum, n_acc = [], [], 0.0, 0.0, 0
    for lo in range(start, cfg.iterations, seg_len):
        keys = all_keys[lo:lo + seg_len]
        carry, (xs, lps, accs, deps) = run_segment(carry, keys)
        jax.block_until_ready(lps)      # bound each device dispatch
        xs_parts.append(xs)
        lps_parts.append(lps)
        acc_sum = acc_sum + jnp.sum(accs, axis=0)
        dep_sum = dep_sum + jnp.sum(deps, axis=0)
        n_acc += keys.shape[0]
        if on_segment is not None:
            if on_segment(carry, xs, lps):
                break              # early stop requested (e.g. gate met)
    if not xs_parts:                     # resume of an already-finished run
        xs_parts = [jnp.zeros((0, B, d), dtype)]
        lps_parts = [jnp.zeros((0, B), dtype)]
        acc_sum = jnp.zeros((B,), dtype)
        dep_sum = jnp.zeros((B,), dtype)
        n_acc = 1
    (x, logp, _g, eps, _leb, _hb, _mu, _it, best_x, best_logp) = carry
    bc = jnp.argmax(best_logp)
    return NUTSResult(samples=jnp.concatenate(xs_parts, axis=0),
                      sample_logps=jnp.concatenate(lps_parts, axis=0),
                      best_x=best_x[bc], best_logp=best_logp[bc],
                      step_sizes=eps, mean_accept=acc_sum / n_acc,
                      mean_depth=dep_sum / n_acc)


def run_nuts_whitened(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: NUTSConfig,
    *,
    n_chains: int = 1,
    jitter: float = 0.1,
    value_and_grad_batch: Optional[Callable] = None,
    chain_sharding=None,
    segments: int = 1,
) -> NUTSResult:
    """:func:`run_nuts` in sigma-whitened coordinates ``z = theta / sigmas``.

    Equivalent to a diagonal mass matrix ``M = diag(1 / sigmas**2)`` — the
    kinetic energy ``0.5 r^T M^{-1} r`` with leapfrog ``theta += eps M^{-1} r``
    collapses to unit-mass NUTS on ``z`` because the whitening is a pure
    scaling (bounds transform linearly, so reflect/clamp commute with it).
    On targets whose per-parameter scales span orders of magnitude (the
    Spain-2020 space mixes O(0.1) rates with O(10) day counts) the unit-mass
    sampler's step size is pinned by the stiffest coordinate; whitening by
    the proposal sigmas restores a comparable step in every direction — the
    same information the reference's AM proposal uses
    (``SEPAIHRDModelCalibration.cpp:214-236`` seeds its covariance from the
    same sigma file). Returned samples/best_x are mapped back to theta
    units; step_sizes stay in WHITENED units (``eps * sigma_i`` is the
    per-coordinate leapfrog step in theta units).
    """
    dtype = jnp.asarray(theta0).dtype
    s = space.sigmas.astype(dtype)
    s = jnp.where(s > 0, s, jnp.ones_like(s))
    w_space = dataclasses.replace(
        space,
        lower=jnp.asarray(space.lower, dtype) / s,
        upper=jnp.asarray(space.upper, dtype) / s,
        sigmas=jnp.ones_like(s))
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))

    def vag_z(zs):
        lp, g = value_and_grad_batch(zs * s)
        return lp, g * s

    res = run_nuts(lambda z: loglik(z * s), w_space,
                   jnp.asarray(theta0, dtype) / s, key, cfg,
                   n_chains=n_chains, jitter=jitter,
                   value_and_grad_batch=vag_z, chain_sharding=chain_sharding,
                   segments=segments)
    return res._replace(samples=res.samples * s, best_x=res.best_x * s)


def run_nuts_dense(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    key: jax.Array,
    cfg: NUTSConfig,
    *,
    mu: jnp.ndarray,
    scale: jnp.ndarray,
    n_chains: int = 1,
    jitter: float = 1.0,
    value_and_grad_batch: Optional[Callable] = None,
    chain_sharding=None,
    segments: int = 1,
    init: Optional[jnp.ndarray] = None,
    initial_state: Optional[NUTSState] = None,
    on_segment: Optional[Callable] = None,
) -> NUTSResult:
    """:func:`run_nuts` with a DENSE mass matrix: ``theta = mu + scale @ z``.

    ``scale`` is any (d, d) factor of the target covariance (typically the
    Cholesky factor of the Laplace covariance at the polished MAP), so the
    sampler sees an approximately isotropic unit-Gaussian target in ``z``.
    A diagonal mass (:func:`run_nuts_whitened`) cannot fix CORRELATED
    stiffness: on the Spain-2020 posterior the marginal-std-whitened
    correlation matrix is ill-conditioned enough to pin the dual-averaged
    step at ~3e-3 (measured, campaign r2); dense whitening restores an O(0.1)
    step.

    Bounds: an axis-aligned box in theta maps to a rotated parallelotope in
    ``z``, which the per-coordinate clamp cannot represent — so ``z`` is
    sampled UNBOUNDED and the objective's MCMC_REFLECT mode
    (``SEPAIHRDParameterManager.cpp`` reflection semantics, applied inside
    the objective) folds out-of-box excursions back in, preserving detailed
    balance. Returned samples are reflected into the box in theta units.
    Chains start at ``mu`` jittered by ``jitter`` posterior stds (isotropic
    in z).
    """
    dtype = jnp.asarray(mu).dtype
    d = space.dim
    S = jnp.asarray(scale, dtype)
    mu = jnp.asarray(mu, dtype)
    inf = jnp.full((d,), jnp.inf, dtype)
    z_space = dataclasses.replace(space, lower=-inf, upper=inf,
                                  sigmas=jnp.ones((d,), dtype))
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))

    def vag_z(zs):                      # zs: (B, d)
        lp, g = value_and_grad_batch(mu[None, :] + _mm(zs, S.T))
        return lp, _mm(g, S)

    if init is not None:
        # warm ensemble start at given theta positions: z = S^-1 (theta - mu).
        # General solve, not solve_triangular: `scale` is documented as ANY
        # (d, d) covariance factor, not necessarily lower-triangular.
        z0 = jnp.linalg.solve(
            S, (jnp.asarray(init, dtype) - mu[None, :]).T).T
    else:
        z0 = jnp.zeros((d,), dtype)
    to_theta = lambda z: space.reflect(mu + _mm(z, S.T))
    # the checkpoint state lives in z-coordinates (opaque to the caller;
    # valid only with the same mu/scale) — the callback gets theta samples
    on_seg_z = None
    if on_segment is not None:
        on_seg_z = lambda st, xs, lps: on_segment(st, to_theta(xs), lps)
    res = run_nuts(lambda z: loglik(mu + _mm(S, z)), z_space,
                   z0, key, cfg,
                   n_chains=n_chains, jitter=jitter,
                   value_and_grad_batch=vag_z, chain_sharding=chain_sharding,
                   segments=segments, initial_state=initial_state,
                   on_segment=on_seg_z)
    return res._replace(samples=to_theta(res.samples),
                        best_x=space.reflect(mu + _mm(res.best_x, S.T)),
                        step_sizes=res.step_sizes)


def logit_transform(theta, lower, upper, eps: float = 1e-6, power=1.0):
    """Box -> R^d: the POWER-LOGIT bijection ``u = sigmoid(k*y)^(1/k)``
    inverted, i.e. ``y = log(u) - (1/k) log(1 - u^k)`` with
    ``u = (theta - lo) / width``, clipping ``eps`` of the width off each
    wall so on-the-wall draws (clamp-mode traces) map to finite y.

    ``power`` (k, scalar or per-parameter vector, default 1) selects the
    transform family: k=1 is the standard logit; large k is LOG-LIKE over
    the bulk (u < ~0.8) while still compactifying the upper wall. Why it
    exists (measured, r12 trace): the beta_j*kappa_j NPI degeneracies are
    perfectly straight in (log beta, log kappa) — quadratic fit removes
    ~1% of the transverse width — but strongly banana-shaped under plain
    logit (~80% removed), because logit's ``-log(1-u)`` term bends the
    line in the mid-box region. A curved valley defeats any fixed dense
    mass (the local stiff transverse rotates along the valley), so
    straightening the coordinates is the fix, not more mass refinement.
    NumPy/JAX polymorphic."""
    np_ = jnp if isinstance(theta, jnp.ndarray) else __import__("numpy")
    w = np_.maximum(upper - lower, 1e-30)
    u = np_.clip((theta - lower) / w, eps, 1.0 - eps)
    k = power
    return np_.log(u) - np_.log1p(-(u ** k)) / k


def run_nuts_logit(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    key: jax.Array,
    cfg: NUTSConfig,
    *,
    mu: jnp.ndarray,
    scale: jnp.ndarray,
    n_chains: int = 1,
    jitter: float = 1.0,
    value_and_grad_batch: Optional[Callable] = None,
    chain_sharding=None,
    segments: int = 1,
    init: Optional[jnp.ndarray] = None,
    initial_state: Optional[NUTSState] = None,
    on_segment: Optional[Callable] = None,
    power: Optional[jnp.ndarray] = None,
) -> NUTSResult:
    """:func:`run_nuts` in UNCONSTRAINED power-logit coordinates with a
    dense mass.

    The box constraint is ELIMINATED rather than enforced:
    ``theta = lo + width * sigmoid(y)`` maps R^d onto the open box, and the
    log-Jacobian ``sum(log width + log sig + log(1 - sig))`` joins the
    target, so the sampled theta-marginal law is exactly the bounded
    posterior (change of variables; the reference's MCMC_REFLECT mode,
    ``SEPAIHRDParameterManager.cpp`` reflectBound, achieves the same law by
    folding — but folding leaves gradient discontinuities at the walls).

    Why this exists (measured, campaign r9): the Spain-2020 posterior pins
    NINE parameters against their bounds — ``p_1`` sits AT its upper bound
    in 100% of draws; ``sigma``/``gamma_p``/``d_H_2``/... hug their lower
    bounds at ~2e-4..2e-3 of their widths. Under clamp/reflect handling
    every trajectory slams a wall, the leapfrog's energy error explodes
    there, dual averaging crushes the step to ~4e-4 (whitened), and mixing
    along the posterior's broad soft ridge freezes: split-R-hat stuck ~5.5
    after 2000 iterations at depth 9. In logit coordinates the same
    posterior is smooth everywhere — the walls become exponential tails
    with O(1) scale in y — so the step size is set by the posterior's bulk
    curvature instead of the wall collisions.

    ``mu``/``scale``: dense mass in Y-space (``y = mu + scale @ z``),
    estimated from a logit-transformed previous trace
    (:func:`logit_transform`). ``init``: warm ensemble in THETA units.
    Returned samples/best_x are in theta units and ``sample_logps`` are the
    PURE log-likelihood (Jacobian removed), so diagnostics, reports and the
    float64 MAP re-selection compare like-for-like with every other
    sampler's trace.
    """
    dtype = jnp.asarray(mu).dtype
    d = space.dim
    lo = jnp.asarray(space.lower, dtype)
    width = jnp.maximum(jnp.asarray(space.upper, dtype) - lo, 1e-30)
    S = jnp.asarray(scale, dtype)
    mu = jnp.asarray(mu, dtype)
    k = (jnp.ones((d,), dtype) if power is None
         else jnp.asarray(power, dtype))
    inf = jnp.full((d,), jnp.inf, dtype)
    z_space = dataclasses.replace(space, lower=-inf, upper=inf,
                                  sigmas=jnp.ones((d,), dtype))
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))
    log_w_sum = jnp.sum(jnp.log(width))

    # power-logit forward pieces, saturation-stable:
    #   u       = sigmoid(k y)^(1/k) = exp(log_sigmoid(k y) / k)
    #   du/dy   = u * sigmoid(-k y)
    #   log|J|  = log w + log_sigmoid(k y)/k + log_sigmoid(-k y)
    #   dlogJ/dy= sigmoid(-k y) - k*sigmoid(k y)   (k=1: 1 - 2*sigmoid)
    def _u_of(ys):
        return jnp.exp(jax.nn.log_sigmoid(k * ys) / k)

    def vag_z(zs):                      # zs: (B, d) -> y -> theta
        ys = mu[None, :] + _mm(zs, S.T)
        u = _u_of(ys)
        sig_m = jax.nn.sigmoid(-k * ys)
        th = lo[None, :] + width[None, :] * u
        lp, g = value_and_grad_batch(th)
        jac = log_w_sum + jnp.sum(jax.nn.log_sigmoid(k * ys) / k +
                                  jax.nn.log_sigmoid(-k * ys), axis=-1)
        gy = g * (width[None, :] * u * sig_m) +             (sig_m - k * jax.nn.sigmoid(k * ys))
        return lp + jac, _mm(gy, S)

    def scalar_logp(z):
        y = mu + _mm(S, z)
        jac = log_w_sum + jnp.sum(jax.nn.log_sigmoid(k * y) / k +
                                  jax.nn.log_sigmoid(-k * y))
        return loglik(lo + width * _u_of(y)) + jac

    if init is not None:
        y0 = logit_transform(jnp.asarray(init, dtype), lo, width + lo,
                             power=k)
        z0 = jnp.linalg.solve(S, (y0 - mu[None, :]).T).T
    else:
        z0 = jnp.zeros((d,), dtype)

    def to_theta(z):
        return lo + width * _u_of(mu + _mm(z, S.T))

    def pure_lp(theta, lp_with_jac):
        """Strip the Jacobian using theta only (exact inverse of vag_z's
        addition up to the transform's own clip, which only binds in the
        saturated tail where theta is pinned to the wall anyway)."""
        y = logit_transform(theta, lo, width + lo, power=k)
        jac = log_w_sum + jnp.sum(jax.nn.log_sigmoid(k * y) / k +
                                  jax.nn.log_sigmoid(-k * y), axis=-1)
        return lp_with_jac - jac

    on_seg_z = None
    if on_segment is not None:
        def on_seg_z(st, xs, lps):
            th = to_theta(xs)
            return on_segment(st, th, pure_lp(th, lps))

    res = run_nuts(scalar_logp, z_space, z0, key, cfg,
                   n_chains=n_chains, jitter=jitter,
                   value_and_grad_batch=vag_z, chain_sharding=chain_sharding,
                   segments=segments, initial_state=initial_state,
                   on_segment=on_seg_z)
    th_samples = to_theta(res.samples)
    th_best = to_theta(res.best_x[None, :] if res.best_x.ndim == 1
                       else res.best_x)
    th_best = th_best[0] if res.best_x.ndim == 1 else th_best
    return res._replace(
        samples=th_samples,
        sample_logps=pure_lp(th_samples, res.sample_logps),
        best_x=th_best,
        best_logp=pure_lp(th_best[None, :], res.best_logp[None])[0]
        if res.best_logp.ndim == 0 else pure_lp(th_best, res.best_logp))

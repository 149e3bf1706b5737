"""No-U-Turn Sampler with exact gradients through the ODE solve.

TPU-native re-design of ``NUTSSampler``
(reference: ``src/model/optimizers/NUTSSampler.cpp``, Hoffman & Gelman 2014
Alg. 6). The single biggest qualitative upgrade over the reference: the gradient
comes from ``jax.grad`` through the fixed-grid Dopri5 solve (exact reverse-mode
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
one fused device program with 2^depth leapfrog steps and `lax.cond` joins; an
ensemble of chains is vmapped over it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

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

    @classmethod
    def from_settings(cls, s: dict) -> "NUTSConfig":
        g = s.get
        return cls(iterations=int(g("nuts_iterations", 25)),
                   adaptation_window=int(g("nuts_adaptation_window", 5)),
                   delta_target=float(g("nuts_delta_target", 0.8)),
                   max_tree_depth=int(g("nuts_max_tree_depth", 3)))


class NUTSResult(NamedTuple):
    samples: jnp.ndarray        # (iterations, B, d)
    sample_logps: jnp.ndarray   # (iterations, B)
    best_x: jnp.ndarray
    best_logp: jnp.ndarray
    step_sizes: jnp.ndarray     # (B,) final adapted step sizes
    mean_accept: jnp.ndarray    # (B,)


def _clip_grad(g):
    norm = jnp.linalg.norm(g)
    factor = jnp.where(norm > GRAD_CLIP_NORM, GRAD_CLIP_NORM / norm, 1.0)
    return jnp.where(jnp.isfinite(factor), g * factor, jnp.zeros_like(g))


def _leapfrog(value_and_grad, space, theta, r, grad, eps):
    """One leapfrog step with constraint clamping (:289-318)."""
    r_half = r + 0.5 * eps * _clip_grad(grad)
    theta_new = space.clamp(theta + eps * r_half)
    logp_new, grad_new = value_and_grad(theta_new)
    r_new = r_half + 0.5 * eps * _clip_grad(grad_new)
    return theta_new, r_new, logp_new, grad_new


class _Tree(NamedTuple):
    theta_minus: jnp.ndarray
    r_minus: jnp.ndarray
    grad_minus: jnp.ndarray
    theta_plus: jnp.ndarray
    r_plus: jnp.ndarray
    grad_plus: jnp.ndarray
    theta_prime: jnp.ndarray
    logp_prime: jnp.ndarray
    n_prime: jnp.ndarray
    s_prime: jnp.ndarray
    alpha: jnp.ndarray
    n_alpha: jnp.ndarray


def _build_tree(value_and_grad, space, theta, r, grad, log_u, v, j, eps, logp0_r0,
                key):
    """Recursive doubling, unrolled at trace time (j is a python int)."""
    if j == 0:
        # single leapfrog step in direction v
        r_half = r + 0.5 * (v * eps) * _clip_grad(grad)
        theta1 = space.clamp(theta + (v * eps) * r_half)
        logp1, grad1 = value_and_grad(theta1)
        r1 = r_half + 0.5 * (v * eps) * _clip_grad(grad1)

        joint = logp1 - 0.5 * jnp.dot(r1, r1)
        finite = jnp.isfinite(joint)
        n1 = jnp.where(finite & (log_u <= joint), 1, 0)
        s1 = jnp.where(finite & (log_u < joint + DELTA_MAX), 1, 0)
        alpha = jnp.where(finite, jnp.minimum(1.0, jnp.exp(joint - logp0_r0)), 0.0)
        return _Tree(theta1, r1, grad1, theta1, r1, grad1, theta1, logp1,
                     n1, s1, alpha, jnp.asarray(1.0, theta.dtype))

    k1, k2, k3 = jax.random.split(key, 3)
    t1 = _build_tree(value_and_grad, space, theta, r, grad, log_u, v, j - 1, eps,
                     logp0_r0, k1)

    def extend(t: _Tree) -> _Tree:
        # grow in direction v from the appropriate edge
        edge_theta = jnp.where(v > 0, t.theta_plus, t.theta_minus)
        edge_r = jnp.where(v > 0, t.r_plus, t.r_minus)
        edge_grad = jnp.where(v > 0, t.grad_plus, t.grad_minus)
        t2 = _build_tree(value_and_grad, space, edge_theta, edge_r, edge_grad,
                         log_u, v, j - 1, eps, logp0_r0, k2)
        theta_minus = jnp.where(v > 0, t.theta_minus, t2.theta_minus)
        r_minus = jnp.where(v > 0, t.r_minus, t2.r_minus)
        grad_minus = jnp.where(v > 0, t.grad_minus, t2.grad_minus)
        theta_plus = jnp.where(v > 0, t2.theta_plus, t.theta_plus)
        r_plus = jnp.where(v > 0, t2.r_plus, t.r_plus)
        grad_plus = jnp.where(v > 0, t2.grad_plus, t.grad_plus)

        n_tot = t.n_prime + t2.n_prime
        take2 = (jax.random.uniform(k3, dtype=t.logp_prime.dtype) <
                 t2.n_prime / jnp.maximum(n_tot, 1))
        theta_prime = jnp.where(take2, t2.theta_prime, t.theta_prime)
        logp_prime = jnp.where(take2, t2.logp_prime, t.logp_prime)

        dtheta = theta_plus - theta_minus
        no_uturn = ((jnp.dot(dtheta, r_minus) >= 0) &
                    (jnp.dot(dtheta, r_plus) >= 0)).astype(t.s_prime.dtype)
        s = t2.s_prime * no_uturn
        return _Tree(theta_minus, r_minus, grad_minus, theta_plus, r_plus,
                     grad_plus, theta_prime, logp_prime, n_tot, s,
                     t.alpha + t2.alpha, t.n_alpha + t2.n_alpha)

    # only extend if the first subtree is still valid
    return jax.lax.cond(t1.s_prime == 1, extend, lambda t: t, t1)


def find_reasonable_epsilon(value_and_grad, space, theta0, sigmas, key,
                            max_probes: int = 5):
    """Heuristic initial epsilon (:215-286): start from the mean proposal sigma,
    then double/halve until the one-step acceptance crosses 0.5."""
    dtype = theta0.dtype
    eps0 = jnp.maximum(jnp.mean(sigmas.astype(dtype)), 1e-4)
    logp0, grad0 = value_and_grad(theta0)
    r0 = jax.random.normal(key, theta0.shape, dtype=dtype)
    joint0 = logp0 - 0.5 * jnp.dot(r0, r0)

    def probe_ratio(eps):
        r_half = r0 + 0.5 * eps * _clip_grad(grad0)
        theta1 = space.clamp(theta0 + eps * r_half)
        logp1, grad1 = value_and_grad(theta1)
        r1 = r_half + 0.5 * eps * _clip_grad(grad1)
        joint1 = logp1 - 0.5 * jnp.dot(r1, r1)
        return joint1 - joint0

    ratio = probe_ratio(eps0)
    direction = jnp.where(ratio > jnp.log(0.5), 1.0, -1.0)

    def body(carry, _):
        eps, done = carry
        ratio = probe_ratio(eps)
        crossed = jnp.where(direction > 0, ratio <= jnp.log(0.5),
                            ratio > jnp.log(0.5))
        done = done | crossed | ~jnp.isfinite(ratio)
        eps_new = jnp.where(done, eps, eps * jnp.where(direction > 0, 2.0, 0.5))
        return (eps_new, done), None

    (eps, _), _ = jax.lax.scan(body, (eps0, jnp.asarray(False)),
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
) -> NUTSResult:
    """Run NUTS for an ensemble of chains (vmapped trees, scanned iterations)."""
    dtype = jnp.asarray(theta0).dtype
    d = space.dim
    vag = jax.value_and_grad(loglik)

    def safe_vag(theta):
        lp, g = vag(theta)
        lp = jnp.where(jnp.isfinite(lp), lp, -1e18)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return lp, g

    k_init, k_eps, k_run = jax.random.split(key, 3)
    noise = jax.random.normal(k_init, (n_chains, d), dtype=dtype)
    x0 = jnp.asarray(theta0, dtype=dtype)[None, :] + \
        jitter * space.sigmas.astype(dtype) * noise
    x0 = x0.at[0].set(jnp.asarray(theta0, dtype=dtype))
    x0 = jax.vmap(space.clamp)(x0)

    eps0 = jax.vmap(lambda x, k: find_reasonable_epsilon(safe_vag, space, x,
                                                         space.sigmas, k))(
        x0, jax.random.split(k_eps, n_chains))

    mu = jnp.log(10.0 * eps0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def one_iteration(carry, xs):
        x, logp, grad, eps, log_eps_bar, h_bar, it, best_x, best_logp = carry
        k_iter = xs

        def chain_step(x, logp, grad, eps, k):
            k_r, k_u, k_tree = jax.random.split(k, 3)
            r0 = jax.random.normal(k_r, x.shape, dtype=dtype)
            joint0 = logp - 0.5 * jnp.dot(r0, r0)
            log_u = joint0 + jnp.log(jax.random.uniform(k_u, dtype=dtype,
                                                        minval=1e-12))

            # doubling loop, unrolled over depth with validity masking
            state = _Tree(x, r0, grad, x, r0, grad, x, logp,
                          jnp.asarray(1, jnp.int32), jnp.asarray(1, jnp.int32),
                          jnp.asarray(0.0, dtype), jnp.asarray(1.0, dtype))
            sample_x, sample_logp = x, logp
            # Hoffman & Gelman Alg. 6 starts the dual-averaging accept statistic
            # empty; a pseudo-observation (0.5, 1) would bias it toward 0.5 for
            # shallow trees and slow step-size adaptation (round-1 advisor).
            alpha_stat = jnp.asarray(0.0, dtype)
            n_alpha_stat = jnp.asarray(0.0, dtype)
            keys = jax.random.split(k_tree, cfg.max_tree_depth)
            n_cum = jnp.asarray(1.0, dtype)
            for j in range(cfg.max_tree_depth):
                kv, kt, ks = jax.random.split(keys[j], 3)
                v = jnp.where(jax.random.uniform(kv, dtype=dtype) < 0.5, -1.0, 1.0)
                edge_theta = jnp.where(v > 0, state.theta_plus, state.theta_minus)
                edge_r = jnp.where(v > 0, state.r_plus, state.r_minus)
                edge_grad = jnp.where(v > 0, state.grad_plus, state.grad_minus)
                sub = _build_tree(safe_vag, space, edge_theta, edge_r, edge_grad,
                                  log_u, v, j, eps, joint0, kt)
                valid = state.s_prime == 1
                # Metropolis-within-doubling acceptance of the new subtree sample
                accept_prob = sub.n_prime.astype(dtype) / jnp.maximum(n_cum, 1.0)
                take = valid & (sub.s_prime == 1) & \
                    (jax.random.uniform(ks, dtype=dtype) < accept_prob)
                sample_x = jnp.where(take, sub.theta_prime, sample_x)
                sample_logp = jnp.where(take, sub.logp_prime, sample_logp)
                alpha_stat = jnp.where(valid, alpha_stat + sub.alpha, alpha_stat)
                n_alpha_stat = jnp.where(valid, n_alpha_stat + sub.n_alpha,
                                         n_alpha_stat)
                n_cum = jnp.where(valid, n_cum + sub.n_prime, n_cum)

                theta_minus = jnp.where(valid & (v < 0), sub.theta_minus,
                                        state.theta_minus)
                r_minus = jnp.where(valid & (v < 0), sub.r_minus, state.r_minus)
                grad_minus = jnp.where(valid & (v < 0), sub.grad_minus,
                                       state.grad_minus)
                theta_plus = jnp.where(valid & (v > 0), sub.theta_plus,
                                       state.theta_plus)
                r_plus = jnp.where(valid & (v > 0), sub.r_plus, state.r_plus)
                grad_plus = jnp.where(valid & (v > 0), sub.grad_plus,
                                      state.grad_plus)
                dtheta = theta_plus - theta_minus
                no_uturn = ((jnp.dot(dtheta, r_minus) >= 0) &
                            (jnp.dot(dtheta, r_plus) >= 0))
                s_new = jnp.where(valid,
                                  sub.s_prime * no_uturn.astype(jnp.int32),
                                  state.s_prime)
                state = state._replace(
                    theta_minus=theta_minus, r_minus=r_minus, grad_minus=grad_minus,
                    theta_plus=theta_plus, r_plus=r_plus, grad_plus=grad_plus,
                    s_prime=s_new)

            accept_stat = alpha_stat / jnp.maximum(n_alpha_stat, 1.0)
            new_logp, new_grad = safe_vag(sample_x)
            # non-finite iteration -> repeat previous sample (:99-106)
            ok = jnp.isfinite(new_logp) & (new_logp > -1e17)
            x_out = jnp.where(ok, sample_x, x)
            logp_out = jnp.where(ok, new_logp, logp)
            grad_out = jnp.where(ok[..., None] if new_grad.ndim else ok,
                                 new_grad, grad)
            return x_out, logp_out, grad_out, accept_stat

        keys = jax.random.split(k_iter, n_chains)
        x_new, logp_new, grad_new, accept_stat = jax.vmap(chain_step)(
            x, logp, grad, eps, keys)

        # dual averaging (:167-181)
        in_window = it < cfg.adaptation_window
        t = it.astype(dtype) + 1.0
        h_bar_new = (1.0 - 1.0 / (t + t0)) * h_bar + \
            (cfg.delta_target - accept_stat) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar_new
        eta = t ** (-kappa)
        log_eps_bar_new = eta * log_eps + (1 - eta) * log_eps_bar
        eps_new = jnp.where(in_window, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        h_bar = jnp.where(in_window, h_bar_new, h_bar)
        log_eps_bar = jnp.where(in_window, log_eps_bar_new, log_eps_bar)

        better = logp_new > best_logp
        best_x = jnp.where(better[:, None], x_new, best_x)
        best_logp = jnp.where(better, logp_new, best_logp)

        carry = (x_new, logp_new, grad_new, eps_new, log_eps_bar, h_bar, it + 1,
                 best_x, best_logp)
        return carry, (x_new, logp_new, accept_stat)

    @jax.jit
    def run(x0, eps0, k_run):
        logp0, grad0 = jax.vmap(safe_vag)(x0)
        carry = (x0, logp0, grad0, eps0, jnp.log(eps0),
                 jnp.zeros((n_chains,), dtype=dtype),
                 jnp.zeros((), jnp.int32), x0, logp0)
        keys = jax.random.split(k_run, cfg.iterations)
        carry, (xs, lps, accs) = jax.lax.scan(one_iteration, carry, keys)
        (x, logp, _g, eps, _leb, _hb, _it, best_x, best_logp) = carry
        bc = jnp.argmax(best_logp)
        return NUTSResult(samples=xs, sample_logps=lps, best_x=best_x[bc],
                          best_logp=best_logp[bc], step_sizes=eps,
                          mean_accept=jnp.mean(accs, axis=0))

    return run(x0, eps0, k_run)

"""Next-generation-matrix reproduction numbers (R0, Rt) — batched, TPU-native.

Re-design of ``ReproductionNumberCalculator``
(reference: ``src/model/ReproductionNumberCalculator.cpp:19-170``). The
reference builds the full (4A x 4A) F and V matrices over the infected states
(E, P, A, I) per age and takes the spectral radius of F V^{-1} with a dense
nonsymmetric eigensolver per evaluation.

Algebraic reduction used here: F has nonzero entries only in the E-block rows
(``:38-54``), and V is block-triangular per age with no cross-age coupling
(``:104-138``), so the nonzero eigenvalues of F V^{-1} equal those of the
A x A reduced matrix

    K[i, j] = T[i, j] * D[j]
    T[i, j] = beta(t) * kappa(t) * M_baseline[i, j] * a[i] * h_infec[j] * w[i] / N[j]
    D[j]    = 1/gamma_p + p[j]/gamma_A + theta * (1 - p[j]) / (gamma_I + h[j])

with w = N (R0) or w = S(t) (Rt). D[j] is the (E_j-column of V^{-1}) summed
against F's stage weights: mean residence 1/gamma_p in P, p/gamma_A in A, and
(1-p)/(gamma_I+h) in I (x theta). The spectral radius of this small
non-negative matrix is computed by power iteration (Perron-Frobenius), which
is jit/vmap-safe on TPU — batched Rt over (draws x time points) is one fused
program instead of the reference's per-step Eigen solve. Equivalence with the
full 4A x 4A construction is asserted in ``tests/test_analysis.py``.

Fidelity notes (mirroring the reference exactly):
- M_baseline is used UNSCALED (the reference ignores
  ``contact_matrix_scaling_factor`` here).
- V's I-outflow is ``gamma_I + h`` only — the reference omits ``d_community``
  from the NGM even though the model's I compartment also exits through it
  (``:134-137`` vs ``AgeSEPAIHRDModel.cpp:210``). Pass
  ``include_d_community=True`` for the corrected variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import SEPAIHRDParams, beta_at, kappa_at


def infection_duration_weights(params: SEPAIHRDParams,
                               include_d_community: bool = False) -> jnp.ndarray:
    """D[j]: expected transmission-weighted residence across P, A, I."""
    i_out = params.gamma_I + params.h
    if include_d_community:
        i_out = i_out + params.d_community
    return (1.0 / params.gamma_p
            + params.p / params.gamma_A
            + params.theta * (1.0 - params.p) / i_out)


def reduced_ngm(params: SEPAIHRDParams, w: jnp.ndarray, t,
                include_d_community: bool = False) -> jnp.ndarray:
    """The A x A reduced next-generation matrix K (w = N for R0, S(t) for Rt)."""
    b = beta_at(params, t) * kappa_at(params, t)
    # empty age bands contribute NOTHING (reference
    # ReproductionNumberCalculator.cpp zero-pop `continue`, same as
    # full_ngm_matrices below) — dividing by a 1e-9 floor instead would
    # inflate the column by ~1e9
    inv_n = jnp.where(params.N > 1e-9, 1.0 / params.N, 0.0)
    T = (b * params.a[:, None] * params.M_baseline
         * params.h_infec[None, :] * w[:, None] * inv_n[None, :])
    T = jnp.maximum(T, 0.0)
    return T * infection_duration_weights(params, include_d_community)[None, :]


def spectral_radius(K: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """Spectral radius of a non-negative matrix by power iteration.

    For NGMs Perron-Frobenius guarantees the dominant eigenvalue is real,
    non-negative, and reachable from a positive start vector. jit/vmap-safe
    (the reference's ``Eigen::EigenSolver`` has no TPU analogue).
    """
    A = K.shape[-1]
    v0 = jnp.full(K.shape[:-2] + (A,), 1.0 / jnp.sqrt(A), dtype=K.dtype)

    def body(_, v):
        w = jnp.einsum("...ij,...j->...i", K, v,
                       precision=jax.lax.Precision.HIGHEST)
        n = jnp.linalg.norm(w, axis=-1, keepdims=True)
        return jnp.where(n > 0, w / n, v)

    v = jax.lax.fori_loop(0, iters, body, v0)
    Kv = jnp.einsum("...ij,...j->...i", K, v,
                    precision=jax.lax.Precision.HIGHEST)
    lam = jnp.einsum("...i,...i->...", v, Kv,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(lam, 0.0)


def calculate_r0(params: SEPAIHRDParams,
                 include_d_community: bool = False) -> jnp.ndarray:
    """R0 = spectral radius of the NGM at t=0 with the full population.

    Reference: ``ReproductionNumberCalculator::calculateR0`` (:141-157);
    beta(0) and kappa(0) are the period-1 schedule values.
    """
    K = reduced_ngm(params, params.N, 0.0, include_d_community)
    return spectral_radius(K)


def calculate_rt(params: SEPAIHRDParams, S_current: jnp.ndarray, t,
                 include_d_community: bool = False) -> jnp.ndarray:
    """Rt at time t given the current susceptible vector
    (reference ``calculateRt``, :160-170)."""
    K = reduced_ngm(params, S_current, t, include_d_community)
    return spectral_radius(K)


def rt_trajectory(params: SEPAIHRDParams, traj: jnp.ndarray, ts: jnp.ndarray,
                  include_d_community: bool = False) -> jnp.ndarray:
    """Rt at every output point of a (T, 11, A) trajectory — one batched
    power iteration over all T matrices (reference
    ``MetricsCalculator::calculateRtTrajectory`` loops an eigensolver,
    ``MetricsCalculator.cpp:174-198``)."""
    S_t = traj[:, 0]                                    # (T, A)
    K_t = jax.vmap(lambda S, t: reduced_ngm(params, S, t, include_d_community))(
        S_t, jnp.asarray(ts, dtype=traj.dtype))
    return spectral_radius(K_t)


def full_ngm_matrices(params, w, t, include_d_community=False):
    """The reference's literal (4A x 4A) F and V (for parity testing only)."""
    import numpy as np

    p = {k: np.asarray(getattr(params, k)) for k in
         ("N", "M_baseline", "a", "h_infec", "theta", "sigma", "gamma_p",
          "gamma_A", "gamma_I", "p", "h", "d_community")}
    A = p["N"].size
    n = 4 * A
    b = float(np.asarray(beta_at(params, t))) * float(np.asarray(kappa_at(params, t)))
    F = np.zeros((n, n))
    w = np.asarray(w)
    for i in range(A):
        for j in range(A):
            if p["N"][j] < 1e-9:
                continue
            term = b * p["M_baseline"][i, j] * p["a"][i] * p["h_infec"][j] * \
                w[i] / p["N"][j]
            term = max(term, 0.0)
            F[i, A + j] = term
            F[i, 2 * A + j] = term
            F[i, 3 * A + j] = p["theta"] * term
    V = np.zeros((n, n))
    for age in range(A):
        e, pp, aa, ii = age, A + age, 2 * A + age, 3 * A + age
        V[e, e] = p["sigma"]
        V[pp, e] = -p["sigma"]
        V[pp, pp] = p["gamma_p"]
        V[aa, pp] = -p["p"][age] * p["gamma_p"]
        V[ii, pp] = -(1.0 - p["p"][age]) * p["gamma_p"]
        V[aa, aa] = p["gamma_A"]
        V[ii, ii] = p["gamma_I"] + p["h"][age] + \
            (p["d_community"][age] if include_d_community else 0.0)
    return F, V

"""SEPAIHRD parameter pytree and piecewise-constant schedules.

TPU-native re-design of the reference's parameter plumbing:

- ``SEPAIHRDParams`` replaces the ``SEPAIHRDParameters`` POD
  (reference: ``include/model/parameters/SEPAIHRDParameters.hpp:20-179``) as a JAX
  pytree (every leaf a ``jnp`` array), so whole parameter vectors can be vmapped,
  sharded, and differentiated. There is no mutable model object: the parameters ARE
  the model state, and the RHS / objective are pure functions of them.

- ``piecewise_value`` replaces both ``PiecewiseConstantParameterStrategy::getValue``
  (reference: ``src/model/PiecewiseConstantParameterStrategy.cpp:37-74``) and
  ``PiecewiseConstantNpiStrategy::getReductionFactor``
  (reference: ``src/model/PieceWiseConstantNPIStrategy.cpp:86-127``) with a branch-free
  one-hot contraction that is jit/vmap-safe (the reference's cached-index fast path
  exists only because of sequential stateful lookups; a gather-based lookup would
  serialize under vmap on TPU, see OPS_ANALYSIS.md).

Schedule semantics (identical to the reference):
  value(t) = values[0]                        for t <= end_times[0]  (and for t < 0)
  value(t) = values[i]                        for end_times[i-1] < t <= end_times[i]
  value(t) = values[-1]                       for t >  end_times[-1]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


def _as_f(x, dtype):
    # Host (NumPy) leaves, not device arrays: parameters are setup-time
    # constants that get EMBEDDED into jit programs via closure capture.
    # A NumPy leaf lowers to an MLIR constant directly; a device-resident
    # leaf forces a device->host fetch per constant at lowering time, which
    # on a tunneled TPU runtime costs seconds to minutes (measured: the
    # whole 181-559 s "compile" stall of BENCH_r01 was one such fetch).
    # Inside traced code NumPy leaves promote to tracers transparently.
    return np.asarray(x, dtype=dtype)


@struct.dataclass
class SEPAIHRDParams:
    """All parameters of the age-structured SEPAIHRD model as a pytree.

    Age-vector leaves have shape ``(n_ages,)``; schedule leaves have shape
    ``(n_periods,)``; everything else is a scalar array. Leaves may carry leading
    batch dimensions when vmapped.
    """

    # Demographics / contacts
    N: jnp.ndarray            # (A,) population by age group
    M_baseline: jnp.ndarray   # (A, A) contact matrix
    contact_matrix_scaling_factor: jnp.ndarray  # scalar

    # Transmission
    beta: jnp.ndarray         # scalar (used when the beta schedule is empty)
    beta_end_times: jnp.ndarray  # (Kb,) strictly increasing period end times
    beta_values: jnp.ndarray     # (Kb,) per-period beta
    a: jnp.ndarray            # (A,) relative susceptibility
    h_infec: jnp.ndarray      # (A,) relative infectiousness
    theta: jnp.ndarray        # scalar, reduced transmissibility of symptomatic

    # Progression rates
    sigma: jnp.ndarray
    gamma_p: jnp.ndarray
    gamma_A: jnp.ndarray
    gamma_I: jnp.ndarray
    gamma_H: jnp.ndarray
    gamma_ICU: jnp.ndarray

    # Age-specific severity
    p: jnp.ndarray            # (A,) fraction asymptomatic
    h: jnp.ndarray            # (A,) hospitalization rate
    icu: jnp.ndarray          # (A,) ICU admission rate
    d_H: jnp.ndarray          # (A,) hospital mortality rate
    d_ICU: jnp.ndarray        # (A,) ICU mortality rate
    d_community: jnp.ndarray  # (A,) community/nursing-home mortality (direct I->D)

    # NPI schedule (kappa); kappa_values[0] is the baseline period value
    kappa_end_times: jnp.ndarray  # (Kk,)
    kappa_values: jnp.ndarray     # (Kk,)

    # Initial state multipliers
    E0_multiplier: jnp.ndarray
    P0_multiplier: jnp.ndarray
    A0_multiplier: jnp.ndarray
    I0_multiplier: jnp.ndarray
    H0_multiplier: jnp.ndarray
    ICU0_multiplier: jnp.ndarray
    R0_multiplier: jnp.ndarray
    D0_multiplier: jnp.ndarray

    # Run-up seeding
    runup_days: jnp.ndarray
    seed_exposed: jnp.ndarray

    @property
    def n_ages(self) -> int:
        return int(self.N.shape[-1])

    @property
    def dtype(self):
        return self.beta.dtype

    def contact_matrix(self) -> jnp.ndarray:
        """Effective contact matrix (scaled baseline)."""
        return self.M_baseline * self.contact_matrix_scaling_factor[..., None, None]


def make_params(
    *,
    N,
    M_baseline,
    beta=0.3,
    beta_end_times=(),
    beta_values=(),
    a=None,
    h_infec=None,
    theta=0.2,
    sigma=0.3,
    gamma_p=0.5,
    gamma_A=0.25,
    gamma_I=0.244,
    gamma_H=0.2,
    gamma_ICU=0.1,
    p=None,
    h=None,
    icu=None,
    d_H=None,
    d_ICU=None,
    d_community=None,
    kappa_end_times=(),
    kappa_values=(),
    E0_multiplier=1.0,
    P0_multiplier=1.0,
    A0_multiplier=1.0,
    I0_multiplier=1.0,
    H0_multiplier=1.0,
    ICU0_multiplier=1.0,
    R0_multiplier=1.0,
    D0_multiplier=1.0,
    runup_days=30.0,
    seed_exposed=10.0,
    contact_matrix_scaling_factor=1.0,
    dtype=None,
) -> SEPAIHRDParams:
    """Build a validated :class:`SEPAIHRDParams` from host-side values.

    Defaults for severity vectors are zeros; ``a``/``h_infec`` default to ones.
    Mirrors the construction-time validation of
    ``SEPAIHRDParameters::validate`` (reference:
    ``include/model/parameters/SEPAIHRDParameters.hpp:126-179``).
    """
    N = np.asarray(N, dtype=np.float64)
    A = N.shape[-1]
    if dtype is None:
        import jax.dtypes
        dtype = jax.dtypes.canonicalize_dtype(np.float64)  # respects jax_enable_x64

    def vec(x, default):
        if x is None:
            x = np.full((A,), default, dtype=np.float64)
        x = np.asarray(x, dtype=np.float64)
        if x.shape[-1] != A:
            raise ValueError(f"age-vector parameter has size {x.shape[-1]}, expected {A}")
        return x

    M_baseline = np.asarray(M_baseline, dtype=np.float64)
    if M_baseline.shape[-2:] != (A, A):
        raise ValueError(f"contact matrix shape {M_baseline.shape} != ({A},{A})")

    beta_end_times = np.asarray(beta_end_times, dtype=np.float64)
    beta_values = np.asarray(beta_values, dtype=np.float64)
    if beta_end_times.shape != beta_values.shape:
        raise ValueError("beta_end_times and beta_values must have matching sizes")
    if beta_end_times.size and np.any(np.diff(beta_end_times) <= 0):
        raise ValueError("beta_end_times must be strictly increasing")
    kappa_end_times = np.asarray(kappa_end_times, dtype=np.float64)
    kappa_values = np.asarray(kappa_values, dtype=np.float64)
    if kappa_end_times.shape != kappa_values.shape:
        raise ValueError("kappa_end_times and kappa_values must have matching sizes")
    if kappa_end_times.size and np.any(np.diff(kappa_end_times) <= 0):
        raise ValueError("kappa_end_times must be strictly increasing")

    p_vec = vec(p, 0.0)
    if np.any(p_vec < 0) or np.any(p_vec > 1):
        raise ValueError("p must lie in [0, 1]")
    for name, val in [("beta", beta), ("theta", theta), ("sigma", sigma),
                      ("gamma_p", gamma_p), ("gamma_A", gamma_A), ("gamma_I", gamma_I),
                      ("gamma_H", gamma_H), ("gamma_ICU", gamma_ICU)]:
        if float(np.asarray(val)) < 0:
            raise ValueError(f"{name} must be non-negative")
    for name, val in [("a", vec(a, 1.0)), ("h_infec", vec(h_infec, 1.0)),
                      ("h", vec(h, 0.0)), ("icu", vec(icu, 0.0)),
                      ("d_H", vec(d_H, 0.0)), ("d_ICU", vec(d_ICU, 0.0)),
                      ("d_community", vec(d_community, 0.0))]:
        if np.any(val < 0):
            raise ValueError(f"{name} must be non-negative")
    if np.any(beta_values < 0) or not np.all(np.isfinite(beta_values)):
        raise ValueError("beta_values must be finite and non-negative")
    if np.any(kappa_values < 0) or not np.all(np.isfinite(kappa_values)):
        raise ValueError("kappa_values must be finite and non-negative")

    f = lambda x: _as_f(x, dtype)
    return SEPAIHRDParams(
        N=f(N), M_baseline=f(M_baseline),
        contact_matrix_scaling_factor=f(contact_matrix_scaling_factor),
        beta=f(beta), beta_end_times=f(beta_end_times), beta_values=f(beta_values),
        a=f(vec(a, 1.0)), h_infec=f(vec(h_infec, 1.0)), theta=f(theta),
        sigma=f(sigma), gamma_p=f(gamma_p), gamma_A=f(gamma_A), gamma_I=f(gamma_I),
        gamma_H=f(gamma_H), gamma_ICU=f(gamma_ICU),
        p=f(p_vec), h=f(vec(h, 0.0)), icu=f(vec(icu, 0.0)),
        d_H=f(vec(d_H, 0.0)), d_ICU=f(vec(d_ICU, 0.0)),
        d_community=f(vec(d_community, 0.0)),
        kappa_end_times=f(kappa_end_times), kappa_values=f(kappa_values),
        E0_multiplier=f(E0_multiplier), P0_multiplier=f(P0_multiplier),
        A0_multiplier=f(A0_multiplier), I0_multiplier=f(I0_multiplier),
        H0_multiplier=f(H0_multiplier), ICU0_multiplier=f(ICU0_multiplier),
        R0_multiplier=f(R0_multiplier), D0_multiplier=f(D0_multiplier),
        runup_days=f(runup_days), seed_exposed=f(seed_exposed),
    )


def piecewise_value(t, end_times: jnp.ndarray, values: jnp.ndarray):
    """Piecewise-constant schedule lookup, jit/vmap-safe.

    ``values[i]`` applies on the interval ``(end_times[i-1], end_times[i]]`` with the
    first value extending to ``-inf`` and the last to ``+inf``. Matches the cached
    sequential lookup of the reference (``PiecewiseConstantParameterStrategy.cpp:37``,
    ``PieceWiseConstantNPIStrategy.cpp:86``) for all t.

    Implemented as a one-hot contraction rather than searchsorted+gather:
    schedules are tiny (K <= ~10) and vmapped gathers serialize on TPU
    (measured ~100x slower across an 8192-chain batch than the comparisons
    below, which fuse into the surrounding elementwise work).
    """
    K = values.shape[-1]
    if K == 0:
        raise ValueError("piecewise_value requires a non-empty schedule")
    t = jnp.asarray(t)
    # select the FIRST k with end_times[k] >= t; all-smaller falls to K-1
    ge = end_times >= t[..., None]                          # (..., K)
    onehot = ge & (jnp.cumsum(ge, axis=-1) == 1)
    onehot = onehot.at[..., K - 1].set(onehot[..., K - 1] | ~ge.any(axis=-1))
    return jnp.sum(jnp.where(onehot, values, 0), axis=-1)


def beta_at(params: SEPAIHRDParams, t):
    """Time-varying transmission rate beta(t).

    Reference: ``AgeSEPAIHRDModel::computeBeta`` (``src/model/AgeSEPAIHRDModel.cpp:366``).
    Falls back to the scalar ``beta`` when no schedule is configured.
    """
    if params.beta_values.shape[-1] == 0:
        return params.beta
    return piecewise_value(t, params.beta_end_times, params.beta_values)


def kappa_at(params: SEPAIHRDParams, t):
    """NPI contact-reduction factor kappa(t).

    Reference: ``PiecewiseConstantNpiStrategy::getReductionFactor``
    (``src/model/PieceWiseConstantNPIStrategy.cpp:86-127``): baseline value for
    ``t < 0`` and ``t <= baseline_end``, then stepwise values.
    """
    if params.kappa_values.shape[-1] == 0:
        return jnp.ones_like(jnp.asarray(t, dtype=params.dtype))
    return piecewise_value(t, params.kappa_end_times, params.kappa_values)

"""Two-phase calibration orchestrator (optimizer warm start -> MCMC).

TPU-native re-design of ``ModelCalibrator`` + ``SEPAIHRDModelCalibration``
(reference: ``src/sir_age_structured/ModelCalibrator.cpp``,
``src/model/SEPAIHRDModelCalibration.cpp``): Phase 1 runs an optimizer (PSO or
hill climbing) in CLAMP mode, its learned covariance is conditioned and handed
to Phase 2's adaptive-Metropolis ensemble in REFLECT mode; NUTS runs as a
single-phase alternative. Objective values for every stored MCMC sample come for
free (the ensemble stores them), unlike the reference's re-evaluation loop
(``ModelCalibrator.cpp:144-147``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hill import HillClimbConfig, run_hill_climb
from .mh import MHConfig, MHResult, run_mh
from .nuts import NUTSConfig, NUTSResult, run_nuts
from .param_space import ParameterSpace
from .pso import PSOConfig, run_pso


def condition_covariance(cov: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """Phase-1 -> Phase-2 covariance conditioning
    (reference ``ModelCalibrator.cpp:97-134``): symmetrize, floor eigenvalues at
    (0.1 * sigma_i)^2, reconstruct, inflate variance 4x, add trace jitter."""
    d = cov.shape[0]
    cov = 0.5 * (cov + cov.T)
    evals, evecs = jnp.linalg.eigh(cov)
    min_var = jnp.min((0.1 * sigmas) ** 2)
    evals = jnp.maximum(evals, min_var)
    floored = jnp.matmul(evecs * evals[None, :], evecs.T,
                         precision=jax.lax.Precision.HIGHEST)
    inflated = floored * 4.0
    eps = 1e-8 * jnp.trace(inflated) / d
    return inflated + eps * jnp.eye(d, dtype=cov.dtype)


class CalibrationResult(NamedTuple):
    best_theta: jnp.ndarray
    best_logl: jnp.ndarray
    samples: Optional[jnp.ndarray]         # (n_stored, B, d) MCMC samples
    sample_logls: Optional[jnp.ndarray]
    phase1_best: Optional[jnp.ndarray]
    phase1_logl: Optional[jnp.ndarray]
    phase1_cov: Optional[jnp.ndarray]
    mh_result: Optional[MHResult]
    nuts_result: Optional[NUTSResult]


def calibrate(
    loglik_clamp: Callable[[jnp.ndarray], jnp.ndarray],
    loglik_reflect: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    *,
    phase1: Optional[str] = "auto",            # "auto" | "pso" | "hill" | None
    phase1_config=None,
    mh_config: Optional[MHConfig] = None,
    nuts_config: Optional[NUTSConfig] = None,
    n_chains: int = 8,
    algorithm: str = "psomcmc",                # pso|psomcmc|hill|hillmcmc|nuts
    loglik_batch_reflect: Optional[Callable] = None,
    loglik_batch_clamp: Optional[Callable] = None,
) -> CalibrationResult:
    """Run a full calibration with the reference's algorithm menu
    (``main.cpp:48-79``: pso/psomcmc, hill/hillmcmc, nuts).

    ``loglik_clamp`` / ``loglik_reflect`` are the objective built with the two
    constraint modes (the reference switches a mutable mode flag on the shared
    parameter manager; pure functions take the mode at construction).
    """
    algo = algorithm.lower()
    if algo not in ("pso", "psomcmc", "hill", "hillmcmc", "nuts"):
        raise ValueError(f"Unknown algorithm: {algorithm}. Valid: pso, psomcmc, "
                         "hill, hillmcmc, nuts")
    if phase1 == "auto":
        # derive from the reference's algorithm menu; an EXPLICIT phase1
        # ("pso"/"hill"/None) overrides it (None = MCMC-only from theta0)
        phase1 = {"pso": "pso", "psomcmc": "pso", "hill": "hill",
                  "hillmcmc": "hill", "nuts": None}[algo]
    elif phase1 not in ("pso", "hill", None):
        raise ValueError(f"Unknown phase1: {phase1!r}. "
                         "Valid: 'auto', 'pso', 'hill', None")
    # note: like the reference, plain "pso"/"hill" still run the MCMC phase
    # when an MH config is supplied; pass mh_config=None to skip.
    k1, k2 = jax.random.split(key)

    phase1_best = phase1_logl = phase1_cov = None
    current = jnp.asarray(theta0)

    if algo == "nuts":
        cfg = nuts_config or NUTSConfig()
        nres = run_nuts(loglik_clamp, space, current, k2, cfg, n_chains=n_chains)
        return CalibrationResult(
            best_theta=nres.best_x, best_logl=nres.best_logp,
            samples=nres.samples, sample_logls=nres.sample_logps,
            phase1_best=None, phase1_logl=None, phase1_cov=None,
            mh_result=None, nuts_result=nres)

    if phase1 == "pso":
        cfg = phase1_config or PSOConfig()
        pres = run_pso(loglik_clamp, space, k1, cfg, theta0=current,
                       loglik_batch=loglik_batch_clamp)
        phase1_best, phase1_logl, phase1_cov = pres.best_x, pres.best_f, pres.final_cov
        current = pres.best_x
    elif phase1 == "hill":
        cfg = phase1_config or HillClimbConfig()
        hres = run_hill_climb(loglik_clamp, space, current, k1, cfg)
        phase1_best, phase1_logl, phase1_cov = (hres.best_x, hres.best_logl,
                                                hres.final_cov)
        current = hres.best_x

    mh_result = None
    samples = sample_logls = None
    best_theta, best_logl = current, (phase1_logl if phase1_logl is not None
                                      else loglik_clamp(current))
    if mh_config is not None:
        init_cov = None
        if phase1_cov is not None:
            init_cov = condition_covariance(phase1_cov,
                                            space.sigmas.astype(current.dtype))
        mh_result = run_mh(loglik_reflect, space, current, k2, mh_config,
                           n_chains=n_chains, initial_cov=init_cov,
                           loglik_batch=loglik_batch_reflect)
        samples, sample_logls = mh_result.samples, mh_result.sample_logps
        if float(mh_result.best_logp) > float(best_logl):
            best_theta, best_logl = mh_result.best_x, mh_result.best_logp

    return CalibrationResult(
        best_theta=best_theta, best_logl=jnp.asarray(best_logl),
        samples=samples, sample_logls=sample_logls,
        phase1_best=phase1_best, phase1_logl=phase1_logl, phase1_cov=phase1_cov,
        mh_result=mh_result, nuts_result=None)

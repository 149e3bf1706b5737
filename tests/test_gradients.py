"""Exact gradients through the ODE solver (the reference's finite-difference
gradient objective, ``SEPAIHRDGradientObjectiveFunction.cpp:15-171``, replaced
by ``jax.grad`` — VERDICT L4.5) and NUTS on the real SEPAIHRD objective."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.nuts import NUTSConfig, run_nuts
from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
from mmidv1_tpu.calibration.param_space import CLAMP, ParameterSpace
from mmidv1_tpu.data import CalibrationData


@pytest.fixture(scope="module")
def grad_setup(spain_params):
    prm, params = spain_params
    n_days = 30
    rng = np.random.default_rng(21)
    obs = rng.poisson(8.0, size=(n_days, 4)).astype(float)
    data = CalibrationData.from_arrays(
        new_confirmed=obs, new_hospitalizations=obs, new_icu=obs * 0.2,
        new_deaths=obs * 0.1, population_by_age=prm["N"])
    ts = make_time_grid(prm["runup_days"], n_days)
    names = ["beta_1", "theta", "sigma", "seed_exposed", "h_1"]
    bounds = {n: (0.001, 3.0) for n in names}
    bounds["seed_exposed"] = (1.0, 500.0)
    sigmas = {n: 0.05 for n in names}
    space = ParameterSpace.create(names, bounds, sigmas, params)
    # interior theta so clamping has zero subgradient effect
    loglik = build_objective(space, params, data, ts, substeps=2,
                             constraint_mode=CLAMP)
    theta0 = space.extract(params)
    return loglik, space, theta0


def test_exact_gradient_matches_finite_differences(grad_setup):
    """jax.grad through the fused solve+fold == central finite differences
    (the reference computes this with one OpenMP task per parameter and a
    cloned model each; here it is one reverse-mode sweep)."""
    loglik, space, theta0 = grad_setup
    g = np.asarray(jax.grad(loglik)(theta0))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()

    f = lambda th: float(loglik(jnp.asarray(th)))
    theta0 = np.asarray(theta0, dtype=np.float64)
    for j in range(len(theta0)):
        h = 1e-5 * max(abs(theta0[j]), 1e-3)
        e = np.zeros_like(theta0)
        e[j] = h
        fd = (f(theta0 + e) - f(theta0 - e)) / (2 * h)
        np.testing.assert_allclose(g[j], fd, rtol=5e-4, atol=1e-3,
                                   err_msg=space.names[j])


def test_value_and_grad_under_vmap(grad_setup):
    """Batched gradients (the NUTS ensemble path) are finite and consistent."""
    loglik, space, theta0 = grad_setup
    thetas = theta0[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (4, space.dim), dtype=theta0.dtype)
    vals, grads = jax.vmap(jax.value_and_grad(loglik))(thetas)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()
    v0, g0 = jax.value_and_grad(loglik)(thetas[0])
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(g0),
                               rtol=1e-10)


@pytest.mark.slow
def test_nuts_on_real_objective(grad_setup):
    """NUTS samples the real SEPAIHRD posterior (exact gradients end-to-end)."""
    loglik, space, theta0 = grad_setup
    cfg = NUTSConfig(iterations=25, adaptation_window=10, max_tree_depth=3)
    res = run_nuts(loglik, space, theta0, jax.random.PRNGKey(4), cfg,
                   n_chains=4)
    assert np.isfinite(float(res.best_logp))
    samples = np.asarray(res.samples)
    assert np.isfinite(samples).all()
    # chains actually move and stay in bounds
    assert np.std(samples[:, :, 0]) > 0
    lo, hi = np.asarray(space.lower), np.asarray(space.upper)
    assert (samples >= lo - 1e-9).all() and (samples <= hi + 1e-9).all()
    assert float(res.best_logp) >= float(loglik(theta0)) - 5.0

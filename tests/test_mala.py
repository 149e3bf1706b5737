"""Ensemble preconditioned-MALA sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.mala import MALAConfig, run_mala
from mmidv1_tpu.calibration.param_space import ParameterSpace


@pytest.fixture(scope="module")
def gaussian_problem():
    """Correlated 3-d Gaussian target + a box that contains ~all of its mass."""
    mu = jnp.asarray([0.4, -0.3, 0.8])
    cov = jnp.asarray([[0.04, 0.018, 0.0],
                       [0.018, 0.09, -0.02],
                       [0.0, -0.02, 0.16]])
    prec = jnp.linalg.inv(cov)

    def loglik(theta):
        r = theta - mu
        return -0.5 * r @ prec @ r

    from mmidv1_tpu.params import make_params
    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta", "sigma"]
    space = ParameterSpace.create(names, {n: (-5.0, 5.0) for n in names},
                                  {n: 0.3 for n in names}, template)
    return loglik, space, mu, cov


def test_mala_recovers_gaussian(gaussian_problem):
    loglik, space, mu, cov = gaussian_problem
    cfg = MALAConfig(iterations=600, burn_in=100, adaptation_period=50,
                     thinning=2, initial_step_size=0.3)
    res = run_mala(loglik, space, jnp.zeros(3), jax.random.PRNGKey(0), cfg,
                   n_chains=64)
    # drop warm-up blocks, pool the rest
    post = np.asarray(res.samples[100:]).reshape(-1, 3)
    np.testing.assert_allclose(post.mean(axis=0), np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(post.std(axis=0),
                               np.sqrt(np.diag(np.asarray(cov))), rtol=0.25)
    acc = np.asarray(res.acceptance_rate)
    assert 0.3 < acc.mean() < 0.9, acc.mean()
    assert np.isfinite(np.asarray(res.best_logp))


def test_mala_reproducible(gaussian_problem):
    loglik, space, _, _ = gaussian_problem
    cfg = MALAConfig(iterations=40, burn_in=10, thinning=2)
    r1 = run_mala(loglik, space, jnp.zeros(3), jax.random.PRNGKey(7), cfg,
                  n_chains=16)
    r2 = run_mala(loglik, space, jnp.zeros(3), jax.random.PRNGKey(7), cfg,
                  n_chains=16)
    np.testing.assert_array_equal(np.asarray(r1.samples),
                                  np.asarray(r2.samples))


def test_mala_single_chain_survives_adaptation(gaussian_problem):
    """n_chains=1: the ensemble covariance is degenerate (0/0 without the
    max(B-1, 1) guard) — the chain must keep moving past the first
    preconditioner adaptation instead of stalling on a NaN drift."""
    loglik, space, mu, _ = gaussian_problem
    cfg = MALAConfig(iterations=200, burn_in=0, adaptation_period=20,
                     thinning=1, initial_step_size=0.3)
    res = run_mala(loglik, space, jnp.zeros(3), jax.random.PRNGKey(5), cfg,
                   n_chains=1)
    samples = np.asarray(res.samples)
    assert np.isfinite(samples).all()
    assert np.isfinite(np.asarray(res.final_cov)).all()
    # accepts continue AFTER the adaptation step (a NaN-poisoned drift
    # rejects everything from step 20 on)
    post_adapt = samples[50:, 0, :]
    assert np.unique(post_adapt, axis=0).shape[0] > 10


def test_mala_rejects_out_of_support(gaussian_problem):
    """A target whose mode lies outside the box: chains stay inside."""
    _, _, mu, cov = gaussian_problem
    prec = jnp.linalg.inv(cov)

    def loglik(theta):
        r = theta - (mu + 6.0)   # mode at ~6.4, outside the [-5, 5] box
        return -0.5 * r @ prec @ r

    from mmidv1_tpu.params import make_params
    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta", "sigma"]
    space = ParameterSpace.create(names, {n: (-5.0, 5.0) for n in names},
                                  {n: 0.3 for n in names}, template)
    cfg = MALAConfig(iterations=100, burn_in=20, thinning=2,
                     initial_step_size=0.3)
    res = run_mala(loglik, space, jnp.zeros(3), jax.random.PRNGKey(3), cfg,
                   n_chains=16)
    samples = np.asarray(res.samples)
    assert (samples >= -5.0).all() and (samples <= 5.0).all()
    assert np.isfinite(np.asarray(res.sample_logps)).all()


def test_mala_on_sepaihrd_gradient_geometry():
    """MALA advances on the real (shortened) Spain-2020 objective with exact
    gradients — the geometry the reference's finite-difference NUTS faced."""
    from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
    from mmidv1_tpu.data import (CalibrationData, read_param_bounds,
                                 read_params_to_calibrate,
                                 read_proposal_sigmas,
                                 read_sepaihrd_parameters)
    from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv
    from mmidv1_tpu.utils.fileutils import get_project_root
    import os

    root = get_project_root()
    cfg_dir = os.path.join(root, "data", "configuration")
    data = CalibrationData.from_csv(
        os.path.join(root, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-04-15")
    M = read_matrix_from_csv(os.path.join(root, "data", "contacts.csv"), 4, 4)
    params = read_sepaihrd_parameters(
        os.path.join(cfg_dir, "initial_guess.txt"), 4,
        N=data.population_by_age, M_baseline=M, dtype=jnp.float64)
    space = ParameterSpace.create(
        read_params_to_calibrate(os.path.join(cfg_dir,
                                              "params_to_calibrate.txt")),
        read_param_bounds(os.path.join(cfg_dir, "param_bounds.txt")),
        read_proposal_sigmas(os.path.join(cfg_dir, "proposal_sigmas.txt")),
        params)
    ts = make_time_grid(float(np.asarray(params.runup_days)),
                        data.n_data_points)
    loglik = build_objective(space, params, data, ts, substeps=2,
                             constraint_mode="clamp", dtype=jnp.float64)
    theta0 = space.extract(params)
    cfg = MALAConfig(iterations=10, burn_in=2, thinning=2,
                     initial_step_size=0.02)
    res = run_mala(loglik, space, theta0, jax.random.PRNGKey(1), cfg,
                   n_chains=4)
    assert np.isfinite(np.asarray(res.best_logp))
    assert float(res.best_logp) >= float(res.sample_logps[0].max()) - 1e-6
    assert np.asarray(res.acceptance_rate).max() > 0.0

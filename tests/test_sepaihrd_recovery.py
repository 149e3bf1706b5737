"""Posterior recovery on synthetic SEPAIHRD data (the sampler statistical test
SURVEY.md section 4 calls for): two-phase PSO -> conditioned covariance ->
ensemble MH on the REAL model geometry recovers known parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.calibrator import calibrate
from mmidv1_tpu.calibration.mh import MHConfig
from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
from mmidv1_tpu.calibration.param_space import CLAMP, REFLECT, ParameterSpace
from mmidv1_tpu.calibration.pso import PSOConfig
from mmidv1_tpu.data import CalibrationData
from mmidv1_tpu.models import sepaihrd


@pytest.mark.slow
@pytest.mark.campaign
def test_two_phase_recovers_synthetic_truth(spain_params):
    """Generate observations at known (beta_1, theta, seed_exposed), start the
    calibration from wrong values, and require the two-phase pipeline to land
    near the truth with the MCMC phase improving on phase 1's covariance."""
    prm, params = spain_params
    n_days = 60
    ts = make_time_grid(prm["runup_days"], n_days)

    true_vals = {"beta_1": 0.55, "theta": 0.3, "seed_exposed": 80.0}
    names = list(true_vals)
    bounds = {"beta_1": (0.1, 2.0), "theta": (0.05, 1.0),
              "seed_exposed": (1.0, 400.0)}
    sigmas = {"beta_1": 0.05, "theta": 0.05, "seed_exposed": 10.0}
    space = ParameterSpace.create(names, bounds, sigmas, params)
    theta_true = jnp.asarray([true_vals[n] for n in names])
    p_true = space.apply(params, theta_true)

    y0 = sepaihrd.runup_seeded_state(p_true, None)
    traj = sepaihrd.solve(p_true, y0, jnp.asarray(ts), method="fixed",
                          substeps=2)
    cums = np.asarray(traj)[:, [9, 10, 8]]         # CumH, CumICU, D
    daily = np.maximum(np.diff(cums, axis=0), 0.0)
    runup = int(np.searchsorted(ts, 0.0))
    daily = np.concatenate([np.zeros_like(cums[:1]), daily])[runup:]
    rng = np.random.default_rng(31)
    obs_h = rng.poisson(daily[:, 0]).astype(float)
    obs_i = rng.poisson(daily[:, 1]).astype(float)
    obs_d = rng.poisson(daily[:, 2]).astype(float)
    data = CalibrationData.from_arrays(
        new_confirmed=obs_h * 0, new_hospitalizations=obs_h, new_icu=obs_i,
        new_deaths=obs_d, population_by_age=prm["N"])

    ll_c = build_objective(space, params, data, ts, substeps=2,
                           constraint_mode=CLAMP)
    ll_r = build_objective(space, params, data, ts, substeps=2,
                           constraint_mode=REFLECT)

    theta0 = jnp.asarray([0.9, 0.6, 20.0])          # deliberately wrong
    res = calibrate(ll_c, ll_r, space, theta0, jax.random.PRNGKey(6),
                    algorithm="psomcmc",
                    phase1_config=PSOConfig(swarm_size=128, iterations=40),
                    mh_config=MHConfig(iterations=400, burn_in=100,
                                       adaptation_period=50, thinning=2),
                    n_chains=32)

    best = np.asarray(res.best_theta)
    np.testing.assert_allclose(best[0], true_vals["beta_1"], rtol=0.10)
    np.testing.assert_allclose(best[1], true_vals["theta"], rtol=0.30)
    np.testing.assert_allclose(best[2], true_vals["seed_exposed"], rtol=0.40)
    # the fit at the recovered optimum is at least as good as at the truth
    assert float(res.best_logl) >= float(ll_c(theta_true)) - 5.0
    # posterior concentrates around the recovered values (not stuck at init)
    post = np.asarray(res.samples)[-100:].reshape(-1, 3)
    assert abs(np.median(post[:, 0]) - true_vals["beta_1"]) < 0.15

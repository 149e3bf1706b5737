"""Pallas fused-objective kernel: parity with the XLA objective (interpret
mode on CPU; the TPU numbers live in OPS_ANALYSIS.md / bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.mh import MHConfig, run_mh
from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
from mmidv1_tpu.calibration.param_space import REFLECT, ParameterSpace
from mmidv1_tpu.data import CalibrationData
from mmidv1_tpu.ops import build_objective_pallas


@pytest.fixture(scope="module")
def setup(spain_params):
    prm, params = spain_params
    n_days = 35
    rng = np.random.default_rng(9)
    obs = rng.poisson(6.0, size=(n_days, 4)).astype(float)
    obs_icu = obs * 0.2
    obs_icu[5, 2] = np.nan        # exercise invalid-observation skipping
    obs_d = obs * 0.1
    obs_d[7, 0] = -3.0
    data = CalibrationData.from_arrays(
        new_confirmed=obs, new_hospitalizations=obs, new_icu=obs_icu,
        new_deaths=obs_d, population_by_age=prm["N"],
        initial_cumulative_confirmed=[800.0] * 4,
        initial_cumulative_deaths=[4.0] * 4,
        initial_cumulative_hospitalizations=[25.0] * 4,
        initial_cumulative_icu=[5.0] * 4)
    ts = make_time_grid(prm["runup_days"], n_days)
    names = ["beta_1", "beta_2", "theta", "seed_exposed", "p_0", "h_2",
             "kappa_2", "sigma"]
    bounds = {n: (0.01, 2.0) for n in names}
    bounds["seed_exposed"] = (1.0, 500.0)
    sigmas = {n: 0.05 for n in names}
    space = ParameterSpace.create(names, bounds, sigmas, params)
    return params, data, ts, space


def test_pallas_objective_matches_xla(setup):
    params, data, ts, space = setup
    ll_x = jax.vmap(build_objective(space, params, data, ts, substeps=2,
                                    constraint_mode=REFLECT))
    ll_p = build_objective_pallas(space, params, data, ts, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=8)
    theta0 = space.extract(params)
    thetas = theta0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (16, space.dim), dtype=theta0.dtype)
    a = np.asarray(ll_x(thetas))
    b = np.asarray(ll_p(thetas))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(b, a, rtol=1e-12)


def test_pallas_objective_no_runup(setup):
    """runup_offset == 0 branch (anchored row 0 contributes)."""
    params, data, ts, space = setup
    params0 = params.replace(runup_days=jnp.zeros_like(params.runup_days))
    ts0 = make_time_grid(0.0, data.n_data_points)
    ll_x = jax.vmap(build_objective(space, params0, data, ts0, substeps=2,
                                    constraint_mode=REFLECT))
    ll_p = build_objective_pallas(space, params0, data, ts0, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=4)
    theta = space.extract(params0)[None, :].repeat(4, axis=0)
    np.testing.assert_allclose(np.asarray(ll_p(theta)),
                               np.asarray(ll_x(theta)), rtol=1e-12)


def test_pallas_odd_batch_padding(setup):
    """The sublane-packed layout pads odd / non-block-divisible batches and
    returns exactly B results in chain order."""
    params, data, ts, space = setup
    ll_x = jax.vmap(build_objective(space, params, data, ts, substeps=2,
                                    constraint_mode=REFLECT))
    theta0 = space.extract(params)
    for B, bb in ((7, 4), (1, 2), (5, 64)):
        thetas = theta0[None, :] + 0.05 * jax.random.normal(
            jax.random.PRNGKey(B), (B, space.dim), dtype=theta0.dtype)
        ll_p = build_objective_pallas(space, params, data, ts, substeps=2,
                                      constraint_mode=REFLECT, interpret=True,
                                      block_b=bb)
        np.testing.assert_allclose(np.asarray(ll_p(thetas)),
                                   np.asarray(ll_x(thetas)), rtol=1e-12)


def test_pallas_infeasible_masked(setup):
    """Multiplier-branch infeasibility returns lowest() like the XLA path."""
    params, data, ts, space = setup
    # seed_exposed <= 0 switches to the multiplier branch; huge multipliers
    # make sum(non-S) > N -> infeasible
    p2 = params.replace(seed_exposed=jnp.zeros_like(params.seed_exposed),
                        E0_multiplier=jnp.asarray(1e9, params.dtype))
    space2 = ParameterSpace.create(["beta_1", "theta"],
                                   {"beta_1": (0.01, 2.0),
                                    "theta": (0.01, 1.0)},
                                   {"beta_1": 0.05, "theta": 0.05}, p2)
    ll_p = build_objective_pallas(space2, p2, data, ts, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=2)
    out = np.asarray(ll_p(space2.extract(p2)[None, :].repeat(2, axis=0)))
    assert (out < -1e30).all()


def test_run_mh_with_pallas_batch_objective(setup):
    """The sampler accepts the batch-native kernel objective directly."""
    params, data, ts, space = setup
    ll = build_objective(space, params, data, ts, substeps=2,
                         constraint_mode=REFLECT)
    ll_p = build_objective_pallas(space, params, data, ts, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=8)
    cfg = MHConfig(iterations=6, burn_in=2, thinning=2)
    theta0 = space.extract(params)
    key = jax.random.PRNGKey(3)
    r_ref = run_mh(ll, space, theta0, key, cfg, n_chains=8)
    r_pal = run_mh(ll, space, theta0, key, cfg, n_chains=8,
                   loglik_batch=ll_p)
    np.testing.assert_allclose(np.asarray(r_pal.samples),
                               np.asarray(r_ref.samples), rtol=1e-10)


def test_run_pso_with_pallas_batch_objective(setup):
    """PSO accepts the batch-native kernel objective (phase-1 engine)."""
    from mmidv1_tpu.calibration.pso import PSOConfig, run_pso

    params, data, ts, space = setup
    ll = build_objective(space, params, data, ts, substeps=2,
                         constraint_mode=REFLECT)
    ll_p = build_objective_pallas(space, params, data, ts, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=8)
    cfg = PSOConfig(swarm_size=16, iterations=5)
    key = jax.random.PRNGKey(6)
    r_ref = run_pso(ll, space, key, cfg)
    r_pal = run_pso(ll, space, key, cfg, loglik_batch=ll_p)
    np.testing.assert_allclose(np.asarray(r_pal.best_x),
                               np.asarray(r_ref.best_x), rtol=1e-10)

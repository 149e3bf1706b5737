"""Parameter-space and objective tests.

Mirrors the reference's ModelTests suite
(``tests/model/SEPAIHRDObjectivefunctionTest.cpp``): finite LL on synthetic data,
parameter sensitivity, cache-free consistency, manual hand-computed Poisson LL,
parameter-name plumbing, zero/NaN observation handling — plus an independent
NumPy golden for the full pipeline.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmidv1_tpu import constants as C
from mmidv1_tpu.calibration import (CLAMP, REFLECT, ParameterSpace,
                                    build_incidence_fn, build_objective,
                                    make_time_grid)
from mmidv1_tpu.data import CalibrationData
from mmidv1_tpu.models import sepaihrd
from mmidv1_tpu.utils import InvalidParameterException

from reference_impl import spain_like_prm, seeded_initial_state, solve_golden

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- param space

def _space_and_params(spain_params):
    _, params = spain_params
    names = ["beta_1", "beta_2", "kappa_2", "theta", "sigma", "p_0", "h_2",
             "h_infec_3", "d_community_0", "E0_multiplier", "seed_exposed"]
    bounds = {n: (0.0, 2.0) for n in names}
    sigmas = {n: 0.01 for n in names}
    return ParameterSpace.create(names, bounds, sigmas, params), params


def test_space_apply_extract_roundtrip(spain_params):
    space, params = _space_and_params(spain_params)
    theta = space.extract(params)
    # extraction pulls current values from the pytree
    assert float(theta[0]) == pytest.approx(float(params.beta_values[0]))
    assert float(theta[2]) == pytest.approx(float(params.kappa_values[1]))
    assert float(theta[5]) == pytest.approx(float(params.p[0]))

    theta2 = theta.at[0].set(0.77).at[3].set(0.55).at[6].set(0.11)
    p2 = space.apply(params, theta2)
    assert float(p2.beta_values[0]) == pytest.approx(0.77)
    assert float(p2.theta) == pytest.approx(0.55)
    assert float(p2.h[2]) == pytest.approx(0.11)
    # untouched leaves unchanged
    np.testing.assert_allclose(np.asarray(p2.N), np.asarray(params.N))
    assert float(p2.gamma_I) == pytest.approx(float(params.gamma_I))
    # round-trip
    np.testing.assert_allclose(np.asarray(space.extract(p2)), np.asarray(theta2))


def test_space_name_dispatch_h_vs_h_infec(spain_params):
    """h_infec_i must not be swallowed by the h_ prefix (reference dispatch
    order, SEPAIHRDParameterManager.cpp:125-139)."""
    space, params = _space_and_params(spain_params)
    theta = space.extract(params)
    idx_hinfec = space.names.index("h_infec_3")
    p2 = space.apply(params, theta.at[idx_hinfec].set(0.123))
    assert float(p2.h_infec[3]) == pytest.approx(0.123)
    np.testing.assert_allclose(np.asarray(p2.h), np.asarray(params.h))


def test_space_validation(spain_params):
    _, params = spain_params
    with pytest.raises(InvalidParameterException, match="baseline"):
        ParameterSpace.create(["kappa_1"], {"kappa_1": (0, 1)}, {"kappa_1": 0.1},
                              params)
    with pytest.raises(InvalidParameterException, match="Missing bounds"):
        ParameterSpace.create(["theta"], {}, {"theta": 0.1}, params)
    with pytest.raises(InvalidParameterException, match="Missing proposal sigma"):
        ParameterSpace.create(["theta"], {"theta": (0, 1)}, {}, params)
    with pytest.raises(InvalidParameterException, match="age index"):
        ParameterSpace.create(["p_9"], {"p_9": (0, 1)}, {"p_9": 0.1}, params)
    with pytest.raises(InvalidParameterException, match="Unknown"):
        ParameterSpace.create(["zeta"], {"zeta": (0, 1)}, {"zeta": 0.1}, params)


def test_constraints_clamp_reflect(spain_params):
    space, params = _space_and_params(spain_params)
    d = space.dim
    theta = jnp.full((d,), 2.5)  # above upper bound 2.0
    np.testing.assert_allclose(np.asarray(space.clamp(theta)), 2.0)
    # reflect: 2.5 over [0,2] -> 2*2 - 2.5 = 1.5
    np.testing.assert_allclose(np.asarray(space.reflect(theta)), 1.5)
    theta = jnp.full((d,), -0.5)
    np.testing.assert_allclose(np.asarray(space.clamp(theta)), 0.0)
    np.testing.assert_allclose(np.asarray(space.reflect(theta)), 0.5)
    # multiple reflections: -4.5 over [0,2]: width 2, mod(.-0, 4)= 3.5 -> hi-(3.5-2)=0.5
    theta = jnp.full((d,), -4.5)
    np.testing.assert_allclose(np.asarray(space.reflect(theta)), 0.5)
    # in-bounds values are fixed points of both modes
    theta = jnp.full((d,), 1.3)
    np.testing.assert_allclose(np.asarray(space.reflect(theta)), 1.3)
    np.testing.assert_allclose(np.asarray(space.clamp(theta)), 1.3)


# ---------------------------------------------------------------- objective

@pytest.fixture(scope="module")
def synthetic_setup():
    """Synthetic-data objective on a short grid (fast; crosses one NPI boundary)."""
    prm = spain_like_prm()
    num_days = 40
    ts = make_time_grid(prm["runup_days"], num_days)

    # Generate synthetic observations from the golden solver at the true params
    y0 = seeded_initial_state(prm)
    gold = solve_golden(prm, y0, ts)
    runup_offset = int(np.searchsorted(ts, 0.0))
    cums = gold[:, [9, 10, 8]]          # CumH, CumICU, D
    daily = np.maximum(np.diff(cums, axis=0), 0.0)
    daily = np.concatenate([np.zeros_like(cums[:1]), daily])[runup_offset:]
    rng = np.random.default_rng(7)
    obs_h = rng.poisson(daily[:, 0] + 1.0).astype(float)
    obs_i = rng.poisson(daily[:, 1] + 0.5).astype(float)
    obs_d = rng.poisson(daily[:, 2] + 0.5).astype(float)

    data = CalibrationData.from_arrays(
        new_confirmed=obs_h * 0, new_hospitalizations=obs_h, new_icu=obs_i,
        new_deaths=obs_d, population_by_age=prm["N"],
        # nonzero day-0 cumulatives so the inferred base state (used by the
        # multiplier branch) is nontrivial
        initial_cumulative_confirmed=[1200.0, 2500.0, 900.0, 300.0],
        initial_cumulative_deaths=[2.0, 10.0, 40.0, 60.0],
        initial_cumulative_hospitalizations=[30.0, 120.0, 180.0, 90.0],
        initial_cumulative_icu=[4.0, 18.0, 25.0, 6.0])
    return prm, ts, data, gold, runup_offset


def _full_space(params):
    from mmidv1_tpu.data import (read_param_bounds, read_params_to_calibrate,
                                 read_proposal_sigmas)
    cfg = os.path.join(REPO, "data", "configuration")
    names = read_params_to_calibrate(os.path.join(cfg, "params_to_calibrate.txt"))
    bounds = read_param_bounds(os.path.join(cfg, "param_bounds.txt"))
    sigmas = read_proposal_sigmas(os.path.join(cfg, "proposal_sigmas.txt"))
    return ParameterSpace.create(names, bounds, sigmas, params)


def test_objective_matches_numpy_golden(spain_params, synthetic_setup):
    """Full-pipeline check: fused scan LL == straightforward NumPy computation
    on the golden trajectory (the hand-computed-LL test of the reference,
    SEPAIHRDObjectivefunctionTest.cpp:688, at scale)."""
    prm, ts, data, gold, runup_offset = synthetic_setup
    _, params = spain_params
    space = _full_space(params)
    theta0 = space.extract(params)

    loglik = jax.jit(build_objective(space, params, data, ts, substeps=4))
    ll = float(loglik(theta0))

    # NumPy golden: same incidence pipeline on the high-accuracy trajectory
    cums = gold[:, [9, 10, 8]]
    daily = np.maximum(np.diff(cums, axis=0), 0.0)
    daily = np.concatenate([np.zeros_like(cums[:1]), daily])[runup_offset:]
    obs = np.stack([data.new_hospitalizations, data.new_icu, data.new_deaths],
                   axis=1)  # (T_obs, 3, A)
    sim = daily + 1e-10
    ll_np = float(np.sum(obs * np.log(sim) - sim))

    assert np.isfinite(ll)
    # absolute difference scales with total counts; fixed(4) vs golden is ~1e-7 rel
    assert abs(ll - ll_np) / max(abs(ll_np), 1.0) < 1e-5, (ll, ll_np)


def test_objective_sensitivity_and_vmap(spain_params, synthetic_setup):
    prm, ts, data, _, _ = synthetic_setup
    _, params = spain_params
    space = _full_space(params)
    theta0 = space.extract(params)
    loglik = jax.jit(build_objective(space, params, data, ts, substeps=2))

    ll0 = float(loglik(theta0))
    idx_theta = space.names.index("theta")
    ll1 = float(loglik(theta0.at[idx_theta].set(0.75)))
    assert ll0 != ll1  # parameter sensitivity

    # vmap consistency: batched evaluation equals per-element evaluation
    thetas = jnp.stack([theta0, theta0.at[idx_theta].set(0.75),
                        theta0.at[0].set(0.5)])
    # Note: vmap reassociates reductions (batched matvec -> matmul), and the
    # epidemic growth phase amplifies ulp-level differences exponentially
    # (Lyapunov growth e^(beta*t)), so vmap-vs-scalar agreement is bounded by
    # amplified rounding (~1e-6 rel), not by f64 eps. Determinism within a fixed
    # program is exact (checked below).
    lls = np.asarray(jax.vmap(loglik)(thetas))
    np.testing.assert_allclose(lls[0], ll0, rtol=1e-5)
    np.testing.assert_allclose(lls[1], ll1, rtol=1e-5)
    # deterministic: same theta -> identical LL (the ParallelConsistencyTest)
    np.testing.assert_allclose(float(loglik(theta0)), ll0, rtol=0)


def test_objective_infeasible_multipliers(spain_params, synthetic_setup):
    """Multiplier branch with sum(non-S) > N must return lowest()
    (SEPAIHRDObjectiveFunction.cpp:161)."""
    prm, ts, data, _, _ = synthetic_setup
    _, params = spain_params
    space = _full_space(params)
    theta0 = space.extract(params)
    # Force the multiplier branch (runup_days <= 0) with huge multipliers
    base = params.replace(runup_days=jnp.asarray(0.0))
    loglik = jax.jit(build_objective(space, base, data, ts, substeps=2))
    idx_run = space.names.index("runup_days")
    idx_e0 = space.names.index("E0_multiplier")
    theta_bad = theta0.at[idx_run].set(0.0).at[idx_e0].set(1e8)
    # bounds clamp E0_multiplier to 3.0; use unconstrained space to test masking
    space_raw = ParameterSpace.create(
        list(space.names),
        {n: ((-1e30, 1e30) if n in ("E0_multiplier", "runup_days") else
             (float(space.lower[i]), float(space.upper[i])))
         for i, n in enumerate(space.names)},
        {n: 0.01 for n in space.names}, params)
    loglik_raw = jax.jit(build_objective(space_raw, base, data, ts, substeps=2))
    ll_bad = float(loglik_raw(theta_bad))
    assert ll_bad < -1e30  # lowest()


def test_objective_nan_observations_skipped(spain_params, synthetic_setup):
    prm, ts, data, _, _ = synthetic_setup
    _, params = spain_params
    space = _full_space(params)
    theta0 = space.extract(params)

    # Poison some observations with NaN and negatives: must be skipped, not NaN out
    import dataclasses as dc
    nh = data.new_hospitalizations.copy()
    nh[3, 1] = np.nan
    nh[5, 0] = -4.0
    data2 = dc.replace(data, new_hospitalizations=nh)
    ll = float(jax.jit(build_objective(space, params, data2, ts, substeps=2))(theta0))
    assert np.isfinite(ll)

    # and the skipped cells change the LL vs zeroing them
    nh3 = data.new_hospitalizations.copy()
    nh3[3, 1] = 0.0
    nh3[5, 0] = 0.0
    data3 = dc.replace(data, new_hospitalizations=nh3)
    ll3 = float(jax.jit(build_objective(space, params, data3, ts, substeps=2))(theta0))
    assert ll != ll3


def test_incidence_fn_consistency(spain_params, synthetic_setup):
    """build_incidence_fn daily streams reproduce the objective's LL when plugged
    into the Poisson formula."""
    prm, ts, data, _, _ = synthetic_setup
    _, params = spain_params
    space = _full_space(params)
    theta0 = space.extract(params)

    inc_fn = jax.jit(build_incidence_fn(space, params, data, ts, substeps=2))
    traj, daily = inc_fn(theta0)
    assert traj.shape == (len(ts), 11, 4)
    assert daily.shape == (3, data.n_data_points, 4)

    obs = jnp.asarray(np.stack([data.new_hospitalizations, data.new_icu,
                                data.new_deaths]))
    sim = daily + 1e-10
    ll_from_inc = float(jnp.sum(obs * jnp.log(sim) - sim))
    ll = float(jax.jit(build_objective(space, params, data, ts, substeps=2))(theta0))
    np.testing.assert_allclose(ll_from_inc, ll, rtol=1e-10)

"""Age-SIR calibration path: parameter space, Poisson incidence objective,
synthetic-recovery demo (reference ``CalibrationDemo.cpp`` ported as a test:
hill+MH recovers q / scale_C / gamma on synthetic data — VERDICT item 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.calibrator import calibrate
from mmidv1_tpu.calibration.hill import HillClimbConfig
from mmidv1_tpu.calibration.mh import MHConfig
from mmidv1_tpu.calibration.param_space import CLAMP, REFLECT
from mmidv1_tpu.calibration.sir_objective import build_sir_objective
from mmidv1_tpu.calibration.sir_space import SIRParameterSpace
from mmidv1_tpu.models.sir import (make_age_sir_params, sir_incidence,
                                   solve_age_sir)
from mmidv1_tpu.utils.exceptions import InvalidParameterException


@pytest.fixture(scope="module")
def sir_setup():
    A = 2
    N = np.array([5e5, 5e5])
    C = np.array([[3.0, 1.0], [1.0, 2.0]])
    true = make_age_sir_params(N=N, C=C, q=0.08, gamma=[0.12, 0.2],
                               scale_C=1.0)
    I0 = np.array([50.0, 20.0])
    y0 = np.stack([N - I0, I0, np.zeros(A)])
    ts = np.arange(60.0)
    traj = solve_age_sir(true, jnp.asarray(y0), jnp.asarray(ts), substeps=2)
    lam_S = np.asarray(sir_incidence(true, traj))
    rng = np.random.default_rng(5)
    observed = rng.poisson(np.maximum(lam_S, 0.0)).astype(float)
    return true, y0, ts, observed


def test_sir_space_grammar(sir_setup):
    true, *_ = sir_setup
    names = ["q", "scale_C_total", "gamma_0", "gamma_1"]
    bounds = {n: (0.001, 2.0) for n in names}
    space = SIRParameterSpace.create(names, bounds, None, true)
    # defaults sigmas applied (reference SIRParameterManager.cpp:55-63)
    np.testing.assert_allclose(np.asarray(space.sigmas), [0.05, 0.05, 0.01, 0.01])
    theta = space.extract(true)
    np.testing.assert_allclose(np.asarray(theta), [0.08, 1.0, 0.12, 0.2])
    # apply round-trips
    p2 = space.apply(true, jnp.asarray([0.1, 1.2, 0.3, 0.4]))
    assert float(p2.q) == pytest.approx(0.1)
    assert float(p2.scale_C) == pytest.approx(1.2)
    np.testing.assert_allclose(np.asarray(p2.gamma), [0.3, 0.4])
    # bad names rejected with the reference's taxonomy
    with pytest.raises(InvalidParameterException):
        SIRParameterSpace.create(["beta"], {"beta": (0, 1)}, None, true)
    with pytest.raises(InvalidParameterException):
        SIRParameterSpace.create(["gamma_7"], {"gamma_7": (0, 1)}, None, true)


def test_sir_objective_basic(sir_setup):
    true, y0, ts, observed = sir_setup
    names = ["q", "gamma_0", "gamma_1"]
    bounds = {n: (0.001, 2.0) for n in names}
    space = SIRParameterSpace.create(names, bounds, None, true)
    ll = build_sir_objective(space, true, observed, ts, y0, substeps=2)
    v_true = float(ll(space.extract(true)))
    assert np.isfinite(v_true)
    # perturbed parameters fit worse
    v_off = float(ll(jnp.asarray([0.02, 0.5, 0.5])))
    assert v_true > v_off
    # vmap works (swarm evaluation path)
    batch = jnp.stack([space.extract(true), jnp.asarray([0.02, 0.5, 0.5])])
    vv = np.asarray(jax.vmap(ll)(batch))
    np.testing.assert_allclose(vv, [v_true, v_off], rtol=1e-9)


@pytest.mark.slow
def test_sir_calibration_demo_recovers_truth(sir_setup):
    """hill+MH recovers synthetic q / gamma (the CalibrationDemo workload)."""
    true, y0, ts, observed = sir_setup
    names = ["q", "scale_C_total", "gamma_0", "gamma_1"]
    bounds = {"q": (0.005, 0.5), "scale_C_total": (0.25, 4.0),
              "gamma_0": (0.02, 0.6), "gamma_1": (0.02, 0.6)}
    space = SIRParameterSpace.create(names, bounds, None, true)
    ll_c = build_sir_objective(space, true, observed, ts, y0, substeps=2,
                               constraint_mode=CLAMP)
    ll_r = build_sir_objective(space, true, observed, ts, y0, substeps=2,
                               constraint_mode=REFLECT)
    theta0 = jnp.asarray([0.05, 1.5, 0.1, 0.1])    # wrong start
    res = calibrate(ll_c, ll_r, space, theta0, jax.random.PRNGKey(2),
                    algorithm="hillmcmc",
                    phase1_config=HillClimbConfig(iterations=120),
                    mh_config=MHConfig(iterations=400, burn_in=100,
                                       adaptation_period=50, thinning=2),
                    n_chains=16)
    best = np.asarray(res.best_theta)
    # q and scale_C are only identified through their product q*scale_C*C;
    # check the identified combinations instead of raw coordinates.
    np.testing.assert_allclose(best[0] * best[1], 0.08 * 1.0, rtol=0.1)
    np.testing.assert_allclose(best[2], 0.12, rtol=0.25)
    np.testing.assert_allclose(best[3], 0.2, rtol=0.25)
    ll_best = float(ll_c(jnp.asarray(best)))
    ll_true = float(ll_c(space.extract(true)))
    assert ll_best > ll_true - 10.0   # fits at least ~as well as the truth

"""SIR model family tests: scalar, vital-dynamics, stochastic, age-structured.

Ports the reference's AgeSIRModelTest derivative checks
(``tests/sir_age_structured/AgeSIRModelTest.cpp``) and adds coverage the
reference lacks (scalar models, stochastic chains, Gillespie)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from mmidv1_tpu.models import sir
from mmidv1_tpu.ode import integrate_times_fixed
from mmidv1_tpu.utils import InterventionException


def test_scalar_sir_vs_scipy():
    p = sir.SIRParams(N=1000.0, beta=0.4, gamma=0.04)
    y0 = jnp.asarray([999.0, 1.0, 0.0])
    ts = jnp.arange(0.0, 100.0)
    traj = integrate_times_fixed(lambda t, y: sir.sir_rhs(t, y, p), y0, ts,
                                 substeps=4)
    sol = solve_ivp(lambda t, y: np.asarray(sir.sir_rhs(t, jnp.asarray(y), p)),
                    (0, 99), np.asarray(y0), t_eval=np.asarray(ts),
                    rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj), sol.y.T, rtol=1e-6, atol=1e-6)
    # conservation
    np.testing.assert_allclose(np.asarray(traj).sum(axis=1), 1000.0, rtol=1e-9)


def test_vital_dynamics_equilibria():
    p = sir.SIRParams(N=1000.0, beta=0.4, gamma=0.04, B=0.02 * 1000, mu=0.01)
    eq = sir.equilibria(p)
    assert eq["R0"] == pytest.approx(0.4 / 0.05)
    assert eq["dfe"][0] == pytest.approx(0.02 * 1000 / 0.01)
    S_star, I_star, R_star = eq["endemic"]
    assert S_star == pytest.approx(2000.0 / 8.0)
    # endemic equilibrium is a fixed point of the RHS
    y_star = jnp.asarray([S_star, I_star, R_star])
    d = np.asarray(sir.sir_vital_rhs(0.0, y_star, p))
    np.testing.assert_allclose(d, 0.0, atol=1e-9)


def test_binomial_chain_statistics():
    p = sir.SIRParams(N=1000.0, beta=0.4, gamma=0.1)
    trajs = sir.run_stochastic_sir(p, [990.0, 10.0, 0.0], 0.0, 40.0, 0.5, 64,
                                   jax.random.PRNGKey(0))
    assert trajs.shape == (64, 81, 3)
    t = np.asarray(trajs)
    assert (t >= 0).all()
    # population is conserved per trajectory and step
    np.testing.assert_allclose(t.sum(axis=2), 1000.0, rtol=1e-9)
    # epidemic grows on average (R0 = 4)
    stats = sir.stochastic_statistics(trajs)
    assert float(stats["mean"][-1, 2]) > 500.0  # most recovered by t=40
    assert stats["p05"].shape == (81, 3)
    assert (np.asarray(stats["p05"]) <= np.asarray(stats["p95"]) + 1e-9).all()


def test_binomial_chain_reproducible():
    p = sir.SIRParams(N=500.0, beta=0.3, gamma=0.1)
    a = sir.run_stochastic_sir(p, [490.0, 10.0, 0.0], 0.0, 10.0, 0.5, 8,
                               jax.random.PRNGKey(5))
    b = sir.run_stochastic_sir(p, [490.0, 10.0, 0.0], 0.0, 10.0, 0.5, 8,
                               jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gillespie_sir():
    p = sir.SIRParams(N=300.0, beta=0.5, gamma=0.1)
    trajs = sir.run_gillespie_sir(p, [290.0, 10.0, 0.0], 0.0, 30.0, 31, 32,
                                  jax.random.PRNGKey(1))
    assert trajs.shape == (32, 31, 3)
    t = np.asarray(trajs)
    np.testing.assert_allclose(t.sum(axis=2), 300.0, rtol=1e-12)
    # S is non-increasing, R non-decreasing along each trajectory
    assert (np.diff(t[:, :, 0], axis=1) <= 1e-9).all()
    assert (np.diff(t[:, :, 2], axis=1) >= -1e-9).all()
    # mean epidemic should have taken off (R0 = 5)
    assert t[:, -1, 2].mean() > 150.0


def test_age_sir_hand_computed_derivatives():
    """Port of AgeSIRModelTest.cpp:109 derivative value checks."""
    p = sir.make_age_sir_params(
        N=[1000.0, 2000.0], C=[[2.0, 1.0], [0.5, 1.5]], q=0.1,
        gamma=[0.2, 0.1])
    y = jnp.asarray([[900.0, 1800.0], [50.0, 100.0], [50.0, 100.0]])
    d = np.asarray(sir.age_sir_rhs(0.0, y, p))
    I_over_N = np.array([50.0 / 1000.0, 100.0 / 2000.0])
    lam = 0.1 * (np.array([[2.0, 1.0], [0.5, 1.5]]) @ I_over_N)
    np.testing.assert_allclose(d[0], -lam * np.array([900.0, 1800.0]), rtol=1e-12)
    np.testing.assert_allclose(
        d[1], lam * np.array([900.0, 1800.0]) - np.array([0.2, 0.1]) * np.array([50.0, 100.0]),
        rtol=1e-12)
    np.testing.assert_allclose(d[2], np.array([0.2, 0.1]) * np.array([50.0, 100.0]),
                               rtol=1e-12)


def test_age_sir_zero_population_guard():
    p = sir.make_age_sir_params(N=[0.0, 2000.0], C=np.eye(2), q=0.1,
                                gamma=[0.1, 0.1])
    y = jnp.asarray([[0.0, 1800.0], [0.0, 100.0], [0.0, 100.0]])
    d = np.asarray(sir.age_sir_rhs(0.0, y, p))
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d[:, 0], 0.0)


def test_age_sir_interventions_and_reset():
    p = sir.make_age_sir_params(N=[1000.0], C=[[1.0]], q=0.2, gamma=[0.1])
    p2 = sir.apply_age_sir_intervention(p, "lockdown", 0.5)
    assert float(p2.scale_C) == pytest.approx(0.5)
    p3 = sir.apply_age_sir_intervention(p, "mask_mandate", 0.3)
    assert float(p3.q) == pytest.approx(0.14)
    # reset = keep original params (pure functions need no reset mechanics)
    assert float(p.q) == pytest.approx(0.2)
    with pytest.raises(InterventionException, match="Unknown"):
        sir.apply_age_sir_intervention(p, "teleportation", 0.5)
    with pytest.raises(InterventionException):
        sir.apply_age_sir_intervention(p, "mask_mandate", 1.5)
    with pytest.raises(InterventionException):
        sir.apply_age_sir_intervention(p, "lockdown", -0.1)


def test_age_sir_validation():
    with pytest.raises(ValueError):
        sir.make_age_sir_params(N=[100.0, 200.0], C=[[1.0]], q=0.1, gamma=[0.1, 0.1])
    with pytest.raises(ValueError):
        sir.make_age_sir_params(N=[100.0], C=[[1.0]], q=-0.1, gamma=[0.1])


def test_age_sir_split_simulation_intervention():
    """The intervention-at-t=20 split-simulation demo (``main.cpp:102-167`` of
    sir_age_structured): run to t, apply intervention, resume from saved state."""
    p = sir.make_age_sir_params(
        N=[1e6, 1e6], C=[[3.0, 1.0], [1.0, 2.0]], q=0.05, gamma=[0.1, 0.1])
    y0 = jnp.asarray([[1e6 - 10, 1e6], [10.0, 0.0], [0.0, 0.0]])
    ts1 = jnp.arange(0.0, 21.0)
    traj1 = sir.solve_age_sir(p, y0, ts1, substeps=2)
    p_locked = sir.apply_age_sir_intervention(p, "contact_reduction", 0.3)
    ts2 = jnp.arange(20.0, 61.0)
    traj2 = sir.solve_age_sir(p_locked, traj1[-1], ts2, substeps=2)
    # continuity at the splice point
    np.testing.assert_allclose(np.asarray(traj2[0]), np.asarray(traj1[-1]))
    # lockdown reduces final epidemic size vs. counterfactual
    traj_nolock = sir.solve_age_sir(p, traj1[-1], ts2, substeps=2)
    assert float(traj2[-1, 2].sum()) < float(traj_nolock[-1, 2].sum())


def test_sir_incidence_reconstruction():
    p = sir.make_age_sir_params(N=[1000.0, 2000.0], C=[[2.0, 1.0], [0.5, 1.5]],
                                q=0.1, gamma=[0.2, 0.1])
    y = jnp.asarray([[900.0, 1800.0], [50.0, 100.0], [50.0, 100.0]])
    traj = y[None]
    inc = np.asarray(sir.sir_incidence(p, traj))
    d = np.asarray(sir.age_sir_rhs(0.0, y, p))
    # incidence = lambda*S = -dS
    np.testing.assert_allclose(inc[0], -d[0], rtol=1e-12)

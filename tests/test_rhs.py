"""SEPAIHRD RHS unit tests vs hand-computed flows.

Plays the role the reference's derivative checks play for AgeSIRModel
(``tests/sir_age_structured/AgeSIRModelTest.cpp:109``) — but for the primary
SEPAIHRD model, which the reference never tests directly (SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mmidv1_tpu import constants as C
from mmidv1_tpu import make_params, beta_at, kappa_at
from mmidv1_tpu.models import sepaihrd as sep


@pytest.fixture()
def tiny_params():
    # 2 age groups, hand-checkable numbers
    return make_params(
        N=[1000.0, 2000.0],
        M_baseline=[[2.0, 1.0], [0.5, 1.5]],
        beta=0.4,
        a=[1.0, 0.8], h_infec=[1.0, 0.9], theta=0.5,
        sigma=0.2, gamma_p=0.5, gamma_A=0.25, gamma_I=0.1,
        gamma_H=0.1, gamma_ICU=0.05,
        p=[0.4, 0.3], h=[0.05, 0.1], icu=[0.2, 0.3],
        d_H=[0.01, 0.02], d_ICU=[0.1, 0.2], d_community=[0.001, 0.0],
    )


def test_rhs_hand_computed(tiny_params):
    prm = tiny_params
    y = jnp.zeros((11, 2), dtype=jnp.float64)
    y = y.at[C.S].set(jnp.array([900.0, 1800.0]))
    y = y.at[C.E].set(jnp.array([40.0, 80.0]))
    y = y.at[C.P].set(jnp.array([20.0, 40.0]))
    y = y.at[C.A].set(jnp.array([10.0, 20.0]))
    y = y.at[C.I].set(jnp.array([20.0, 40.0]))
    y = y.at[C.H].set(jnp.array([5.0, 10.0]))
    y = y.at[C.ICU].set(jnp.array([2.0, 4.0]))
    y = y.at[C.R].set(jnp.array([3.0, 6.0]))

    d = np.asarray(sep.rhs(0.0, y, prm))

    # Hand-compute: pi_j = (P+A+theta*I)*h_infec/N
    pi = np.array([(20 + 10 + 0.5 * 20) * 1.0 / 1000.0,
                   (40 + 20 + 0.5 * 40) * 0.9 / 2000.0])
    M = np.array([[2.0, 1.0], [0.5, 1.5]])
    lam = 0.4 * np.array([1.0, 0.8]) * (M @ pi)
    S = np.array([900.0, 1800.0])
    E = np.array([40.0, 80.0])
    P = np.array([20.0, 40.0])
    A = np.array([10.0, 20.0])
    I = np.array([20.0, 40.0])
    H = np.array([5.0, 10.0])
    ICU = np.array([2.0, 4.0])
    p = np.array([0.4, 0.3])
    h = np.array([0.05, 0.1])
    icu = np.array([0.2, 0.3])
    d_H = np.array([0.01, 0.02])
    d_ICU = np.array([0.1, 0.2])
    d_comm = np.array([0.001, 0.0])

    np.testing.assert_allclose(d[C.S], -lam * S, rtol=1e-12)
    np.testing.assert_allclose(d[C.E], lam * S - 0.2 * E, rtol=1e-12)
    np.testing.assert_allclose(d[C.P], 0.2 * E - 0.5 * P, rtol=1e-12)
    np.testing.assert_allclose(d[C.A], p * 0.5 * P - 0.25 * A, rtol=1e-12)
    np.testing.assert_allclose(
        d[C.I], (1 - p) * 0.5 * P - (0.1 + h + d_comm) * I, rtol=1e-12)
    np.testing.assert_allclose(d[C.H], h * I - (0.1 + d_H + icu) * H, rtol=1e-12)
    np.testing.assert_allclose(d[C.ICU], icu * H - (0.05 + d_ICU) * ICU, rtol=1e-12)
    np.testing.assert_allclose(
        d[C.R], 0.25 * A + 0.1 * I + 0.1 * H + 0.05 * ICU, rtol=1e-12)
    np.testing.assert_allclose(
        d[C.D], d_H * H + d_ICU * ICU + d_comm * I, rtol=1e-12)
    np.testing.assert_allclose(d[C.CUMH], h * I, rtol=1e-12)
    np.testing.assert_allclose(d[C.CUMICU], icu * H, rtol=1e-12)


def test_population_conservation(tiny_params):
    """d/dt of the 9 population compartments sums to ~0 per age group (conservative
    flows; D is absorbing so total people incl. D is conserved)."""
    prm = tiny_params
    y = jnp.abs(jnp.asarray(np.random.default_rng(0).normal(50, 20, (11, 2))))
    d = np.asarray(sep.rhs(1.0, y, prm))
    np.testing.assert_allclose(d[: C.D + 1].sum(axis=0), 0.0, atol=1e-10)


def test_schedule_semantics(spain_params):
    """beta(t)/kappa(t) boundary semantics: value(t) for t in (end[i-1], end[i]]."""
    _, params = spain_params
    bv = np.asarray(params.beta_values)
    kv = np.asarray(params.kappa_values)
    # t <= 13 -> period 1; t in (13, 63] -> period 2; t > 305 -> last
    for t, idx in [(-5.0, 0), (0.0, 0), (13.0, 0), (13.0001, 1), (63.0, 1),
                   (63.0001, 2), (305.0, 6), (310.0, 6)]:
        assert float(beta_at(params, t)) == pytest.approx(bv[idx], rel=1e-12), t
        assert float(kappa_at(params, t)) == pytest.approx(kv[idx], rel=1e-12), t


def test_rhs_frozen_matches_rhs(spain_params):
    _, params = spain_params
    rng = np.random.default_rng(1)
    y = jnp.asarray(np.abs(rng.normal(1e4, 1e3, (11, 4))))
    t = 100.0
    beta_eff = beta_at(params, t) * kappa_at(params, t)
    np.testing.assert_allclose(np.asarray(sep.rhs(t, y, params)),
                               np.asarray(sep.rhs_frozen(t, y, params, beta_eff)),
                               rtol=1e-12)


def test_state_names():
    names = sep.state_names(2)
    assert names[:4] == ["S0", "S1", "E0", "E1"]
    assert names[-2:] == ["CumICU0", "CumICU1"]
    assert len(names) == 22


def test_initial_state_inference_closed_form():
    """Port of the closed-form checks in GetCalibrationDataTests.cpp:163."""
    N = jnp.array([10000.0, 20000.0])
    cc = jnp.array([100.0, 200.0])
    cd = jnp.array([5.0, 10.0])
    ch = jnp.array([20.0, 30.0])
    ci = jnp.array([8.0, 12.0])
    sigma, gamma_p, gamma_A, gamma_I = 0.2, 0.5, 0.25, 0.1
    p = jnp.array([0.4, 0.3])
    y0 = sep.infer_initial_state(
        N=N, cumulative_confirmed_day0=cc, cumulative_deaths_day0=cd,
        cumulative_hosp_day0=ch, cumulative_icu_day0=ci,
        sigma=sigma, gamma_p=gamma_p, gamma_A=gamma_A, gamma_I=gamma_I,
        p=p, h=jnp.zeros(2))
    y0 = np.asarray(y0)

    I0 = np.array([95.0, 190.0])  # cc - cd
    P0 = I0 * gamma_I / ((1 - np.array([0.4, 0.3])) * gamma_p)
    A0 = P0 * np.array([0.4, 0.3]) * gamma_p / gamma_A
    E0 = P0 * gamma_p / sigma
    np.testing.assert_allclose(y0[4], I0)
    np.testing.assert_allclose(y0[2], P0)
    np.testing.assert_allclose(y0[3], A0)
    np.testing.assert_allclose(y0[1], E0)
    np.testing.assert_allclose(y0[8], [5.0, 10.0])    # D
    np.testing.assert_allclose(y0[5], [20.0, 30.0])   # H
    np.testing.assert_allclose(y0[6], [8.0, 12.0])    # ICU
    np.testing.assert_allclose(y0[9], [20.0, 30.0])   # CumH
    np.testing.assert_allclose(y0[10], [8.0, 12.0])   # CumICU
    # Population balance: S + E..D == N
    np.testing.assert_allclose(y0[:9].sum(axis=0), np.asarray(N), rtol=1e-12)


def test_initial_state_inference_clamps_oversized():
    """Oversized data must be clamped into the population budget
    (GetCalibrationData.cpp:168-196)."""
    N = jnp.array([100.0])
    y0 = sep.infer_initial_state(
        N=N,
        cumulative_confirmed_day0=jnp.array([500.0]),
        cumulative_deaths_day0=jnp.array([50.0]),
        cumulative_hosp_day0=jnp.array([80.0]),
        cumulative_icu_day0=jnp.array([40.0]),
        sigma=0.2, gamma_p=0.5, gamma_A=0.25, gamma_I=0.1,
        p=jnp.array([0.4]), h=jnp.zeros(1))
    y0 = np.asarray(y0)
    assert np.all(y0 >= 0)
    np.testing.assert_allclose(y0[:9].sum(axis=0), 100.0, rtol=1e-12)
    np.testing.assert_allclose(y0[8], [50.0])   # D capped first
    np.testing.assert_allclose(y0[6], [40.0])   # then ICU
    np.testing.assert_allclose(y0[5], [10.0])   # H clamped to remaining budget


def test_runup_seeding(spain_params):
    _, params = spain_params
    y = sep.runup_seeded_state(params, None)
    y = np.asarray(y)
    N = np.asarray(params.N)
    np.testing.assert_allclose(y[1].sum(), float(params.seed_exposed), rtol=1e-12)
    np.testing.assert_allclose(y[1], float(params.seed_exposed) * N / N.sum())
    np.testing.assert_allclose(y[0] + y[1], N, rtol=1e-12)
    assert np.all(y[2:] == 0)

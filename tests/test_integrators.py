"""Integrator correctness: convergence orders, exponential decay exactness,
and trajectory parity on the Spain-2020 SEPAIHRD configuration.

Parity note: the C++ reference cannot be built here (no Eigen/Boost/GSL), so the
golden trajectories come from the independent NumPy/SciPy implementation in
``reference_impl.py`` (DOP853 at rtol=atol=1e-11), which solves the identical
equations the reference documents. BASELINE.md's rtol-1e-6 trajectory-parity bar
is checked against that golden.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mmidv1_tpu.ode import (DOPRI5, CASH_KARP, FEHLBERG78, RK4, integrate_times,
                            integrate_times_fixed, fold_times_fixed, rk_step)
from mmidv1_tpu.models import sepaihrd as sep

from reference_impl import spain_like_prm, seeded_initial_state, solve_golden


def test_rk_step_exact_on_polynomials():
    # y' = 3t^2 -> y = t^3 integrated exactly by all tableaus of order >= 3
    f = lambda t, y: 3.0 * t ** 2 * jnp.ones_like(y)
    y0 = jnp.zeros((1,), dtype=jnp.float64)
    for tab in (DOPRI5, CASH_KARP, FEHLBERG78, RK4):
        y1, _ = rk_step(f, 0.0, y0, 2.0, tab)
        np.testing.assert_allclose(np.asarray(y1), 8.0, rtol=1e-12, err_msg=tab.name)


@pytest.mark.parametrize("tab,order", [(DOPRI5, 5), (CASH_KARP, 5), (RK4, 4)])
def test_fixed_convergence_order(tab, order):
    # y' = -y + sin(t), y(0)=1; smooth nonlinear-ish test
    f = lambda t, y: -y + jnp.sin(t)
    y0 = jnp.ones((1,), dtype=jnp.float64)
    ts = jnp.asarray([0.0, 4.0])
    errs = []
    for n in (8, 16):
        traj = integrate_times_fixed(f, y0, ts, substeps=n, method=tab)
        # exact: y = (sin t - cos t)/2 + C e^-t with C = 1.5
        t = 4.0
        exact = (np.sin(t) - np.cos(t)) / 2 + 1.5 * np.exp(-t)
        errs.append(abs(float(traj[-1, 0]) - exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.7, (errs, rate)


def test_adaptive_tolerance_scaling():
    f = lambda t, y: -y + jnp.sin(t)
    y0 = jnp.ones((1,), dtype=jnp.float64)
    ts = jnp.asarray([0.0, 4.0])
    t = 4.0
    exact = (np.sin(t) - np.cos(t)) / 2 + 1.5 * np.exp(-t)
    for tol in (1e-6, 1e-9):
        traj = integrate_times(f, y0, ts, atol=tol, rtol=tol)
        assert abs(float(traj[-1, 0]) - exact) < 50 * tol


def test_fehlberg78_high_accuracy():
    f = lambda t, y: -y
    y0 = jnp.ones((1,), dtype=jnp.float64)
    ts = jnp.asarray([0.0, 1.0])
    traj = integrate_times_fixed(f, y0, ts, substeps=4, method=FEHLBERG78)
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), rtol=1e-10)


@pytest.fixture(scope="module")
def spain_setup():
    prm = spain_like_prm()
    y0 = seeded_initial_state(prm)
    # Shorter horizon than production to keep compile times testable: run-up + 80
    # observed days crosses three NPI boundaries (13, 63) and the peak.
    ts = np.arange(-20.0, 71.0)
    gold = solve_golden(prm, y0, ts)
    return prm, y0, ts, gold


def _spain_params(prm):
    from mmidv1_tpu import make_params
    return make_params(
        N=prm["N"], M_baseline=prm["M"], beta=prm["beta"],
        beta_end_times=prm["beta_end_times"], beta_values=prm["beta_values"],
        kappa_end_times=prm["kappa_end_times"], kappa_values=prm["kappa_values"],
        a=prm["a"], p=prm["p"], h=prm["h"], icu=prm["icu"],
        d_H=prm["d_H"], d_ICU=prm["d_ICU"], h_infec=prm["h_infec"],
        theta=prm["theta"], sigma=prm["sigma"], gamma_p=prm["gamma_p"],
        gamma_A=prm["gamma_A"], gamma_I=prm["gamma_I"], gamma_H=prm["gamma_H"],
        gamma_ICU=prm["gamma_ICU"], d_community=prm["d_community"],
        seed_exposed=prm["seed_exposed"], runup_days=prm["runup_days"])


def test_spain_trajectory_parity_fixed(spain_setup):
    """Fixed-grid production path matches the independent golden at rtol 1e-6."""
    prm, y0, ts, gold = spain_setup
    params = _spain_params(prm)
    traj = np.asarray(sep.solve(params, jnp.asarray(y0), ts, method="fixed",
                                substeps=4))
    relerr = np.max(np.abs(traj - gold) / (np.abs(gold) + 1e-8 * np.max(gold)))
    assert relerr < 1e-6, relerr


def test_spain_trajectory_parity_bench_config(spain_setup):
    """The benchmark/production config (cash_karp @ 3 substeps/day — bench.py,
    PARITY.md tableau table) also meets the rtol 1e-6 parity bar."""
    prm, y0, ts, gold = spain_setup
    params = _spain_params(prm)
    traj = np.asarray(sep.solve(params, jnp.asarray(y0), ts, method="fixed",
                                substeps=3, tableau="cash_karp"))
    relerr = np.max(np.abs(traj - gold) / (np.abs(gold) + 1e-8 * np.max(gold)))
    assert relerr < 1e-6, relerr


def test_spain_trajectory_parity_adaptive(spain_setup):
    """Adaptive integrate_times path (odeint semantics) matches golden."""
    prm, y0, ts, gold = spain_setup
    params = _spain_params(prm)
    traj = np.asarray(sep.solve(params, jnp.asarray(y0), ts, method="adaptive",
                                atol=1e-9, rtol=1e-9))
    relerr = np.max(np.abs(traj - gold) / (np.abs(gold) + 1e-8 * np.max(gold)))
    assert relerr < 1e-6, relerr


def test_fold_matches_trajectory(spain_setup):
    """fold_times_fixed accumulates exactly what the stacked trajectory holds."""
    prm, y0, ts, _ = spain_setup
    params = _spain_params(prm)
    y0 = jnp.asarray(y0)
    traj = sep.solve(params, y0, ts, method="fixed", substeps=2)

    ctx = sep.interval_beta_eff(params, jnp.asarray(ts))
    f = lambda t, y, b: sep.rhs_frozen(t, y, params, b)

    def fold(acc, i, y):
        return acc + jnp.sum(y[8])  # running sum over all output points of total D

    acc, y_final = fold_times_fixed(f, y0, jnp.asarray(ts), fold, 0.0, substeps=2,
                                    interval_ctx=ctx)
    np.testing.assert_allclose(float(acc), float(jnp.sum(traj[:, 8, :])), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y_final), np.asarray(traj[-1]), rtol=1e-12)


def test_vmap_batched_solve_consistency(spain_setup):
    """vmap over a parameter batch reproduces per-element solves exactly
    (the ParallelConsistencyTest analogue, SURVEY.md section 4)."""
    import jax
    prm, y0, ts, _ = spain_setup
    params = _spain_params(prm)
    y0 = jnp.asarray(y0)
    ts_j = jnp.asarray(ts[:25])

    # Batch of 3 parameter sets differing in theta
    thetas = jnp.asarray([0.1, 0.2, 0.3])
    batched = params.replace(theta=thetas)

    def solve_one(theta):
        p = params.replace(theta=theta)
        return sep.solve(p, y0, ts_j, method="fixed", substeps=2)

    batch_traj = jax.vmap(lambda p: sep.solve(p, y0, ts_j, method="fixed",
                                              substeps=2))(
        jax.tree_util.tree_map(
            lambda a, b: jnp.broadcast_to(a, (3,) + a.shape) if a.ndim == b.ndim else b,
            params, batched))
    for k in range(3):
        np.testing.assert_allclose(np.asarray(batch_traj[k]),
                                   np.asarray(solve_one(thetas[k])), rtol=1e-12)


def test_compensated_fold_cuts_f32_accumulation_error():
    """Kahan-compensated fixed path: float32 state accumulation over
    thousands of substeps must land much closer to the float64 trajectory
    than the plain path. Model: a linear inflow into a cumulative row that
    grows to ~1e6 (the SEPAIHRD CumH/CumICU/D regime whose day-differencing
    sets the objective's f32 noise floor — OPS_ANALYSIS.md)."""
    import jax
    from mmidv1_tpu.ode.integrate import fold_times_fixed

    # y = [x, cum]: dx/dt = -0.03*x, dcum/dt = 0.03*x ; x0 = 1e6
    def f(t, y):
        return jnp.stack([-0.03 * y[0], 0.03 * y[0]])

    ts64 = np.linspace(0.0, 300.0, 301)
    fold = lambda acc, i, y: acc  # trajectory end state is the probe
    out = {}
    for dtype, comp in [(jnp.float64, False), (jnp.float32, False),
                        (jnp.float32, True)]:
        y0 = jnp.asarray([1e6, 0.0], dtype)
        ts = jnp.asarray(ts64, dtype)
        _, y_f = fold_times_fixed(f, y0, ts, fold, 0.0, substeps=8,
                                  method="rk4", compensated=comp)
        out[(str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
             comp)] = np.asarray(y_f, np.float64)
    ref = out[("float64", False)]
    err_plain = np.abs(out[("float32", False)] - ref).max()
    err_comp = np.abs(out[("float32", True)] - ref).max()
    # plain f32 drifts O(1) on a 1e6-scale state; compensation must cut the
    # accumulation error by well over an order of magnitude
    assert err_comp < err_plain / 10.0, (err_plain, err_comp)


def test_compensated_fold_matches_plain_in_f64():
    """In float64 the compensation is numerically inert at the test's
    tolerance: same trajectory, same fold result."""
    from mmidv1_tpu.ode.integrate import fold_times_fixed

    def f(t, y):
        return -0.5 * y + jnp.sin(t)

    ts = jnp.linspace(0.0, 10.0, 41).astype(jnp.float64)
    y0 = jnp.ones((3,), jnp.float64)
    fold = lambda acc, i, y: acc + jnp.sum(y)
    a, ya = fold_times_fixed(f, y0, ts, fold, jnp.float64(0.0),
                             substeps=4, method="cash_karp")
    b, yb = fold_times_fixed(f, y0, ts, fold, jnp.float64(0.0),
                             substeps=4, method="cash_karp",
                             compensated=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-12)

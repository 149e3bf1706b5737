"""L5 analysis layer tests: NGM reduction parity, metrics, PPC, report tree."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu import make_params
from mmidv1_tpu.analysis import (aggregate, calculate_r0, calculate_rt,
                                 essential_metrics, generate_full_report,
                                 reduced_ngm, rt_trajectory,
                                 seroprevalence_trajectory, spectral_radius)
from mmidv1_tpu.analysis.reproduction import full_ngm_matrices
from mmidv1_tpu.models import sepaihrd


@pytest.fixture(scope="module")
def rich_params(spain_params):
    """The full Spain-2020 parameter set (nontrivial schedules + severity)."""
    _prm, params = spain_params
    return params


# ----------------------------------------------------------- reproduction

def test_reduced_ngm_matches_full_16x16(rich_params):
    """The closed-form A x A NGM has the same spectral radius as the
    reference's literal 4A x 4A F V^{-1} eigen-solve."""
    params = rich_params
    for w, t in [(np.asarray(params.N), 0.0),
                 (np.asarray(params.N) * 0.7, 50.0),
                 (np.asarray(params.N) * 0.3, 200.0)]:
        F, V = full_ngm_matrices(params, w, t)
        K_full = F @ np.linalg.inv(V)
        rho_full = np.max(np.abs(np.linalg.eigvals(K_full)))
        K_red = np.asarray(reduced_ngm(params, jnp.asarray(w), t))
        rho_red = float(spectral_radius(jnp.asarray(K_red), iters=200))
        rho_red_np = np.max(np.abs(np.linalg.eigvals(K_red)))
        np.testing.assert_allclose(rho_red_np, rho_full, rtol=1e-10)
        np.testing.assert_allclose(rho_red, rho_full, rtol=1e-8)


def test_r0_scalar_sir_limit():
    """Degenerate 1-age SEPAIHRD with no severity reduces to an analytic R0."""
    params = make_params(
        N=[1e6], M_baseline=[[1.0]], beta=0.3, theta=1.0, sigma=1.0,
        gamma_p=0.5, gamma_A=0.25, gamma_I=0.25, p=[0.5])
    # K = beta * (1/gamma_p + p/gamma_A + theta*(1-p)/gamma_I)
    expected = 0.3 * (1 / 0.5 + 0.5 / 0.25 + 1.0 * 0.5 / 0.25)
    np.testing.assert_allclose(float(calculate_r0(params)), expected, rtol=1e-9)


def test_rt_decreases_with_susceptibles(rich_params):
    params = rich_params
    S_full = jnp.asarray(params.N)
    rt_full = float(calculate_rt(params, S_full, 0.0))
    rt_half = float(calculate_rt(params, 0.5 * S_full, 0.0))
    np.testing.assert_allclose(rt_half, 0.5 * rt_full, rtol=1e-9)
    np.testing.assert_allclose(rt_full, float(calculate_r0(params)), rtol=1e-9)


def test_rt_trajectory_batched(rich_params):
    params = rich_params
    ts = jnp.arange(-20.0, 80.0)
    y0 = sepaihrd.runup_seeded_state(params, None)
    traj = sepaihrd.solve(params, y0, ts, method="fixed", substeps=2)
    rt = np.asarray(rt_trajectory(params, traj, ts))
    assert rt.shape == (len(ts),)
    assert np.isfinite(rt).all() and (rt > 0).all()
    # spot-check one point against the scalar API
    k = 42
    np.testing.assert_allclose(
        rt[k], float(calculate_rt(params, traj[k, 0], float(ts[k]))), rtol=1e-6)


# ----------------------------------------------------------- metrics

def test_essential_metrics_fields(rich_params):
    params = rich_params
    ts = jnp.arange(-20.0, 120.0)
    y0 = sepaihrd.runup_seeded_state(params, None)
    traj = sepaihrd.solve(params, y0, ts, method="fixed", substeps=2)
    m = essential_metrics(params, traj, ts, y0)
    for k in ("R0", "max_Rt", "min_Rt", "final_Rt", "peak_hospital",
              "peak_ICU", "total_deaths", "overall_attack_rate",
              "overall_IFR", "seroprevalence_day64"):
        assert np.isfinite(float(m[k])), k
    assert float(m["max_Rt"]) >= float(m["final_Rt"]) >= 0
    assert float(m["peak_hospital"]) > 0
    assert 0 <= float(m["overall_attack_rate"]) <= 1
    assert np.all(np.asarray(m["IFR_age"]) >= 0)
    assert np.all(np.asarray(m["IFR_age"]) <= 1)
    # peak bookkeeping agrees with the trajectory
    total_H = np.asarray(traj[:, 5]).sum(axis=1)
    np.testing.assert_allclose(float(m["peak_hospital"]), total_H.max(),
                               rtol=1e-12)
    sero = np.asarray(seroprevalence_trajectory(params, traj))
    t64 = int(np.argmin(np.abs(np.asarray(ts) - 64.0)))
    np.testing.assert_allclose(float(m["seroprevalence_day64"]), sero[t64],
                               rtol=1e-12)


def test_essential_metrics_vmap(rich_params):
    """Metrics over a batch of trajectories in one vmap (the batched-replay
    design that replaces the reference's per-sample loop)."""
    params = rich_params
    ts = jnp.arange(-20.0, 60.0)
    y0 = sepaihrd.runup_seeded_state(params, None)

    def one(scale):
        p = params.replace(beta_values=params.beta_values * scale)
        traj = sepaihrd.solve(p, y0, ts, method="fixed", substeps=2)
        return essential_metrics(p, traj, ts, y0)

    scales = jnp.asarray([0.9, 1.0, 1.1])
    m = jax.vmap(one)(scales)
    assert m["R0"].shape == (3,)
    r0 = np.asarray(m["R0"])
    assert r0[0] < r0[1] < r0[2]


# ----------------------------------------------------------- aggregation

def test_quantile_bands_ordering():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 30, 4))
    b = aggregate.quantile_bands(v)
    assert (b["lower95"] <= b["lower90"]).all()
    assert (b["lower90"] <= b["median"]).all()
    assert (b["median"] <= b["upper90"]).all()
    assert (b["upper90"] <= b["upper95"]).all()


def test_batch_pooling_math():
    """aggregateAllBatches: pooled variance = mean of vars + var of means."""
    b1 = {"x": {"mean": 1.0, "median": 1.0, "std_dev": 2.0, "q025": 0.0,
                "q975": 5.0}}
    b2 = {"x": {"mean": 3.0, "median": 2.0, "std_dev": 2.0, "q025": -1.0,
                "q975": 4.0}}
    out = aggregate.aggregate_all_batches([b1, b2])["x"]
    assert out["mean"] == 2.0
    np.testing.assert_allclose(out["std_dev"], np.sqrt(4.0 + 1.0))
    assert out["median"] == 1.5
    assert out["q025"] == -1.0 and out["q975"] == 5.0


def test_ene_covid_validation_record():
    summary = {"seroprevalence_day64": {"mean": 0.05, "median": 0.047,
                                        "std_dev": 0.002, "q025": 0.044,
                                        "q975": 0.052}}
    rec = aggregate.ene_covid_validation(summary)
    assert rec["within_ci"] == 1.0
    assert rec["enecovid_mean"] == 0.048


# ----------------------------------------------------------- full report

def test_generate_full_report_tree(tmp_path, spain_params):
    """End-to-end report on a small synthetic posterior: all output files of
    the reference tree exist and parse."""
    from mmidv1_tpu.calibration.param_space import ParameterSpace
    from mmidv1_tpu.data import CalibrationData

    prm, params = spain_params
    n_days = 70
    rng = np.random.default_rng(3)
    obs = rng.poisson(6.0, size=(n_days, 4)).astype(float)
    data = CalibrationData.from_arrays(
        new_confirmed=obs, new_hospitalizations=obs, new_icu=obs * 0.2,
        new_deaths=obs * 0.1, population_by_age=prm["N"],
        initial_cumulative_confirmed=[100.0] * 4,
        initial_cumulative_deaths=[5.0] * 4,
        initial_cumulative_hospitalizations=[20.0] * 4,
        initial_cumulative_icu=[3.0] * 4)
    ts = np.arange(-20.0, float(n_days))

    names = ["beta_1", "theta", "seed_exposed", "kappa_2"]
    bounds = {"beta_1": (0.1, 2.0), "theta": (0.01, 1.0),
              "seed_exposed": (1.0, 500.0), "kappa_2": (0.1, 1.5)}
    sigmas = {n: 0.05 for n in names}
    space = ParameterSpace.create(names, bounds, sigmas, params)
    theta0 = np.asarray(space.extract(params))
    samples = theta0[None, :] + 0.02 * rng.normal(size=(40, len(names)))

    out = generate_full_report(samples, space, params, data, ts,
                               str(tmp_path), num_samples_for_ppc=10,
                               batch_size=16, substeps=2, async_io=True)
    assert out["n_draws"] == 40
    assert "R0" in out["summary"]

    expected = [
        "posterior_predictive/daily_deaths_median.csv",
        "posterior_predictive/daily_hospitalizations_observed.csv",
        "posterior_predictive/cumulative_deaths_upper95.csv",
        "parameter_posteriors/posterior_samples.csv",
        "parameter_posteriors/posterior_summary.csv",
        "mcmc_batches/batch_0.csv",
        "mcmc_aggregated/metrics_summary.csv",
        "rt_trajectories/Rt_aggregated_with_uncertainty.csv",
        "seroprevalence/seroprevalence_trajectory.csv",
        "seroprevalence/ene_covid_validation.csv",
        "scenarios/scenario_comparison.csv",
    ]
    for rel in expected:
        path = tmp_path / rel
        assert path.exists(), rel
        lines = path.read_text().strip().splitlines()
        assert len(lines) >= 2, rel

    # PPC median CSV has time + 4 age columns and T_obs rows
    ppc_file = (tmp_path / "posterior_predictive/daily_deaths_median.csv")
    rows = ppc_file.read_text().strip().splitlines()
    assert rows[0] == "time,age_0,age_1,age_2,age_3"
    assert len(rows) == 1 + n_days

    # scenario comparison has baseline + 2 scenarios
    scen = (tmp_path / "scenarios/scenario_comparison.csv").read_text().splitlines()
    assert len(scen) == 4
    assert scen[1].startswith("baseline,")
    assert scen[2].startswith("stricter_lockdown,")


def test_async_writer_survives_failed_task(tmp_path):
    """A failing write task must not kill the worker (wait_for_completion
    would hang); errors are recorded and later tasks still run."""
    from mmidv1_tpu.analysis.writers import AsyncWriter, write_aggregated_summary

    w = AsyncWriter()
    w.submit(lambda: (_ for _ in ()).throw(OSError("disk on fire")))
    ok_path = tmp_path / "ok.csv"
    w.submit(write_aggregated_summary, str(ok_path),
             {"R0": {"mean": 1.0, "median": 1.0, "std_dev": 0.0,
                     "q025": 1.0, "q975": 1.0}})
    w.wait_for_completion()
    assert ok_path.exists()
    assert len(w.errors) == 1 and isinstance(w.errors[0], OSError)
    w.close()


def test_convergence_diagnostics():
    """split-R-hat ~1 and high ESS for iid chains; R-hat >> 1 for divergent
    chains; ESS shrinks under strong autocorrelation."""
    from mmidv1_tpu.analysis.diagnostics import (effective_sample_size,
                                                 split_rhat, summarize)

    rng = np.random.default_rng(0)
    iid = rng.normal(size=(1000, 8, 3))
    rhat = split_rhat(iid)
    np.testing.assert_allclose(rhat, 1.0, atol=0.02)
    ess = effective_sample_size(iid)
    assert (ess > 0.5 * 8000).all()

    # divergent chain means -> large R-hat
    shifted = iid.copy()
    shifted[:, 0, :] += 10.0
    assert (split_rhat(shifted) > 1.5).all()

    # chains FROZEN at different points: within-chain draws look like tiny
    # white noise, but the var_plus coupling (Stan/Vehtari estimator) must
    # report near-zero ESS, not ~n*m (per-chain centering alone would)
    frozen = (10.0 * np.arange(8.0))[None, :, None] + \
        0.01 * rng.normal(size=(1000, 8, 3))
    ess_frozen = effective_sample_size(frozen)
    assert (ess_frozen < 50).all(), ess_frozen

    # AR(1) with phi=0.9 -> ESS ~ n*(1-phi)/(1+phi) ~ 5% of draws
    n, m = 2000, 4
    ar = np.zeros((n, m, 1))
    eps = rng.normal(size=(n, m, 1))
    for t in range(1, n):
        ar[t] = 0.9 * ar[t - 1] + eps[t]
    ess_ar = effective_sample_size(ar)[0]
    assert ess_ar < 0.15 * n * m
    assert ess_ar > 0.01 * n * m

    s = summarize(iid, ["a", "b", "c"])
    assert set(s) == {"a", "b", "c"}
    assert 0.9 < s["a"]["rhat"] < 1.05


def test_rank_normalized_rhat():
    """Vehtari et al. 2021 rank-normalized bulk/tail R-hat: ~1 for iid
    heavy-tailed chains (where the classical statistic is noisy), large for
    a VARIANCE mismatch between chains (which the classical bulk statistic
    misses entirely but the folded/tail statistic catches)."""
    from mmidv1_tpu.analysis.diagnostics import (rank_normalized_rhat,
                                                 split_rhat, summarize)

    rng = np.random.default_rng(3)
    # heavy-tailed iid: Cauchy draws have no mean/variance, classical R-hat
    # is unstable; the rank version must still read ~1
    cauchy = rng.standard_cauchy(size=(1000, 8, 2))
    rr = rank_normalized_rhat(cauchy)
    assert (rr < 1.02).all()

    # same means, 5x the std in one chain: classical bulk R-hat stays near
    # 1.0x-1.1 while the tail (folded) statistic flags it
    scale = rng.normal(size=(1000, 8, 1))
    scale[:, 0, :] *= 5.0
    assert rank_normalized_rhat(scale)[0] > 1.1
    assert rank_normalized_rhat(scale)[0] > split_rhat(scale)[0] + 0.1

    s = summarize(rng.normal(size=(500, 4, 2)), ["a", "b"])
    assert 0.95 < s["a"]["rank_rhat"] < 1.05

    # exact ties (every rejected MCMC proposal repeats the previous draw)
    # must receive IDENTICAL z-scores — average ranks, not ordinal
    from mmidv1_tpu.analysis.diagnostics import _rank_normalize
    x = np.array([[1.0, 1.0], [2.0, 2.0], [1.0, 3.0]])[:, :, None]
    z = _rank_normalize(x)
    assert z[0, 0, 0] == z[0, 1, 0] == z[2, 0, 0]   # the three 1.0 draws
    assert z[1, 0, 0] == z[1, 1, 0]                  # the two 2.0 draws
    # sticky chains (10x-repeated draws, same law per chain) stay ~1
    sticky = np.repeat(rng.normal(size=(100, 8, 2)), 10, axis=0)
    assert rank_normalized_rhat(sticky).max() < 1.05

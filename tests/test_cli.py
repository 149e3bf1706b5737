"""L6 CLI layer + L1/L2 utility smoke tests (fast paths; heavy runs marked slow)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ----------------------------------------------------------- fileutils

def test_fileutils_root_and_paths(tmp_path):
    from mmidv1_tpu.utils import fileutils

    root = fileutils.get_project_root(REPO)
    assert root == REPO
    # discovery walks up from a nested dir
    nested = os.path.join(REPO, "mmidv1_tpu", "cli")
    assert fileutils.get_project_root(nested) == REPO
    out = fileutils.get_output_path("x.csv", subdir="data/output", root=str(tmp_path))
    assert out.endswith(os.path.join("data", "output", "x.csv"))
    assert os.path.isdir(os.path.dirname(out))


# ----------------------------------------------------------- results saver

def test_save_results_csv_roundtrip(tmp_path):
    from mmidv1_tpu import constants as C
    from mmidv1_tpu.models.results import (compartment_data, save_results_csv,
                                           state_names)
    from mmidv1_tpu.utils.exceptions import InvalidResultException

    T, A = 5, 4
    rng = np.random.default_rng(0)
    traj = rng.random((T, 11, A))
    ts = np.arange(float(T))
    path = tmp_path / "res.csv"
    save_results_csv(str(path), ts, traj, C.COMPARTMENTS)
    lines = path.read_text().strip().splitlines()
    assert lines[0].split(",")[0] == "Time"
    assert lines[0].split(",")[1:] == state_names(C.COMPARTMENTS, A)
    assert len(lines) == T + 1
    row1 = np.array([float(x) for x in lines[1].split(",")[1:]])
    np.testing.assert_allclose(row1, traj[0].ravel(), rtol=1e-9)

    d = compartment_data(traj, C.COMPARTMENTS, "CumH")
    np.testing.assert_allclose(d, traj[:, 9])
    with pytest.raises(InvalidResultException):
        compartment_data(traj, C.COMPARTMENTS, "X")
    with pytest.raises(InvalidResultException):
        save_results_csv(str(path), ts, traj[:, :3], C.COMPARTMENTS)


# ----------------------------------------------------------- interventions

def test_scheduled_interventions_split_simulation():
    import jax.numpy as jnp

    from mmidv1_tpu.models.interventions import (Intervention,
                                                 solve_age_sir_scheduled)
    from mmidv1_tpu.models.sir import (apply_age_sir_intervention,
                                       make_age_sir_params, solve_age_sir)

    p = make_age_sir_params(N=[1e6, 1e6], C=[[3.0, 1.0], [1.0, 2.0]], q=0.05,
                            gamma=[0.1, 0.1])
    y0 = jnp.asarray([[1e6 - 10, 1e6], [10.0, 0.0], [0.0, 0.0]])
    ts = np.arange(0.0, 61.0)
    sched = [Intervention(20.0, "contact_reduction", 0.3)]
    traj, p_final = solve_age_sir_scheduled(p, y0, ts, sched, substeps=2)
    assert traj.shape == (61, 3, 2)
    assert float(p_final.scale_C) == pytest.approx(0.3)

    # equals the manual split-simulation (main.cpp:102-167 semantics)
    t1 = solve_age_sir(p, y0, jnp.asarray(ts[:21]), substeps=2)
    p2 = apply_age_sir_intervention(p, "contact_reduction", 0.3)
    t2 = solve_age_sir(p2, t1[-1], jnp.asarray(ts[20:]), substeps=2)
    manual = np.concatenate([np.asarray(t1), np.asarray(t2[1:])], axis=0)
    np.testing.assert_allclose(np.asarray(traj), manual, rtol=1e-12)

    # unknown interventions are swallowed (reference logs + continues)
    traj2, pf2 = solve_age_sir_scheduled(
        p, y0, ts, [Intervention(10.0, "nonsense", 1.0)], substeps=2)
    base = solve_age_sir(p, y0, jnp.asarray(ts), substeps=2)
    np.testing.assert_allclose(np.asarray(traj2), np.asarray(base), rtol=1e-12)
    with pytest.raises(Exception):
        solve_age_sir_scheduled(p, y0, ts,
                                [Intervention(10.0, "nonsense", 1.0)],
                                strict=True)


# ----------------------------------------------------------- config loaders

def test_scalar_sir_parameter_loader(tmp_path):
    from mmidv1_tpu.data import read_scalar_sir_parameters

    vendored = os.path.join(REPO, "data", "configuration",
                            "sir_input_parameters.txt")
    prm = read_scalar_sir_parameters(vendored)
    assert prm["N"] == 1000.0 and prm["beta"] == 0.4
    assert prm["numSimulations"] == 100.0 and prm["mu"] == 0.01

    # comments / unknown keys / malformed values skipped
    f = tmp_path / "p.txt"
    f.write_text("# comment\n// also comment\nN 500\nunknown 3\nbeta oops\n")
    prm = read_scalar_sir_parameters(str(f))
    assert prm["N"] == 500.0 and prm["beta"] == 0.4   # default kept


def test_rkf45_tableau():
    """The GSL stepper of the scalar models: coefficients are consistent."""
    import jax.numpy as jnp

    from mmidv1_tpu.ode import integrate_times
    from mmidv1_tpu.ode.tableaus import get_tableau

    tab = get_tableau("rkf45")
    np.testing.assert_allclose(np.sum(tab.b), 1.0, rtol=1e-12)
    np.testing.assert_allclose([np.sum(r) for r in tab.a], tab.c, atol=1e-12)
    # exponential decay accuracy
    ts = jnp.linspace(0.0, 2.0, 11)
    traj = integrate_times(lambda t, y: -y, jnp.ones(()), ts, method="rkf45",
                           atol=1e-10, rtol=1e-10, dt0=0.1)
    np.testing.assert_allclose(np.asarray(traj), np.exp(-np.asarray(ts)),
                               rtol=1e-8)


# ----------------------------------------------------------- CLI smoke

def test_cli_dispatcher_help(capsys):
    from mmidv1_tpu.cli.__main__ import main

    assert main([]) == 1
    assert main(["--help"]) == 0
    assert main(["no_such_command"]) == 1
    out = capsys.readouterr().out
    assert "sepaihrd_age_structured_main" in out


@pytest.mark.slow
def test_cli_sir_model(tmp_path):
    from mmidv1_tpu.cli.sir_mains import main

    f = tmp_path / "data" / "configuration"
    f.mkdir(parents=True)
    (f / "sir_input_parameters.txt").write_text(
        "N 1000\nbeta 0.4\ngamma 0.1\nS0 999\nI0 1\nR0 0\n"
        "t_start 0\nt_end 30\nh 0.05\neps 1e-6\nnumSimulations 5\n")
    (tmp_path / "mmidv1_tpu").mkdir()
    rc = main(["deterministic", "--project-root", str(tmp_path),
               "--params", str(f / "sir_input_parameters.txt")])
    assert rc == 0
    out = tmp_path / "data" / "output" / "sir_result.csv"
    assert out.exists()
    rows = out.read_text().strip().splitlines()
    assert rows[0] == "t,S,I,R"
    last = [float(x) for x in rows[-1].split(",")]
    np.testing.assert_allclose(sum(last[1:]), 1000.0, rtol=1e-6)


@pytest.mark.slow
def test_cli_sepaihrd_main_smoke(tmp_path):
    """The full pipeline CLI end-to-end on a tiny configuration."""
    from mmidv1_tpu.cli.sepaihrd_main import main

    rc = main(["--platform", "cpu", "--num-days", "30", "--chains", "8",
               "--scale", "0.002", "--substeps", "2", "--ppc-samples", "4",
               "--output-dir", str(tmp_path), "--project-root", REPO])
    assert rc == 0
    for rel in ("sepaihrd_age_baseline_results.csv",
                "calibrated_parameters.txt",
                "sepaihrd_age_calibrated_results.csv",
                "mcmc_aggregated/metrics_summary.csv",
                "posterior_predictive/daily_deaths_median.csv"):
        assert (tmp_path / rel).exists(), rel


@pytest.mark.slow
def test_cli_benchmark_micro(capsys):
    """sepaihrd_objective_benchmark micro mode on a truncated window."""
    from mmidv1_tpu.cli.benchmark_main import main

    rc = main(["--mode", "micro", "--batch", "32", "--repeats", "1",
               "--num-days", "20", "--platform", "cpu", "--json",
               "--project-root", REPO])
    assert rc == 0
    import json as _json
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = _json.loads(out)
    assert res["micro_evals_per_sec"] > 0
    assert res["micro_evals_per_sec_inscan"] > 0
    assert res["n_params"] == 62


@pytest.mark.slow
def test_cli_benchmark_hillmcmc(capsys):
    """The reference harness's combined hill->MCMC mode (:88-182)."""
    from mmidv1_tpu.cli.benchmark_main import main

    rc = main(["--mode", "hillmcmc", "--batch", "8", "--repeats", "1",
               "--iterations", "4", "--chains", "8", "--num-days", "15",
               "--platform", "cpu", "--json", "--project-root", REPO])
    assert rc == 0
    import json as _json
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = _json.loads(out)
    assert res["hillmcmc_wall_s"] > 0
    assert np.isfinite(res["hillmcmc_best_logl"])
    assert res["hillmcmc_best_logl"] >= res["hillmcmc_hill_best_logl"]


@pytest.mark.slow
def test_cli_sir_calibration_demo_writes_best_fit(tmp_path):
    """The demo writes mcmc_samples.csv AND the reference-format best-fit
    simulated incidence CSV (CalibrationDemo.cpp:236-281)."""
    import shutil

    from mmidv1_tpu.cli.sir_calibration_demo import main

    # project-root sandbox with the real inputs
    (tmp_path / "data" / "processed").mkdir(parents=True)
    shutil.copy(os.path.join(REPO, "data", "contacts.csv"),
                tmp_path / "data" / "contacts.csv")
    shutil.copy(os.path.join(REPO, "data", "processed", "processed_data.csv"),
                tmp_path / "data" / "processed" / "processed_data.csv")
    rc = main(["--platform", "cpu", "--project-root", str(tmp_path),
               "--hill-iters", "3", "--mcmc-iters", "6", "--burn-in", "2",
               "--chains", "4", "--num-days", "12"])
    assert rc == 0
    out = tmp_path / "data" / "calibration_output"
    assert (out / "mcmc_samples.csv").exists()
    sim = (out / "simulated_incidence_best_fit.csv").read_text().splitlines()
    assert sim[0] == ("Time,simulated_I_0_30,simulated_I_30_60,"
                      "simulated_I_60_80,simulated_I_80_plus")
    assert len(sim) == 13   # 12 days + header
    vals = [float(v) for v in sim[1].split(",")[1:]]
    assert all(v >= 0 for v in vals)


@pytest.mark.slow
def test_cli_sir_age_structured_main(tmp_path, capsys):
    from mmidv1_tpu.cli.sir_age_structured_main import main

    rc = main(["--platform", "cpu", "--days", "40", "--project-root", REPO])
    assert rc == 0
    out = capsys.readouterr().out
    assert "peak_infected_baseline" in out
    base = float(out.split("peak_infected_baseline")[1].split()[0])
    interv = float(out.split("peak_infected_intervention")[1].split()[0])
    assert base > interv > 0     # the lockdown demo flattens the peak
    assert os.path.exists(os.path.join(
        REPO, "data", "output", "sir_age_intervention_results.csv"))

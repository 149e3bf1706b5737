"""L7 script layer: raw-data processor regression + report generation."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def test_covid_data_processor_reproduces_committed_output():
    """data/raw/ES.csv -> processed_data.csv regenerates the committed file
    exactly (the reference's CovidDataProcessor.py capability)."""
    sys.path.insert(0, SCRIPTS)
    import covid_data_processor

    rc = covid_data_processor.main(["--check"])
    assert rc == 0


def test_post_calibration_analysis_report(tmp_path, spain_params):
    """The plotting script renders figures + analysis_report.html from a
    generate_full_report output tree."""
    import numpy as np

    from mmidv1_tpu.analysis import generate_full_report
    from mmidv1_tpu.calibration.param_space import ParameterSpace
    from mmidv1_tpu.data import CalibrationData

    prm, params = spain_params
    n_days = 40
    rng = np.random.default_rng(11)
    obs = rng.poisson(5.0, size=(n_days, 4)).astype(float)
    data = CalibrationData.from_arrays(
        new_confirmed=obs, new_hospitalizations=obs, new_icu=obs * 0.2,
        new_deaths=obs * 0.1, population_by_age=prm["N"])
    ts = np.arange(-20.0, float(n_days))
    names = ["beta_1", "theta", "kappa_2"]
    space = ParameterSpace.create(
        names, {"beta_1": (0.1, 2.0), "theta": (0.01, 1.0),
                "kappa_2": (0.1, 1.5)},
        {n: 0.05 for n in names}, params)
    theta0 = np.asarray(space.extract(params))
    samples = theta0[None, :] + 0.02 * rng.normal(size=(12, 3))
    generate_full_report(samples, space, params, data, ts, str(tmp_path),
                         num_samples_for_ppc=6, batch_size=8, substeps=2)

    sys.path.insert(0, SCRIPTS)
    import post_calibration_analysis

    rc = post_calibration_analysis.main(["--input", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "analysis_report.html").exists()
    figs = {p.name for p in (tmp_path / "figures").glob("*.png")}
    assert len(figs) >= 12
    # the reference's three additional figure families
    # (PostCalibrationAnalysis.py:161-331)
    assert "age_stratified_daily_deaths.png" in figs
    assert "age_stratified_daily_hospitalizations.png" in figs
    assert "age_specific_severity_metrics_bar_CI.png" in figs
    assert "parameter_posteriors_kde.png" in figs
    html = (tmp_path / "analysis_report.html").read_text()
    assert "Aggregated metrics" in html and "Scenario comparison" in html


def test_compare_calibration_and_observed(tmp_path):
    """The calibrated-vs-observed overlay script (reference
    scripts/age-structured-calibration/compare_calibration_and_observed.py)."""
    import numpy as np
    import pandas as pd

    sys.path.insert(0, SCRIPTS)
    import compare_calibration_and_observed as cmp_script

    # synthesize a best-fit simulated file in the demo's output format
    t = np.arange(30.0)
    sim = pd.DataFrame({"Time": t})
    for k in ["0_30", "30_60", "60_80", "80_plus"]:
        sim[f"simulated_I_{k}"] = 100.0 * np.exp(-0.1 * t)
    sim_path = tmp_path / "simulated_incidence_best_fit.csv"
    sim.to_csv(sim_path, index=False)

    out_dir = tmp_path / "viz"
    rc = cmp_script.main(["--simulated", str(sim_path),
                          "--output", str(out_dir)])
    assert rc == 0
    assert (out_dir / "calibration_comparison.png").exists()
    assert (out_dir / "simulated_cases.png").exists()
    # missing simulated file -> clean failure, not a traceback
    rc = cmp_script.main(["--simulated", str(tmp_path / "nope.csv"),
                          "--output", str(out_dir)])
    assert rc == 1


@pytest.mark.slow
def test_production_campaign_smoke(tmp_path):
    """The segmented campaign driver end-to-end on a tiny CPU configuration."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import production_campaign

    rc = production_campaign.main([
        "--chains", "8", "--iterations", "12", "--segments", "3",
        "--burn-in", "2", "--thinning", "4", "--substeps", "2",
        "--dtype", "float64",          # conftest enables x64 process-wide
        "--out", str(tmp_path), "--skip-report"])
    assert rc == 0
    assert (tmp_path / "campaign_checkpoint.npz").exists()
    assert (tmp_path / "posterior_trace.csv").exists()
    import json
    meta = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta["best_logl_float64"] > 1.0e6
    assert "max_rhat" in meta["diagnostics"]
    # the float64 MAP must round-trip through the re-loadable params format
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv
    assert (tmp_path / "calibrated_parameters.txt").exists()
    M = read_matrix_from_csv(os.path.join(REPO, "data", "contacts.csv"), 4, 4)
    reloaded = read_sepaihrd_parameters(
        str(tmp_path / "calibrated_parameters.txt"), 4,
        N=[1.0] * 4, M_baseline=M)
    assert float(reloaded.beta_values[0]) > 0


@pytest.mark.slow
def test_production_campaign_pt_smoke(tmp_path):
    """The campaign driver's replica-exchange mode (--rungs > 1)."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import production_campaign

    rc = production_campaign.main([
        "--chains", "12", "--rungs", "3", "--iterations", "12",
        "--segments", "2", "--burn-in", "2", "--thinning", "4",
        "--substeps", "2", "--dtype", "float64",
        "--out", str(tmp_path), "--skip-report"])
    assert rc == 0
    import json
    meta = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta["rungs"] == 3
    assert len(meta["swap_rate"]) == 2
    assert meta["best_logl_float64"] > 1.0e6
    # the cold rung's stored samples have the per-rung width
    import numpy as np
    trace = (tmp_path / "posterior_trace.csv").read_text().splitlines()
    assert len(trace) > 1
    assert (tmp_path / "campaign_checkpoint_pt.npz").exists()
    # per-segment cold-rung draws are persisted next to the checkpoint
    assert (tmp_path / "pt_segment_0000.npz").exists()
    assert (tmp_path / "pt_segment_0001.npz").exists()

    # Resume with more segments: the final posterior must cover BOTH the
    # pre-resume and post-resume segments (the checkpoint alone only carries
    # the final chain state).
    n_rows_before = len(trace) - 1
    rc = production_campaign.main([
        "--chains", "12", "--rungs", "3", "--iterations", "18",
        "--segments", "3", "--burn-in", "2", "--thinning", "4",
        "--substeps", "2", "--dtype", "float64",
        "--out", str(tmp_path), "--skip-report"])
    assert rc == 0
    trace2 = (tmp_path / "posterior_trace.csv").read_text().splitlines()
    assert len(trace2) - 1 > n_rows_before  # old segments retained + new ones
    meta2 = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta2["stored_samples"] > meta["stored_samples"]


@pytest.mark.slow
@pytest.mark.campaign
def test_nuts_campaign_smoke(tmp_path):
    """The NUTS campaign driver end-to-end on a tiny CPU configuration
    (XLA gradient engine; the Pallas adjoint path needs a TPU)."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import nuts_campaign

    rc = nuts_campaign.main([
        "--chains", "4", "--iterations", "6", "--warmup", "2",
        "--depth", "2", "--substeps", "2", "--engine", "xla",
        "--out", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "posterior_trace.csv").exists()
    import json
    meta = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta["sampler"] == "nuts_laplace-dense"   # default mass mode
    assert meta["best_logl_float64"] > 1.0e6
    assert "min_ess_per_sec" in meta["diagnostics"]
    assert (tmp_path / "calibrated_parameters.txt").exists()


@pytest.mark.slow
@pytest.mark.campaign
def test_nuts_campaign_serovalid_smoke(tmp_path):
    """--serovalid end-to-end on CPU: the campaign samples the relaxed-
    bounds + sero-term joint, records the serovalid block in its metadata,
    and refresh_artifact REFUSES to promote it into the reference-bounds
    artifact (the posteriors answer different questions)."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import json

    import nuts_campaign

    sv = os.path.join(REPO, "results", "spain2020_serovalid")
    if not os.path.exists(os.path.join(sv, "laplace_serovalid.npz")):
        pytest.skip("serovalid artifact not built")
    rc = nuts_campaign.main([
        "--chains", "2", "--iterations", "4", "--warmup", "2",
        "--depth", "2", "--substeps", "2", "--engine", "xla",
        "--serovalid",
        "--laplace", os.path.join(sv, "laplace_serovalid.npz"),
        "--init", os.path.join(sv, "calibrated_parameters.txt"),
        "--out", str(tmp_path)])
    assert rc == 0
    meta = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta["serovalid"]["severity_floor_div"] == 10.0
    import refresh_artifact
    with pytest.raises(SystemExit, match="serovalid"):
        refresh_artifact.main([str(tmp_path),
                               "--artifact", str(tmp_path / "ref_art")])


@pytest.mark.slow
@pytest.mark.campaign
def test_nuts_campaign_absolute_burn(tmp_path):
    """--posterior-burn-iters discards an ABSOLUTE number of post-warmup
    draws (not a fraction), records the policy in campaign_metadata.json,
    and ships the corresponding window in samples.npz."""
    import json

    import numpy as np

    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import nuts_campaign

    rc = nuts_campaign.main([
        "--chains", "4", "--iterations", "40", "--warmup", "4",
        "--depth", "2", "--substeps", "2", "--engine", "xla",
        "--segments", "2", "--posterior-burn-iters", "10",
        "--out", str(tmp_path)])
    assert rc == 0
    meta = json.loads((tmp_path / "campaign_metadata.json").read_text())
    assert meta["posterior_burn"]["iters"] == 10
    assert "absolute" in meta["posterior_burn"]["policy"]
    assert meta["posterior_burn"]["kept"] == 40 - 4 - 10
    z = np.load(tmp_path / "samples.npz")
    assert z["samples"].shape[0] == 26


def test_make_laplace_trace(tmp_path):
    """The Laplace-derived serovalid warm trace has the campaign trace
    layout (samples (iters, chains, dim) + names), every draw strictly
    inside the RELAXED bounds, and is deterministic under a seed."""
    import numpy as np

    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import make_laplace_trace as mlt

    sv = os.path.join(REPO, "results", "spain2020_serovalid")
    lap_path = os.path.join(sv, "laplace_serovalid.npz")
    if not os.path.exists(lap_path):
        pytest.skip("serovalid Laplace not built")
    out = tmp_path / "trace.npz"
    argv = ["--laplace", lap_path, "--out", str(out),
            "--iters", "4", "--chains", "8", "--seed", "7"]
    old = sys.argv
    sys.argv = ["make_laplace_trace.py"] + argv
    try:
        assert mlt.main() == 0
    finally:
        sys.argv = old
    z = np.load(out)
    assert z["samples"].shape == (4, 8, 62)
    from mmidv1_tpu.calibration.serovalid import relax_bounds
    from mmidv1_tpu.cli.common import load_spain_pipeline
    space, _ = relax_bounds(load_spain_pipeline(REPO).space)
    lo = np.asarray(space.lower, float)
    hi = np.asarray(space.upper, float)
    s = z["samples"].reshape(-1, 62)
    assert (s > lo).all() and (s < hi).all()
    assert [str(n) for n in z["names"]] == list(space.names)


def test_serovalid_block_renders_posterior_intervals(tmp_path):
    """The report's serovalid comparison table gains a posterior row with
    credible intervals, the convergence note, and side-by-side parameter
    bands once a serovalid campaign has been promoted (run_metadata.json
    carries posterior_summary + campaign_diagnostics and
    posterior_samples.npz exists); without a posterior it renders the
    MAP-only table unchanged."""
    import json
    import shutil

    import numpy as np

    sys.path.insert(0, SCRIPTS)
    import post_calibration_analysis as pca

    sv = os.path.join(REPO, "results", "spain2020_serovalid")
    if not os.path.exists(os.path.join(sv, "serovalid_metadata.json")):
        pytest.skip("serovalid artifact not built")
    blk = pca._serovalid_block()
    assert blk is not None and "Externally-validated" in blk
    if not os.path.exists(os.path.join(sv, "posterior_samples.npz")):
        assert "NUTS posterior" not in blk

    d = tmp_path / "sv"
    d.mkdir()
    shutil.copy(os.path.join(sv, "serovalid_metadata.json"), d)
    np.savez(d / "posterior_samples.npz",
             samples=np.random.default_rng(0).normal(size=(100, 2)),
             logls=np.zeros(100),
             names=np.array(["p_0", "seed_exposed"]))
    (d / "run_metadata.json").write_text(json.dumps({
        "posterior_summary": {
            "n_replayed": 64,
            "sero_day64": {"q2.5": 0.043, "q50": 0.048, "q97.5": 0.053},
            "sero_inside_ci_frac": 0.93, "ene_covid_mean": 0.048,
            "logl": {"q2.5": 1.43e6, "q50": 1.434e6, "q97.5": 1.4345e6}},
        "campaign_diagnostics": {"max_rhat": 1.04, "max_rank_rhat": 1.045,
                                 "min_ess": 800}}))
    blk = pca._serovalid_block(str(d))
    assert "NUTS posterior" in blk
    assert "min ESS 800" in blk
    assert "93% of draws" in blk
    if os.path.exists(os.path.join(REPO, "results", "spain2020",
                                   "posterior_samples.npz")):
        assert "Posterior bands" in blk and "seed_exposed" in blk


@pytest.mark.slow
@pytest.mark.campaign
def test_nuts_campaign_early_stop(tmp_path, capsys):
    """--stop-when-converged ends the final stage once the live burned-window
    R-hat has cleared the gate for N consecutive segments: the run stops
    short of --iterations, still writes a complete artifact, and the
    end-of-run gate re-check passes (rc 0)."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import nuts_campaign

    rc = nuts_campaign.main([
        "--chains", "4", "--iterations", "280", "--warmup", "4",
        "--depth", "2", "--substeps", "2", "--engine", "xla",
        "--segments", "14", "--require-rhat", "1000",
        "--stop-when-converged", "2", "--out", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "EARLY STOP" in out
    # stopped short: the saved trace has fewer than the requested iterations
    z = np.load(tmp_path / "samples.npz")
    state = np.load(tmp_path / "nuts_state.npz")
    assert int(state["it"]) < 280
    assert z["samples"].shape[0] >= 1
    assert (tmp_path / "posterior_trace.csv").exists()


@pytest.mark.slow
@pytest.mark.campaign
def test_map_polish_and_laplace_warm_starts(tmp_path):
    """The second-order polish chain: map_polish.py emits a Laplace mass
    matrix that nuts_campaign.py (--mass laplace) and production_campaign.py
    (--laplace) consume for curvature-scale warm starts."""
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import map_polish
    import nuts_campaign
    import production_campaign

    polish_dir = tmp_path / "polish"
    rc = map_polish.main(["--rounds", "1", "--maxiter", "2",
                          "--substeps", "2", "--out", str(polish_dir)])
    assert rc == 0
    lap_path = polish_dir / "laplace_mass.npz"
    assert lap_path.exists()
    lap = np.load(lap_path)
    assert lap["theta_map"].shape == lap["std"].shape == (62,)
    assert (lap["std"] > 0).all() and np.isfinite(lap["std"]).all()
    assert lap["cov_free"].shape[0] == int(lap["free"].sum())
    assert float(lap["ll_map"]) > 1.0e6
    import json
    meta = json.loads((polish_dir / "polish_metadata.json").read_text())
    assert meta["algorithm"] == "lbfgsb_laplace_whitened"
    # polish never loses likelihood
    assert meta["rounds"][-1]["ll"] >= meta["rounds"][0]["ll"] - 1e-6

    nuts_dir = tmp_path / "nuts"
    rc = nuts_campaign.main([
        "--chains", "4", "--iterations", "4", "--warmup", "2",
        "--depth", "2", "--substeps", "2", "--engine", "xla",
        "--mass", "laplace", "--laplace", str(lap_path),
        "--out", str(nuts_dir)])
    assert rc == 0
    meta = json.loads((nuts_dir / "campaign_metadata.json").read_text())
    assert meta["best_logl_float64"] > 1.0e6

    mh_dir = tmp_path / "mh"
    rc = production_campaign.main([
        "--chains", "8", "--iterations", "8", "--segments", "2",
        "--burn-in", "2", "--thinning", "4", "--substeps", "2",
        "--dtype", "float64", "--laplace", str(lap_path),
        "--proposal", "de", "--out", str(mh_dir), "--skip-report"])
    assert rc == 0
    meta = json.loads((mh_dir / "campaign_metadata.json").read_text())
    # Laplace warm start initializes at the polished MAP, so the campaign's
    # float64 MAP can never fall below it by more than proposal wander
    assert meta["best_logl_float64"] >= float(lap["ll_map"]) - 1.0


def test_data_visualization_eda_suite(tmp_path):
    """The EDA suite (reference scripts/DataVisualization/CovidDataVisualizer
    run_all_visualizations) renders every figure group from the committed
    processed data."""
    sys.path.insert(0, SCRIPTS)
    import data_visualization as dv

    rc = dv.main(["eda", "--out", str(tmp_path)])
    assert rc == 0
    made = sorted(os.listdir(tmp_path))
    # one file per figure in every group: 4 new + 4 cumulative + 16 age
    # (8 metrics x grouped/stacked) + 4 rates + growth + dashboard
    assert len(made) == 30
    assert "dashboard_overview.png" in made
    assert "stacked_new_confirmed_by_age.png" in made
    for f in made:
        assert os.path.getsize(os.path.join(tmp_path, f)) > 10_000


def test_data_visualization_dynamics_simulate(tmp_path):
    """plot-dynamics --simulate runs the in-repo forward model and renders a
    panel per compartment (reference plot_sepaihrd_dynamics.py:19-117)."""
    sys.path.insert(0, SCRIPTS)
    import data_visualization as dv

    rc = dv.main(["plot-dynamics", "--simulate", "--out", str(tmp_path)])
    assert rc == 0
    made = sorted(os.listdir(tmp_path))
    assert made == [f"sepaihrd_{c}.png"
                    for c in sorted(dv.COMPARTMENTS)]


def test_data_visualization_dynamics_csv_roundtrip(tmp_path):
    """A trajectory written by save_results_csv is readable by the dynamics
    plotter (the reference consumes the C++ binary's CSVs the same way)."""
    import numpy as np

    from mmidv1_tpu.models.results import save_results_csv
    from mmidv1_tpu.constants import COMPARTMENTS

    sys.path.insert(0, SCRIPTS)
    import data_visualization as dv

    T, A = 20, 4
    traj = np.abs(np.random.default_rng(0).normal(
        size=(T, len(COMPARTMENTS), A))) * 100
    csv = tmp_path / "sim.csv"
    save_results_csv(str(csv), np.arange(float(T)), traj, COMPARTMENTS)
    rc = dv.main(["plot-dynamics", "--csv", str(csv),
                  "--out", str(tmp_path / "figs"), "--log"])
    assert rc == 0
    assert len(os.listdir(tmp_path / "figs")) == 9


def test_nuts_campaign_resume_guards(tmp_path):
    """--resume must refuse configurations that would silently corrupt the
    trace: non-dense mass modes (run_nuts_whitened has no resume path) and
    a checkpoint without its partial-samples sibling."""
    sys.path.insert(0, SCRIPTS)
    import nuts_campaign

    with pytest.raises(SystemExit):
        nuts_campaign.main(["--resume", "--mass", "laplace",
                            "--platform", "cpu", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):   # dense mode but no checkpoint on disk
        nuts_campaign.main(["--resume", "--mass", "laplace-dense",
                            "--platform", "cpu", "--out", str(tmp_path)])
    # checkpoint present but partial trace missing -> refuse
    (tmp_path / "nuts_state.npz").write_bytes(b"")
    with pytest.raises(SystemExit):
        nuts_campaign.main(["--resume", "--mass", "laplace-dense",
                            "--platform", "cpu", "--out", str(tmp_path)])


def test_refresh_artifact(tmp_path):
    """refresh_artifact.py promotes a campaign into the artifact layout:
    flattened posterior subsample, metadata campaign block + diagnostics,
    MAP adopted only when the float64 LL improves."""
    import json

    import numpy as np
    sys.path.insert(0, SCRIPTS)
    import refresh_artifact

    camp = tmp_path / "camp"
    camp.mkdir()
    art = tmp_path / "art"
    art.mkdir()
    rng = np.random.default_rng(0)
    names = [f"p{i}" for i in range(3)]
    np.savez(camp / "samples.npz", samples=rng.normal(size=(20, 4, 3)),
             logps=rng.normal(size=(20, 4)), names=np.asarray(names))
    (camp / "campaign_metadata.json").write_text(json.dumps({
        "sampler": "nuts_test", "chains": 4, "iterations": 20,
        "best_logl_float64": 2.0,
        "diagnostics": {"max_rhat": 1.01, "max_rank_rhat": 1.02,
                        "min_ess": 500.0}}))
    (camp / "calibrated_parameters.txt").write_text("stub\n")
    (art / "run_metadata.json").write_text(json.dumps(
        {"best_logl_float64": 1.0}))

    rc = refresh_artifact.main([str(camp), "--artifact", str(art),
                                "--draws", "30"])
    assert rc == 0
    z = np.load(art / "posterior_samples.npz")
    assert z["samples"].shape == (30, 3)
    meta = json.loads((art / "run_metadata.json").read_text())
    assert meta["best_logl_float64"] == 2.0          # adopted (2.0 > 1.0)
    assert (art / "calibrated_parameters.txt").read_text() == "stub\n"
    assert meta["campaign_diagnostics"]["max_rhat"] == 1.01
    assert "nuts_test" in meta["posterior_source"]

@pytest.mark.slow
@pytest.mark.campaign
def test_nuts_campaign_resume_reconciles_uncheckpointed_partial(tmp_path):
    """Crash-window recovery: the campaign writes each segment's partial
    file BEFORE the state checkpoint (state = commit point), so a crash in
    between leaves one uncheckpointed partial. --resume must drop it (in
    memory AND on disk), re-run that segment bit-exactly, and an extended
    resume (--iterations grown) must reproduce the uninterrupted run; a
    partial trace with a HOLE must be refused."""
    import json
    import shutil

    import numpy as np
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import nuts_campaign

    common = ["--chains", "2", "--warmup", "2", "--depth", "2",
              "--substeps", "2", "--engine", "xla", "--seed", "3"]

    ref = tmp_path / "ref"          # uninterrupted 8-iteration run
    rc = nuts_campaign.main(common + ["--iterations", "8", "--segments", "4",
                                      "--out", str(ref)])
    assert rc == 0
    ref_samples = np.load(ref / "samples.npz")["samples"]

    # a 4-iteration run = the same campaign killed halfway (identical key
    # table: split(k, n) prefixes agree across n)
    crash = tmp_path / "crash"
    rc = nuts_campaign.main(common + ["--iterations", "4", "--segments", "2",
                                      "--out", str(crash)])
    assert rc == 0
    # simulate the crash window: segment 3's partial landed, state did not
    shutil.copy(crash / "partial_samples_0001.npz",
                crash / "partial_samples_0002.npz")

    rc = nuts_campaign.main(common + ["--iterations", "8", "--segments", "4",
                                      "--resume", "--require-rhat", "1.0",
                                      "--out", str(crash)])
    assert rc == 3                     # gate at 1.0 can never pass -> 3,
    #                                    distinct from argparse's exit 2
    res_samples = np.load(crash / "samples.npz")["samples"]
    np.testing.assert_array_equal(res_samples, ref_samples)
    meta = json.loads((crash / "campaign_metadata.json").read_text())
    assert meta["iterations"] == 8

    # a hole (missing middle partial) is unrecoverable -> refuse
    os.remove(crash / "partial_samples_0001.npz")
    with pytest.raises(SystemExit):
        nuts_campaign.main(common + ["--iterations", "10", "--segments", "5",
                                     "--resume", "--out", str(crash)])

@pytest.mark.slow
def test_production_campaign_mh_resume_covers_presume_segments(tmp_path):
    """The MH branch persists per-segment sample files and a resumed
    campaign's posterior includes the pre-resume segments (previously the
    resumed process silently reported only its own segments' draws)."""
    import json

    import numpy as np
    sys.path.insert(0, SCRIPTS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import production_campaign

    common = ["--chains", "8", "--burn-in", "2", "--thinning", "4",
              "--substeps", "2", "--dtype", "float64",
              "--out", str(tmp_path), "--skip-report"]
    # interrupted: first 2 of 3 segments (4 iters each -> step 8)
    rc = production_campaign.main(common + ["--iterations", "8",
                                            "--segments", "2"])
    assert rc == 0
    assert (tmp_path / "mh_segment_0000.npz").exists()
    assert (tmp_path / "mh_segment_0001.npz").exists()
    meta1 = json.loads((tmp_path / "campaign_metadata.json").read_text())

    # resume to the full 3-segment campaign
    rc = production_campaign.main(common + ["--iterations", "12",
                                            "--segments", "3"])
    assert rc == 0
    assert (tmp_path / "mh_segment_0002.npz").exists()
    meta2 = json.loads((tmp_path / "campaign_metadata.json").read_text())
    # posterior covers ALL segments (1 stored block of 8 chains each)
    assert meta2["stored_samples"] == 3 * 8
    assert meta2["stored_samples"] > meta1["stored_samples"]
    # wall accumulates across the resume (total >= the resumed process's)
    assert meta2["wall_seconds"] > meta1["wall_seconds"]
    # and the reassembled trace equals the concatenated segment files
    seg = [np.load(tmp_path / f"mh_segment_{s:04d}.npz")["samples"]
           for s in range(3)]
    trace = (tmp_path / "posterior_trace.csv").read_text().splitlines()
    assert len(trace) - 1 == sum(x.shape[0] * x.shape[1] for x in seg)

def test_tpu_guard_noop_off_tpu():
    """The first-RPC wedge guard must be a clean no-op on CPU backends
    (it only probes tunneled-TPU sessions) and must not leave a timer
    thread that could os._exit the process later."""
    from mmidv1_tpu.utils.tpu_guard import assert_first_rpc_responsive
    assert_first_rpc_responsive(timeout_s=0.01)


def test_autopilot_run_logged_kills_silent_child():
    """The autopilot's watchdog must kill a child that hangs WITHOUT
    printing (a dead tunneled-TPU RPC blocks silently — a blocking readline
    loop would never notice)."""
    import time

    sys.path.insert(0, SCRIPTS)
    import tpu_autopilot

    # run_logged settles AXON_SETTLE_SECONDS before each launch (tunnel
    # teardown races); zero it so the watchdog timing is what's measured
    os.environ["AXON_SETTLE_SECONDS"] = "0"
    t0 = time.time()
    rc, out = tpu_autopilot.run_logged(
        [sys.executable, "-c",
         "import time; print('up', flush=True); time.sleep(600)"],
        timeout=300, tag="t", silence_timeout=3)
    assert rc == -9
    assert "up" in out
    assert time.time() - t0 < 60

    # and a normal child passes its rc + output through
    rc, out = tpu_autopilot.run_logged(
        [sys.executable, "-c", "print('done'); raise SystemExit(7)"],
        timeout=60, tag="t2", silence_timeout=30)
    assert rc == 7
    assert "done" in out

def test_autopilot_state_machine(tmp_path, monkeypatch):
    """The production retry loop end-to-end with scripted child outcomes:
    crash-without-checkpoint -> fresh restart; gate-failure (rc 3) ->
    --resume with extended --iterations; success -> promotion; exit 0 only
    when converged AND promoted. argparse errors (rc 2) abort instead of
    retry-looping."""
    import json

    sys.path.insert(0, SCRIPTS)
    import tpu_autopilot

    out = tmp_path / "campaign"
    out.mkdir()
    done = tmp_path / "AUTOPILOT_DONE.json"
    monkeypatch.setattr(tpu_autopilot, "DONE_PATH", str(done))
    monkeypatch.setattr(tpu_autopilot, "tpu_up", lambda timeout=90: True)
    calls = []
    outcomes = iter([
        (-9, "tunnel died"),                       # crash, no checkpoint yet
        (3, "CONVERGENCE GATE FAILED"),            # completed, not converged
        (0, "convergence gate passed"),            # converged
        (7, "wedged tunnel session"),              # promote hits a wedge...
        (0, "artifacts promoted"),                 # ...and is retried
    ])

    def fake_run_logged(cmd, timeout, tag, silence_timeout=1800,
                        startup_marker=None, startup_timeout=600):
        rc, text = next(outcomes)
        calls.append((tag, cmd, rc))
        if "nuts_campaign.py" in cmd[1]:
            if rc in (0, 3):                       # a completed run leaves
                (out / "nuts_state.npz").write_bytes(b"x")   # state +
                (out / "campaign_metadata.json").write_text(  # diagnostics
                    json.dumps({"diagnostics": {
                        "max_rhat": 1.2 if rc == 3 else 1.01,
                        "max_rank_rhat": 1.2 if rc == 3 else 1.02,
                        "min_ess": 1000.0}}))
        return rc, text

    monkeypatch.setattr(tpu_autopilot, "run_logged", fake_run_logged)
    monkeypatch.setattr(tpu_autopilot.time, "sleep", lambda s: None)
    rc = tpu_autopilot.main(["--skip-probes", "--out", str(out),
                             "--iterations", "4000", "--extend-by", "2000",
                             "--trace", "unused.npz"])
    assert rc == 0
    tags = [c[0] for c in calls]
    # a wedged promotion session must be retried, not declared fatal
    assert tags == ["prod1", "prod2", "prod3", "promote1", "promote2"]
    # attempt 1 crashed with no checkpoint -> attempt 2 is a FRESH restart
    assert "--resume" not in calls[1][1]
    assert "4000" in calls[1][1]
    # attempt 2 failed the gate with a checkpoint -> attempt 3 resumes,
    # extended by --extend-by
    assert "--resume" in calls[2][1]
    assert "6000" in calls[2][1]
    summary = json.loads(done.read_text())
    assert summary["status"] == "converged_and_promoted"
    assert summary["stages"]["production_attempt_3"]["max_rhat"] == 1.01
    assert summary["stages"]["promotion_attempt_1"]["rc"] == 7
    assert summary["stages"]["promotion_attempt_2"]["rc"] == 0

    # argparse error (rc 2) aborts the loop: not converged, exit 1
    calls.clear()
    outcomes = iter([(2, "usage: error")])
    rc = tpu_autopilot.main(["--skip-probes", "--out", str(out / "x"),
                             "--trace", "unused.npz"])
    assert rc == 1
    assert [c[0] for c in calls] == ["prod1"]
    assert json.loads(done.read_text())["status"] == "not_converged"


def test_finisher_gate_state(tmp_path):
    """r19_finisher.gate_state: stale metadata (older than the campaign
    launch) and unparseable/missing files read as 'missing' (-> autopilot
    resume path); fresh diagnostics split into passed/failed on the same
    max(split, rank) < 1.05 AND min-ESS > 400 bar the promotion records."""
    import json
    import time

    sys.path.insert(0, SCRIPTS)
    import r19_finisher

    out = tmp_path / "campaign"
    out.mkdir()
    meta = out / "campaign_metadata.json"

    assert r19_finisher.gate_state(str(out), 0.0)[0] == "missing"

    meta.write_text(json.dumps({"diagnostics": {
        "max_rhat": 1.02, "max_rank_rhat": 1.03, "min_ess": 900.0}}))
    assert r19_finisher.gate_state(str(out), 0.0)[0] == "passed"
    # written BEFORE the campaign started -> a leftover from a previous
    # run, not evidence about this one
    assert r19_finisher.gate_state(
        str(out), time.time() + 60)[0] == "missing"

    for bad in ({"max_rhat": 1.2, "max_rank_rhat": 1.03, "min_ess": 900.0},
                {"max_rhat": 1.02, "max_rank_rhat": 1.06, "min_ess": 900.0},
                {"max_rhat": 1.02, "max_rank_rhat": 1.03, "min_ess": 10.0},
                {}):
        meta.write_text(json.dumps({"diagnostics": bad}))
        verdict, _ = r19_finisher.gate_state(str(out), 0.0)
        assert verdict == "failed", bad

    meta.write_text("not json")
    assert r19_finisher.gate_state(str(out), 0.0)[0] == "missing"

"""The committed externally-validated (ENE-COVID-consistent) calibration.

``results/spain2020_serovalid/`` ships the round-3 bound-sensitivity finding
as a usable artifact (VERDICT r3 item 3): variant-C relaxed bounds (the
reference's severity floors / 10, seed cap lifted — measured in
results/sero_force_profile.json to be what forces the 20x ENE-COVID miss)
plus the ENE-COVID day-64 point as a constraint. Reference check being
satisfied: ``src/model/PostCalibrationAnalyser.cpp:289-299`` (day-64
seroprevalence 4.8% [4.3, 5.4]).

These tests make the committed artifact carry its own evidence: the bounds
file must parse in the reference's format and derive from the reference's
bounds exactly as documented, the calibrated parameters must live inside the
relaxed box (and OUTSIDE the reference's — relaxation must matter), and the
recorded float64 Poisson log-likelihood must recompute and beat the
reference-bounds MAP.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SV = os.path.join(REPO, "results", "spain2020_serovalid")
META = os.path.join(SV, "serovalid_metadata.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(META),
    reason="serovalid artifact not built (scripts/serovalid_pipeline.py)")


@pytest.fixture(scope="module")
def meta():
    with open(META) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def relaxed_problem(meta):
    from mmidv1_tpu.calibration.param_space import ParameterSpace
    from mmidv1_tpu.data import (CalibrationData, read_param_bounds,
                                 read_params_to_calibrate,
                                 read_proposal_sigmas,
                                 read_sepaihrd_parameters)
    from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv

    cfg = os.path.join(REPO, "data", "configuration")
    data = CalibrationData.from_csv(
        os.path.join(REPO, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-12-31")
    M = read_matrix_from_csv(os.path.join(REPO, "data", "contacts.csv"), 4, 4)
    base = read_sepaihrd_parameters(os.path.join(cfg, "initial_guess.txt"), 4,
                                    N=data.population_by_age, M_baseline=M)
    names = read_params_to_calibrate(
        os.path.join(cfg, "params_to_calibrate.txt"))
    bounds = read_param_bounds(os.path.join(SV, "param_bounds_serovalid.txt"))
    sigmas = read_proposal_sigmas(os.path.join(cfg, "proposal_sigmas.txt"))
    space = ParameterSpace.create(names, bounds, sigmas, base)
    calib = read_sepaihrd_parameters(
        os.path.join(SV, "calibrated_parameters.txt"), 4,
        N=data.population_by_age, M_baseline=M)
    return space, base, calib, data, M


def test_metadata_claims(meta):
    assert meta["inside_ene_covid_ci"] is True
    lo, hi = meta["sero_target"]["ci"]
    assert lo <= meta["sero_day64"] <= hi
    # relaxing the bounds must BUY fit, not cost it (the round-3 finding)
    assert meta["delta_ll_vs_reference_bounds"] > 1000
    # honesty: the unconstrained relaxed MAP is reported too, and the
    # constraint is what holds the committed point inside the CI
    assert "unconstrained_relaxed_map" in meta
    assert meta["constrained_map"]["inside_ene_covid_ci"] is True


def test_relaxed_bounds_derive_from_reference(meta, relaxed_problem):
    """The committed bounds file = reference bounds with EXACTLY the
    documented relaxations (severity floors / div, seed cap, runup floor)."""
    from mmidv1_tpu.data import read_param_bounds

    space, *_ = relaxed_problem
    ref = read_param_bounds(
        os.path.join(REPO, "data", "configuration", "param_bounds.txt"))
    div = meta["bounds"]["severity_floor_div"]
    sev = ("p_", "h_0", "h_1", "h_2", "h_3", "icu_", "d_H_", "d_ICU_")
    relaxed_recorded = set(meta["bounds"]["relaxed_parameters"])
    relaxed_seen = set()
    for i, n in enumerate(space.names):
        lo_r, hi_r = ref[n]
        lo_s, hi_s = float(space.lower[i]), float(space.upper[i])
        exp_lo, exp_hi = lo_r, hi_r
        if n == "seed_exposed":
            exp_hi = meta["bounds"]["seed_cap"]
        elif n == "runup_days":
            exp_lo = meta["bounds"]["runup_lo"]
        elif n.startswith(sev):
            exp_lo = lo_r / div
        np.testing.assert_allclose([lo_s, hi_s], [exp_lo, exp_hi], rtol=1e-9,
                                   err_msg=n)
        if (lo_s, hi_s) != (lo_r, hi_r):
            relaxed_seen.add(n)
    assert relaxed_seen == relaxed_recorded


def test_relax_bounds_module_matches_committed_file(relaxed_problem):
    """``calibration.serovalid.relax_bounds`` (what nuts_campaign
    --serovalid samples under) must reproduce the committed
    param_bounds_serovalid.txt exactly — one derivation, two consumers."""
    from mmidv1_tpu.calibration.param_space import ParameterSpace
    from mmidv1_tpu.calibration.serovalid import relax_bounds
    from mmidv1_tpu.data import (read_param_bounds, read_params_to_calibrate,
                                 read_proposal_sigmas)

    space_file, base, *_ = relaxed_problem
    cfg = os.path.join(REPO, "data", "configuration")
    names = read_params_to_calibrate(
        os.path.join(cfg, "params_to_calibrate.txt"))
    bounds = read_param_bounds(os.path.join(cfg, "param_bounds.txt"))
    sigmas = read_proposal_sigmas(os.path.join(cfg, "proposal_sigmas.txt"))
    ref_space = ParameterSpace.create(names, bounds, sigmas, base)
    derived, relaxed_idx = relax_bounds(ref_space)
    np.testing.assert_allclose(np.asarray(derived.lower),
                               np.asarray(space_file.lower), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(derived.upper),
                               np.asarray(space_file.upper), rtol=1e-12)
    assert len(relaxed_idx) > 0


@pytest.mark.slow
def test_sero_penalty_scores_the_committed_map(relaxed_problem, meta):
    """The shared sero term evaluates the committed serovalid MAP to the
    recorded day-64 seroprevalence, and its gradient is finite (it rides
    XLA autodiff end to end — the composition nuts_campaign --serovalid
    relies on)."""
    import jax
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.objective import make_time_grid
    from mmidv1_tpu.calibration.serovalid import make_sero_penalty

    space, base, calib, data, M = relaxed_problem
    ts = make_time_grid(float(np.asarray(base.runup_days)),
                        data.n_data_points)
    pen = make_sero_penalty(space, base, data, ts, substeps=4,
                            tableau="dopri5", se=0.0028,
                            dtype=jnp.float64)
    theta = jnp.asarray(np.asarray(space.extract(calib), np.float64))
    sero = float(jax.jit(pen.sero_of)(theta))
    np.testing.assert_allclose(sero, meta["sero_day64"], rtol=5e-3)
    val, grad = jax.jit(jax.value_and_grad(pen))(theta)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    # inside the CI, the quadratic pull is small: |z| < 2 => |pen| < 2
    assert abs(float(val)) < 2.0


def test_calibrated_theta_needs_the_relaxation(relaxed_problem):
    """theta lives in the relaxed box, and at least one severity parameter
    sits BELOW the reference's floor — the relaxation is load-bearing."""
    from mmidv1_tpu.data import read_param_bounds

    space, _base, calib, *_ = relaxed_problem
    theta = np.asarray(space.extract(calib))
    lo, hi = np.asarray(space.lower), np.asarray(space.upper)
    assert (theta >= lo - 1e-9).all() and (theta <= hi + 1e-9).all()
    ref = read_param_bounds(
        os.path.join(REPO, "data", "configuration", "param_bounds.txt"))
    below = [n for n, v in zip(space.names, theta)
             if v < ref[n][0] - 1e-12]
    assert below, "no parameter uses the relaxed floors"


@pytest.mark.slow
def test_recorded_ll_recomputes_and_beats_reference_bounds(meta,
                                                           relaxed_problem):
    from mmidv1_tpu.calibration.objective import (build_objective,
                                                  make_time_grid)
    from mmidv1_tpu.calibration.param_space import REFLECT

    space, base, calib, data, _M = relaxed_problem
    ts = make_time_grid(float(np.asarray(base.runup_days)),
                        data.n_data_points)
    loglik = build_objective(space, base, data, ts, substeps=4,
                             constraint_mode=REFLECT)
    ll = float(loglik(space.extract(calib)))
    np.testing.assert_allclose(ll, meta["ll_poisson_float64"], rtol=1e-6)
    assert ll > meta["reference_bounds_map"]["ll_poisson_float64"] + 1000


def test_report_renders_serovalid_comparison():
    report = os.path.join(REPO, "results", "spain2020", "analysis",
                          "analysis_report.html")
    if not os.path.exists(report):
        pytest.skip("no committed analysis report")
    with open(report) as f:
        html = f.read()
    assert "Externally-validated calibration" in html
    assert "spain2020_serovalid" in html

"""The committed Spain-2020 calibration artifact is checkable evidence.

``results/spain2020/calibrated_parameters.txt`` was produced by
``scripts/calibrate_spain.py`` on the real TPU (see run_metadata.json). These
tests verify — in float64, against BOTH the package objective and the
independent NumPy/SciPy golden implementation — that the calibrated
parameters beat the reference's recorded best log-likelihood 1.41969205e+06
(``data/configuration/initial_guess.txt:3``), converting the round-1
commit-message claim into reproducible, committed evidence (VERDICT.md item 3).

Grid semantics: the objective grid is FIXED from the initial guess's
runup_days (reference ``main.cpp:241``); the calibrated file's own
runup_days (~15.4) is a *parameter* of the seeding, not of the grid.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "results", "spain2020", "calibrated_parameters.txt")
REFERENCE_BEST_LL = 1.41969205e+06


@pytest.fixture(scope="module")
def spain_problem():
    from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
    from mmidv1_tpu.calibration.param_space import REFLECT, ParameterSpace
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
    names = read_params_to_calibrate(os.path.join(cfg, "params_to_calibrate.txt"))
    bounds = read_param_bounds(os.path.join(cfg, "param_bounds.txt"))
    sigmas = read_proposal_sigmas(os.path.join(cfg, "proposal_sigmas.txt"))
    space = ParameterSpace.create(names, bounds, sigmas, base)
    ts = make_time_grid(float(np.asarray(base.runup_days)), data.n_data_points)
    loglik = build_objective(space, base, data, ts, substeps=4,
                             constraint_mode=REFLECT)
    calib = read_sepaihrd_parameters(ARTIFACT, 4, N=data.population_by_age,
                                     M_baseline=M)
    return space, loglik, base, calib, data, ts


def test_artifact_exists_and_roundtrips(spain_problem):
    space, _loglik, _base, calib, _data, _ts = spain_problem
    theta = np.asarray(space.extract(calib))
    assert theta.shape == (62,)
    assert np.isfinite(theta).all()
    lo, hi = np.asarray(space.lower), np.asarray(space.upper)
    assert (theta >= lo - 1e-9).all() and (theta <= hi + 1e-9).all()


def test_calibrated_params_beat_reference_ll(spain_problem):
    """Package objective, float64: calibrated theta > 1.41969205e6."""
    space, loglik, _base, calib, _data, _ts = spain_problem
    theta = space.extract(calib)
    ll = float(loglik(theta))
    assert ll > REFERENCE_BEST_LL, ll
    # and the improvement over the committed initial guess is real
    ll0 = float(loglik(space.extract(_base)))
    assert ll - ll0 > 2e5


@pytest.mark.slow
def test_calibrated_params_beat_reference_ll_independent_golden(spain_problem):
    """Triangulation: the independent NumPy/SciPy DOP853 implementation agrees
    the artifact beats the reference (guards against self-consistent bugs)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_impl import solve_golden

    from mmidv1_tpu.models import sepaihrd

    space, loglik, base, calib, data, ts = spain_problem
    theta = space.extract(calib)
    params = space.apply(base, theta)      # theta on the base (fixed) grid
    prm = {k: np.asarray(getattr(params, k)) for k in
           ("N", "beta", "beta_end_times", "beta_values", "kappa_end_times",
            "kappa_values", "a", "h_infec", "theta", "sigma", "gamma_p",
            "gamma_A", "gamma_I", "gamma_H", "gamma_ICU", "p", "h", "icu",
            "d_H", "d_ICU", "d_community", "seed_exposed", "runup_days")}
    prm["M"] = np.asarray(params.M_baseline)
    y0 = np.asarray(sepaihrd.runup_seeded_state(params, None))
    gold = solve_golden(prm, y0, ts)
    runup = int(np.searchsorted(ts, 0.0))
    cums = gold[:, [9, 10, 8]]
    inc = np.maximum(np.diff(cums, axis=0), 0.0)
    inc = np.concatenate([np.zeros_like(cums[:1]), inc])[runup:] + 1e-10
    obs = np.stack([data.new_hospitalizations, data.new_icu, data.new_deaths],
                   axis=1)
    valid = np.isfinite(obs) & (obs >= 0)
    ll_gold = float(np.sum(np.where(valid, obs * np.log(inc) - inc, 0.0)))
    assert ll_gold > REFERENCE_BEST_LL, ll_gold
    # and the two implementations agree on the value
    ll_jax = float(loglik(theta))
    np.testing.assert_allclose(ll_jax, ll_gold, rtol=2e-4)


def test_analysis_report_renders_validation_verdicts():
    """The committed HTML report must surface (1) the posterior's provenance
    and convergence status and (2) the ENE-COVID external-validation verdict,
    red/green — the two round-2 silent product gaps (VERDICT items 3/6/8).
    The miss itself is measured and explained in PARITY.md ('ENE-COVID
    seroprevalence'): the reference's own severity/seed bounds force it."""
    report = os.path.join(REPO, "results", "spain2020", "analysis",
                          "analysis_report.html")
    with open(report) as f:
        html = f.read()
    assert "Posterior provenance" in html
    assert "ENE-COVID external validation" in html
    # the verdict is rendered as exactly one of the two states
    assert ("ENE-COVID external validation: PASSES" in html) ^ \
           ("ENE-COVID external validation: FAILS" in html)
    if "ENE-COVID external validation: FAILS" in html:
        # a failing verdict must point at the measured explanation
        assert "PARITY.md" in html
        # ... and, since the bound-sensitivity probe is committed
        # (results/sero_force_profile.json), the report must be
        # self-contained: the measured "bounds force the miss" result
        # renders right under the verdict
        if os.path.exists(os.path.join(REPO, "results",
                                       "sero_force_profile.json")):
            assert "Bound sensitivity (measured)" in html
            assert "inside the ENE-COVID 95% CI" in html


def test_committed_posterior_convergence_diagnostics():
    """Once a gated campaign is promoted (refresh_artifact.py records its
    campaign_diagnostics in run_metadata.json), the committed posterior must
    meet the convergence bar: max split-R-hat AND max rank-normalized R-hat
    < 1.05 with real ESS. Skips until a campaign has been promoted — the
    promotion machinery itself enforces the gate (--require-rhat), and this
    test makes the COMMITTED artifact carry the evidence."""
    import json

    meta_path = os.path.join(REPO, "results", "spain2020",
                             "run_metadata.json")
    with open(meta_path) as f:
        meta = json.load(f)
    diag = meta.get("campaign_diagnostics")
    if not diag or "max_rank_rhat" not in diag:
        # pre-gate promotions recorded split-R-hat only (and were not
        # convergence-gated); the gated pipeline always records the
        # rank-normalized statistic too
        pytest.skip("no gated campaign promoted yet "
                    "(run scripts/tpu_autopilot.py / refresh_artifact.py)")
    assert diag["max_rhat"] < 1.05, diag
    assert diag["max_rank_rhat"] < 1.05, diag
    assert diag["min_ess"] > 400, diag

"""Data-layer tests: config readers, contact matrix, CalibrationData.

Mirrors the reference's UtilsTests suite (``tests/utils/FileUtilsTests.cpp``,
``GetCalibrationDataTests.cpp``, ``ReadContactMatrixTests.cpp``) including the
malformed-input error taxonomy, plus round-trips on the real Spain-2020 files.
"""

import os

import numpy as np
import pytest

from mmidv1_tpu.data import (CalibrationData, read_matrix_from_csv,
                             read_param_bounds, read_params_to_calibrate,
                             read_proposal_sigmas, read_sepaihrd_parameters,
                             read_sepaihrd_parameters_dict, read_settings,
                             save_calibration_results)
from mmidv1_tpu.utils import CSVReadException, DataFormatException, FileIOException

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "data", "configuration")
DATA = os.path.join(REPO, "data")


# --- real Spain-2020 files ----------------------------------------------------

def test_read_initial_guess():
    d = read_sepaihrd_parameters_dict(os.path.join(CONFIG, "initial_guess.txt"), 4)
    assert d["beta_end_times"] == [13.0, 63.0, 84.0, 111.0, 183.0, 237.0, 305.0]
    assert len(d["beta_values"]) == 7
    assert d["beta_values"][0] == pytest.approx(4.62524776e-01)
    assert d["kappa_values"][0] == 1.0
    assert d["kappa_values"][1] == pytest.approx(0.2)
    assert d["sigma"] == pytest.approx(0.3)
    assert d["runup_days"] == pytest.approx(2.05541965e+01)
    assert d["seed_exposed"] == pytest.approx(50.0)
    np.testing.assert_allclose(d["d_community"],
                               [7.74166081e-05, 0.0, 0.0, 0.0])


def test_read_bounds_sigmas_names():
    bounds = read_param_bounds(os.path.join(CONFIG, "param_bounds.txt"))
    sigmas = read_proposal_sigmas(os.path.join(CONFIG, "proposal_sigmas.txt"))
    names = read_params_to_calibrate(os.path.join(CONFIG, "params_to_calibrate.txt"))
    assert bounds["beta_1"] == (0.35, 0.9)
    assert sigmas["theta"] == pytest.approx(0.03)
    assert len(names) == 62  # the 62-parameter Spain-2020 calibration
    # every calibratable parameter has bounds and a proposal sigma
    for n in names:
        assert n in bounds, n
        assert n in sigmas, n


def test_read_settings_files():
    mcmc = read_settings(os.path.join(CONFIG, "mcmc_settings.txt"))
    assert mcmc["mcmc_iterations"] == 100000
    assert mcmc["burn_in"] == 5000
    assert mcmc["target_acceptance_rate"] == pytest.approx(0.234)
    pso = read_settings(os.path.join(CONFIG, "pso_settings.txt"))
    assert pso["topology"] == 2.0
    nuts = read_settings(os.path.join(CONFIG, "nuts_settings.txt"))
    assert nuts["nuts_max_tree_depth"] == 3


def test_read_contact_matrix():
    M = read_matrix_from_csv(os.path.join(DATA, "contacts.csv"), 4, 4)
    assert M.shape == (4, 4)
    assert M[0, 0] == pytest.approx(1.61250020311295)
    assert np.all(M > 0)


def test_calibration_data_from_csv():
    data = CalibrationData.from_csv(os.path.join(DATA, "processed", "processed_data.csv"),
                                    "2020-03-01", "2020-12-31")
    assert data.n_data_points == 306
    assert data.num_age_classes == 4
    np.testing.assert_allclose(data.population_by_age,
                               [14075720, 20948387, 9032069, 2880884])
    assert data.dates[0] == "2020-03-01"
    assert data.dates[-1] == "2020-12-31"
    # cumulative series must be monotone non-decreasing
    assert (np.diff(data.cumulative_deaths, axis=0) >= 0).all()


def test_calibration_data_initial_state_matches_params():
    data = CalibrationData.from_csv(os.path.join(DATA, "processed", "processed_data.csv"),
                                    "2020-03-01", "2020-12-31")
    params = read_sepaihrd_parameters(os.path.join(CONFIG, "initial_guess.txt"), 4)
    y0 = np.asarray(data.initial_sepaihrd_state(
        sigma=float(params.sigma), gamma_p=float(params.gamma_p),
        gamma_A=float(params.gamma_A), gamma_I=float(params.gamma_I),
        p=np.asarray(params.p), h=np.asarray(params.h)))
    assert y0.shape == (11, 4)
    np.testing.assert_allclose(y0[:9].sum(axis=0), data.population_by_age, rtol=1e-12)
    assert (y0 >= 0).all()


# --- error taxonomy -----------------------------------------------------------

def test_contact_matrix_errors(tmp_path):
    with pytest.raises(CSVReadException):
        read_matrix_from_csv(str(tmp_path / "missing.csv"), 2, 2)

    p = tmp_path / "short.csv"
    p.write_text("// comment\n1.0,2.0\n")
    with pytest.raises(CSVReadException, match="NotEnoughRows"):
        read_matrix_from_csv(str(p), 2, 2)

    p = tmp_path / "narrow.csv"
    p.write_text("1.0\n2.0,3.0\n")
    with pytest.raises(CSVReadException, match="NotEnoughColumns"):
        read_matrix_from_csv(str(p), 2, 2)

    p = tmp_path / "bad.csv"
    p.write_text("1.0,x\n2.0,3.0\n")
    with pytest.raises(CSVReadException, match="InvalidNumberFormat"):
        read_matrix_from_csv(str(p), 2, 2)


def test_config_reader_errors(tmp_path):
    p = tmp_path / "bounds.txt"
    p.write_text("beta 0.1\n")  # missing upper bound
    with pytest.raises(DataFormatException):
        read_param_bounds(str(p))

    p.write_text("beta 0.1 0.9 extra\n")
    with pytest.raises(DataFormatException):
        read_param_bounds(str(p))

    with pytest.raises(FileIOException):
        read_proposal_sigmas(str(tmp_path / "nope.txt"))

    p = tmp_path / "guess.txt"
    p.write_text("p 0.1 0.2\n")  # wrong age-vector length for 4 classes
    with pytest.raises(DataFormatException):
        read_sepaihrd_parameters_dict(str(p), 4)


def test_save_calibration_results_roundtrip(tmp_path):
    """saveCalibrationResults output must re-load via readSEPAIHRDParameters
    (the reference's manual checkpoint/resume path)."""
    params = read_sepaihrd_parameters(os.path.join(CONFIG, "initial_guess.txt"), 4)
    out = str(tmp_path / "calibrated_params.txt")
    save_calibration_results(out, params, ["beta_1", "p_0", "theta"], 1.4196e6)
    d = read_sepaihrd_parameters_dict(out, 4)
    np.testing.assert_allclose(d["beta_values"], np.asarray(params.beta_values))
    np.testing.assert_allclose(d["kappa_values"], np.asarray(params.kappa_values))
    np.testing.assert_allclose(d["p"], np.asarray(params.p))
    assert d["theta"] == pytest.approx(float(params.theta))
    assert d["runup_days"] == pytest.approx(float(params.runup_days))
    # the [C] markers must appear for calibrated names
    text = open(out).read()
    assert "beta_1 " in text and "# [C]" in text


# --- synthetic constructor ----------------------------------------------------

def test_from_arrays_cumulative_reconstruction():
    rng = np.random.default_rng(42)
    T, A = 10, 4
    new_c = rng.poisson(5.0, (T, A)).astype(float)
    new_h = rng.poisson(2.0, (T, A)).astype(float)
    new_i = rng.poisson(1.0, (T, A)).astype(float)
    new_d = rng.poisson(0.5, (T, A)).astype(float)
    init_row = np.array([3.0, 1.0, 2.0, 0.0])
    data = CalibrationData.from_arrays(
        new_confirmed=new_c, new_hospitalizations=new_h, new_icu=new_i,
        new_deaths=new_d, population_by_age=[1e6] * 4,
        initial_cumulative_confirmed=init_row)
    np.testing.assert_allclose(data.cumulative_confirmed[0], init_row)
    # cum[i] = cum[i-1] + new[i-1]  (reference GetCalibrationData.cpp:68-71)
    np.testing.assert_allclose(data.cumulative_confirmed[3],
                               init_row + new_c[:3].sum(axis=0))
    assert data.dates[0] == "mock_date_0"

    streams = data.observed_streams()
    assert streams.shape == (3, T, A)
    np.testing.assert_allclose(streams[0], new_h)


def test_from_arrays_validation():
    with pytest.raises(DataFormatException):
        CalibrationData.from_arrays(
            new_confirmed=np.zeros((5, 4)), new_hospitalizations=np.zeros((5, 3)),
            new_icu=np.zeros((5, 4)), new_deaths=np.zeros((5, 4)),
            population_by_age=[1e6] * 4)


def test_schedule_index_zero_skipped_with_warning(tmp_path):
    """A stray 1-based-violating beta_0 line must be SKIPPED (reference
    leniency), not written to dense[-1] where it would silently overwrite
    the last schedule value."""
    src = os.path.join(DATA, "configuration", "initial_guess.txt")
    text = open(src).read()
    p = tmp_path / "guess.txt"
    p.write_text(text + "\nbeta_0 99.0\nkappa_0 77.0\n")
    ref = read_sepaihrd_parameters(src, 4, N=[1e6] * 4,
                                   M_baseline=np.ones((4, 4)))
    got = read_sepaihrd_parameters(str(p), 4, N=[1e6] * 4,
                                   M_baseline=np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(got.beta_values),
                                  np.asarray(ref.beta_values))
    np.testing.assert_array_equal(np.asarray(got.kappa_values),
                                  np.asarray(ref.kappa_values))

"""Native C++ IO layer: build, parity with Python fallbacks, error taxonomy."""

import os

import numpy as np
import pytest

from mmidv1_tpu.utils import native
from mmidv1_tpu.utils.exceptions import CSVReadException

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_native_matrix_read_matches_python():
    from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv

    path = os.path.join(REPO, "data", "contacts.csv")
    a = native.read_csv_matrix(path, 4, 4)
    b = read_matrix_from_csv(path, 4, 4)
    np.testing.assert_array_equal(a, b)


@needs_native
def test_native_matrix_errors(tmp_path):
    f = tmp_path / "m.csv"
    f.write_text("// comment\n1,2\n3,4\n")
    np.testing.assert_array_equal(native.read_csv_matrix(str(f), 2, 2),
                                  [[1, 2], [3, 4]])
    with pytest.raises(CSVReadException):
        native.read_csv_matrix(str(tmp_path / "missing.csv"), 2, 2)
    with pytest.raises(CSVReadException):
        native.read_csv_matrix(str(f), 3, 2)     # not enough rows
    with pytest.raises(CSVReadException):
        native.read_csv_matrix(str(f), 2, 3)     # not enough columns
    g = tmp_path / "bad.csv"
    g.write_text("1,x\n3,4\n")
    with pytest.raises(CSVReadException):
        native.read_csv_matrix(str(g), 2, 2)


@needs_native
def test_native_table_read(tmp_path):
    f = tmp_path / "t.csv"
    f.write_text("date,a,b,c\n2020-01-01,1,2,3\n2020-01-02,4,,x\n")
    out = native.read_csv_table(str(f), [1, 3], skip_header=1)
    assert out.shape == (2, 2)
    np.testing.assert_array_equal(out[0], [1.0, 3.0])
    assert out[1, 0] == 4.0 and np.isnan(out[1, 1])


def test_calibration_data_native_matches_fallback(monkeypatch):
    """from_csv produces identical matrices with and without the native path."""
    from mmidv1_tpu.data import CalibrationData

    path = os.path.join(REPO, "data", "processed", "processed_data.csv")
    with_native = CalibrationData.from_csv(path, "2020-03-01", "2020-06-30")
    monkeypatch.setattr(native, "read_csv_table", lambda *a, **k: None)
    without = CalibrationData.from_csv(path, "2020-03-01", "2020-06-30")
    for field in ("new_confirmed", "new_deaths", "new_hospitalizations",
                  "new_icu", "cumulative_confirmed", "cumulative_deaths",
                  "population_by_age"):
        np.testing.assert_array_equal(getattr(with_native, field),
                                      getattr(without, field), err_msg=field)


def test_trace_writer_native_matches_fallback(tmp_path, monkeypatch):
    from mmidv1_tpu.utils.checkpoint import write_posterior_trace

    rng = np.random.default_rng(0)
    samples = rng.normal(size=(50, 3))
    logps = rng.normal(size=(50,))
    p1 = tmp_path / "native.csv"
    p2 = tmp_path / "python.csv"
    write_posterior_trace(str(p1), samples, logps, ["a", "b", "c"])
    monkeypatch.setattr(native, "write_trace_csv", lambda *a, **k: False)
    write_posterior_trace(str(p2), samples, logps, ["a", "b", "c"])
    assert p1.read_text() == p2.read_text()


def test_calibration_data_out_of_range_malformed_rows_ignored(tmp_path):
    """A malformed cell in a row OUTSIDE [start_date, end_date] must not
    fail the load (the native bulk parse reads every row; its error must
    fall back to the range-limited Python path), while a malformed cell in
    a selected row still raises the data-format taxonomy."""
    from mmidv1_tpu.data import CalibrationData
    from mmidv1_tpu.utils import DataFormatException

    path = os.path.join(REPO, "data", "processed", "processed_data.csv")
    with open(path) as f:
        lines = f.read().splitlines()
    hdr = lines[0].split(",")
    age_col = hdr.index("new_confirmed_0_30")   # a column the loader parses
    # trailing row past end_date with an empty numeric cell
    bad_tail = lines[-1].split(",")
    bad_tail[0] = "2021-06-01"
    bad_tail[age_col] = ""
    p = tmp_path / "data.csv"
    p.write_text("\n".join(lines + [",".join(bad_tail)]) + "\n")
    data = CalibrationData.from_csv(str(p), "2020-03-01", "2020-06-30")
    assert data.n_data_points > 0

    # the same malformed cell INSIDE the range must still raise
    k = next(i for i, ln in enumerate(lines) if ln.startswith("2020-04-15"))
    bad_in = lines[k].split(",")
    bad_in[age_col] = "not_a_number"
    p2 = tmp_path / "bad.csv"
    p2.write_text("\n".join(lines[:k] + [",".join(bad_in)] + lines[k + 1:])
                  + "\n")
    with pytest.raises(DataFormatException):
        CalibrationData.from_csv(str(p2), "2020-03-01", "2020-06-30")


@needs_native
def test_table_reader_skips_comment_lines(tmp_path):
    """count_csv and read_csv_table must agree on // comment lines: a
    leading comment previously consumed the skip_header budget and shifted
    every data row by one."""
    p = tmp_path / "c.csv"
    p.write_text("// provenance comment\na,b\n1,2\n3,4\n")
    t = native.read_csv_table(str(p), [0, 1], skip_header=1)
    assert t is not None
    np.testing.assert_array_equal(t, [[1.0, 2.0], [3.0, 4.0]])

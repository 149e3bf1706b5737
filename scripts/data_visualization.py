"""COVID data + SEPAIHRD dynamics visualization suite.

Functional re-design of the reference's ``scripts/DataVisualization/``
package (``CovidDataVisualizer.py:1-759`` — EDA time series, age-grouped,
stacked-area, rate and growth-rate figures over ``processed_data.csv``;
``main_data_visualization.py:1-69`` — the run-everything entry point;
``plot_sepaihrd_dynamics.py:1-160`` — per-compartment dynamics panels from
reference-format simulation CSVs). The MCMC histogram scripts
(``mcmc_sample_histograms.py``, ``visualizeparameterssample.py``) are covered
by ``scripts/post_calibration_analysis.py`` (posterior histogram + KDE
panels); this module owns the raw-data EDA and forward-dynamics figures.

Differences from the reference, by design:
- one flat module of pure figure functions + a registry, not a 760-line
  class; ``--only`` renders any subset (the reference is all-or-nothing)
- ``plot-dynamics --simulate`` runs the in-repo TPU forward model at the
  committed calibrated parameters instead of requiring a pre-written CSV
  (the reference can only read files produced by the C++ binary)
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AGE_SUFFIXES = ["0_30", "30_60", "60_80", "80_plus"]
AGE_LABELS = ["0-30", "30-60", "60-80", "80+"]
PALETTE = ["#4053d3", "#ddb310", "#b51d14", "#00beff"]
COMPARTMENTS = ["S", "E", "P", "A", "I", "H", "ICU", "R", "D"]
LINE_STYLES = ["-", "--", "-.", ":"]

plt.rcParams.update({"figure.figsize": (12, 7), "axes.titlesize": 16,
                     "axes.labelsize": 13, "axes.grid": True,
                     "grid.alpha": 0.3, "legend.fontsize": 11})


def _save(fig, out_dir: str, name: str, formats=("png",)) -> list:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for ext in formats:
        p = os.path.join(out_dir, f"{name}.{ext}")
        fig.savefig(p, dpi=150, bbox_inches="tight")
        paths.append(p)
    plt.close(fig)
    return paths


def load_processed(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, parse_dates=["date"])
    return df.set_index("date").sort_index()


def _roll(s: pd.Series, window: int | None) -> pd.Series:
    return s.rolling(window, min_periods=1).mean() if window else s


def safe_divide(num: pd.Series, den: pd.Series, scale: float = 1.0):
    """NaN where the denominator vanishes (``CovidDataVisualizer.py:139``)."""
    den = den.replace(0, np.nan)
    return scale * num / den


def growth_rate(s: pd.Series, period: int = 7) -> pd.Series:
    """Percent change over ``period`` days of the period-rolled series
    (``CovidDataVisualizer.py:491-523``)."""
    smooth = s.rolling(period, min_periods=1).mean()
    return 100.0 * (smooth / smooth.shift(period) - 1.0)


# --- figure functions: each (df, out_dir, formats) -> list of paths --------

def fig_new_overall(df, out, fmts, rolling=7):
    paths = []
    for col, title, color in [
            ("new_confirmed", "New confirmed cases", PALETTE[0]),
            ("new_deceased", "New deaths", PALETTE[2]),
            ("new_hospitalized_patients", "New hospitalizations", PALETTE[1]),
            ("new_intensive_care_patients", "New ICU admissions", PALETTE[3])]:
        fig, ax = plt.subplots()
        ax.plot(df.index, df[col], alpha=0.25, color=color, lw=0.8)
        ax.plot(df.index, _roll(df[col], rolling), color=color, lw=2,
                label=f"{rolling}-day mean")
        ax.set_title(title)
        ax.set_ylabel("per day")
        ax.legend()
        paths += _save(fig, out, f"ts_{col}_rolled", fmts)
    return paths


def fig_cumulative_overall(df, out, fmts, rolling=None):
    paths = []
    for col, title in [
            ("cumulative_confirmed", "Cumulative confirmed cases"),
            ("cumulative_deceased", "Cumulative deaths"),
            ("cumulative_hospitalized_patients", "Cumulative hospitalizations"),
            ("cumulative_intensive_care_patients", "Cumulative ICU admissions")]:
        fig, ax = plt.subplots()
        ax.plot(df.index, df[col], color=PALETTE[0], lw=2)
        ax.set_title(title)
        ax.set_ylabel("cumulative")
        paths += _save(fig, out, f"ts_{col}", fmts)
    return paths


def fig_age_grouped(df, out, fmts, rolling=7):
    """Per-age-band overlay + stacked-area versions of every age-stratified
    metric (``CovidDataVisualizer.py:302-454``)."""
    paths = []
    bases = ["new_confirmed", "new_deceased", "new_hospitalized_patients",
             "new_intensive_care_patients", "cumulative_confirmed",
             "cumulative_deceased", "cumulative_hospitalized_patients",
             "cumulative_intensive_care_patients"]
    for base in bases:
        cols = [f"{base}_{s}" for s in AGE_SUFFIXES if f"{base}_{s}" in df]
        if not cols:
            continue
        win = rolling if base.startswith("new") else None
        fig, ax = plt.subplots()
        for c, lab, color, ls in zip(cols, AGE_LABELS, PALETTE, LINE_STYLES):
            ax.plot(df.index, _roll(df[c], win), label=lab, color=color,
                    linestyle=ls, lw=1.8)
        ax.set_title(f"{base.replace('_', ' ')} by age group")
        ax.legend(title="age")
        paths += _save(fig, out, f"grouped_{base}_by_age", fmts)

        fig, ax = plt.subplots()
        ax.stackplot(df.index, *[_roll(df[c], win).clip(lower=0)
                                 for c in cols],
                     labels=AGE_LABELS, colors=PALETTE, alpha=0.85)
        ax.set_title(f"{base.replace('_', ' ')} by age group (stacked)")
        ax.legend(loc="upper left", title="age")
        paths += _save(fig, out, f"stacked_{base}_by_age", fmts)
    return paths


def fig_rates(df, out, fmts, rolling=28):
    """CFR / hospitalization / ICU rates, overall + per age
    (``CovidDataVisualizer.py:455-490`` rate definitions)."""
    paths = []
    fig, ax = plt.subplots()
    ax.plot(df.index,
            _roll(safe_divide(df["cumulative_deceased"],
                              df["cumulative_confirmed"], 100), rolling),
            color=PALETTE[2], lw=2)
    ax.set_title("Case fatality rate, cumulative (%)")
    ax.set_ylabel("%")
    paths += _save(fig, out, "ts_cfr_overall_cumulative", fmts)

    fig, ax = plt.subplots()
    for s, lab, color, ls in zip(AGE_SUFFIXES, AGE_LABELS, PALETTE,
                                 LINE_STYLES):
        ax.plot(df.index,
                _roll(safe_divide(df[f"cumulative_deceased_{s}"],
                                  df[f"cumulative_confirmed_{s}"], 100),
                      rolling),
                label=lab, color=color, linestyle=ls, lw=1.8)
    ax.set_title("Case fatality rate by age, cumulative (%)")
    ax.set_ylabel("%")
    ax.legend(title="age")
    paths += _save(fig, out, "ts_cfr_by_age_cumulative", fmts)

    for num, den, name, title in [
            ("new_hospitalized_patients", "new_confirmed",
             "hosp_rate_vs_confirmed", "Hospitalizations per confirmed (%)"),
            ("new_intensive_care_patients", "new_hospitalized_patients",
             "icu_rate_vs_hospitalized", "ICU per hospitalization (%)")]:
        fig, ax = plt.subplots()
        ax.plot(df.index, _roll(safe_divide(df[num], df[den], 100), rolling),
                color=PALETTE[1], lw=2)
        ax.set_title(title)
        ax.set_ylabel("%")
        paths += _save(fig, out, f"ts_{name}", fmts)
    return paths


def fig_growth(df, out, fmts, rolling=7):
    paths = []
    fig, ax = plt.subplots()
    for col, lab, color in [
            ("new_confirmed", "cases", PALETTE[0]),
            ("new_deceased", "deaths", PALETTE[2]),
            ("new_hospitalized_patients", "hosp", PALETTE[1]),
            ("new_intensive_care_patients", "ICU", PALETTE[3])]:
        ax.plot(df.index, growth_rate(df[col], rolling).clip(-100, 200),
                label=lab, color=color, lw=1.6)
    ax.axhline(0, color="black", lw=0.8)
    ax.set_title(f"{rolling}-day growth rate (%)")
    ax.set_ylabel("%")
    ax.legend()
    return paths + _save(fig, out, "ts_growth_rates", fmts)


def fig_dashboard(df, out, fmts, rolling=7):
    """2x2 summary dashboard (the reference's final summary figure)."""
    fig, axes = plt.subplots(2, 2, figsize=(16, 10))
    panels = [("new_confirmed", "New cases"),
              ("new_deceased", "New deaths"),
              ("new_hospitalized_patients", "New hospitalizations"),
              ("new_intensive_care_patients", "New ICU admissions")]
    for ax, (col, title), color in zip(axes.ravel(), panels, PALETTE):
        ax.plot(df.index, df[col], alpha=0.25, color=color, lw=0.7)
        ax.plot(df.index, _roll(df[col], rolling), color=color, lw=2)
        ax.set_title(title)
    fig.suptitle("COVID-19 Spain — overview", fontsize=18)
    return _save(fig, out, "dashboard_overview", fmts)


FIGURES = {"new": fig_new_overall, "cumulative": fig_cumulative_overall,
           "age": fig_age_grouped, "rates": fig_rates, "growth": fig_growth,
           "dashboard": fig_dashboard}


# --- SEPAIHRD dynamics (plot_sepaihrd_dynamics.py equivalent) --------------

def plot_dynamics_frame(df: pd.DataFrame, out_dir: str, formats=("png",),
                        n_ages: int = 4, prefix: str = "",
                        log_scale: bool = False) -> list:
    """Per-compartment panels (each age band + black dashed total) from a
    reference-format ``Time,S0..CumICU3`` frame
    (``plot_sepaihrd_dynamics.py:19-117``; the frame is what
    ``mmidv1_tpu.models.results.save_results_csv`` writes)."""
    paths = []
    t = df["Time"]
    for comp in COMPARTMENTS:
        cols = [f"{comp}{i}" for i in range(n_ages) if f"{comp}{i}" in df]
        if not cols:
            continue
        fig, ax = plt.subplots()
        for i, c in enumerate(cols):
            ax.plot(t, df[c], label=f"{comp} age {AGE_LABELS[i]}",
                    color=PALETTE[i % 4], linestyle=LINE_STYLES[i % 4],
                    lw=1.5, alpha=0.85)
        ax.plot(t, df[cols].sum(axis=1), label=f"total {comp}",
                color="black", linestyle="--", lw=2.2)
        if log_scale:
            ax.set_yscale("log")
        ax.set_title(f"{prefix}{comp} dynamics")
        ax.set_xlabel("day")
        ax.set_ylabel("individuals")
        ax.legend()
        name = f"{prefix}sepaihrd_{comp}{'_log' if log_scale else ''}"
        paths += _save(fig, out_dir, name, formats)
    return paths


def simulate_frame(calibrated: str | None = None, days: int | None = None,
                   substeps: int = 4) -> pd.DataFrame:
    """Run the in-repo forward model and return a reference-format frame.

    Uses the committed Spain-2020 pipeline inputs; ``calibrated`` optionally
    points at a ``calibrated_parameters.txt`` whose values overwrite the
    initial guess (reference behaviour: the C++ binary writes the simulation
    CSV after calibration; here the TPU model produces it directly).
    """
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.objective import make_time_grid
    from mmidv1_tpu.data import CalibrationData, read_sepaihrd_parameters
    from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv
    from mmidv1_tpu.models import sepaihrd

    cfg_dir = os.path.join(REPO, "data", "configuration")
    data = CalibrationData.from_csv(
        os.path.join(REPO, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-12-31")
    M = read_matrix_from_csv(os.path.join(REPO, "data", "contacts.csv"), 4, 4)
    # calibrated_parameters.txt round-trips through the same reader as the
    # initial guess (config_io docstring)
    src = calibrated or os.path.join(cfg_dir, "initial_guess.txt")
    params = read_sepaihrd_parameters(
        src, 4, N=data.population_by_age, M_baseline=M, dtype=jnp.float32)
    # default: the FULL observation window (306 days for 2020-03-01..
    # 2020-12-31) — a hard-coded day count silently truncated 2020-12-31
    n_days = data.n_data_points if days is None else min(days,
                                                         data.n_data_points)
    ts = make_time_grid(float(np.asarray(params.runup_days)), n_days)
    y0 = sepaihrd.runup_seeded_state(params, None)
    traj = np.asarray(sepaihrd.solve(params, y0, ts, method="fixed",
                                     substeps=substeps))
    obs = ts >= 0
    flat = traj[obs].reshape(int(obs.sum()), -1)
    frame = pd.DataFrame(flat, columns=sepaihrd.state_names(4))
    frame.insert(0, "Time", np.asarray(ts)[obs])
    return frame


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    eda = sub.add_parser("eda", help="EDA figure suite over processed data")
    eda.add_argument("--input", default=os.path.join(
        REPO, "data", "processed", "processed_data.csv"))
    eda.add_argument("--out", default=os.path.join(
        REPO, "data", "visualizations"))
    eda.add_argument("--only", nargs="*", choices=sorted(FIGURES),
                     default=None, help="subset of figure groups")
    eda.add_argument("--formats", nargs="*", default=["png"])
    eda.add_argument("--rolling", type=int, default=7)

    dyn = sub.add_parser("plot-dynamics",
                         help="per-compartment SEPAIHRD dynamics panels")
    dyn.add_argument("--csv", default=None,
                     help="reference-format simulation CSV; omit with "
                          "--simulate to run the in-repo model")
    dyn.add_argument("--simulate", action="store_true")
    dyn.add_argument("--calibrated", default=None,
                     help="calibrated_parameters.txt to load (with "
                          "--simulate)")
    dyn.add_argument("--out", default=os.path.join(
        REPO, "data", "visualizations", "dynamics"))
    dyn.add_argument("--prefix", default="")
    dyn.add_argument("--log", action="store_true")
    dyn.add_argument("--formats", nargs="*", default=["png"])
    args = p.parse_args(argv)

    if args.cmd == "eda":
        df = load_processed(args.input)
        groups = args.only or sorted(FIGURES)
        n = 0
        for g in groups:
            made = FIGURES[g](df, args.out, tuple(args.formats),
                              rolling=args.rolling)
            print(f"{g}: {len(made)} files")
            n += len(made)
        print(f"wrote {n} figures -> {args.out}")
        return 0

    if args.csv:
        frame = pd.read_csv(args.csv)
        if "Time" not in frame.columns:
            print(f"Error: 'Time' column not found in {args.csv}")
            return 1
    elif args.simulate:
        frame = simulate_frame(calibrated=args.calibrated)
    else:
        print("Error: pass --csv or --simulate")
        return 1
    made = plot_dynamics_frame(frame, args.out, tuple(args.formats),
                               prefix=args.prefix, log_scale=args.log)
    print(f"wrote {len(made)} figures -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

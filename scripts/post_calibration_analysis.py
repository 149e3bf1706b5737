#!/usr/bin/env python
"""Post-calibration figures + HTML report from the analysis output tree.

Re-design of the reference's plotting layer
(``scripts/model/PostCalibrationAnalysis.py``, 598 lines): reads the CSV tree
written by :func:`mmidv1_tpu.analysis.generate_full_report` (identical format
to the reference's ``AnalysisWriter`` output, so it consumes either
implementation's results) and renders:

- posterior-predictive bands vs observations per stream & age group
- parameter posterior histograms
- Rt trajectory with credible bands (+ Spanish NPI period shading,
  reference :32-39)
- seroprevalence trajectory vs the ENE-COVID day-64 point
- scenario comparison table
- ``analysis_report.html`` linking everything

Usage: python scripts/post_calibration_analysis.py [--input data/output]
           [--figures <input>/figures]
"""

import argparse
import html
import os
import sys

import numpy as np
import pandas as pd

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AGE_LABELS = ["0-30", "30-60", "60-80", "80+"]
# Spanish NPI periods (reference PostCalibrationAnalysis.py:32-39)
NPI_PERIODS = [(13, 63, "#d62728", "lockdown"), (63, 84, "#ff7f0e", "phase 1"),
               (84, 111, "#ffdd57", "de-escalation"),
               (183, 237, "#9edae5", "new normal")]

STREAMS = ["daily_hospitalizations", "daily_icu_admissions", "daily_deaths",
           "cumulative_hospitalizations", "cumulative_icu_admissions",
           "cumulative_deaths"]


def _read(path):
    return pd.read_csv(path) if os.path.exists(path) else None


def plot_ppc(input_dir, fig_dir, figures):
    ppc_dir = os.path.join(input_dir, "posterior_predictive")
    for stream in STREAMS:
        med = _read(os.path.join(ppc_dir, f"{stream}_median.csv"))
        if med is None:
            continue
        lo95 = _read(os.path.join(ppc_dir, f"{stream}_lower95.csv"))
        hi95 = _read(os.path.join(ppc_dir, f"{stream}_upper95.csv"))
        obs = _read(os.path.join(ppc_dir, f"{stream}_observed.csv"))
        ages = [c for c in med.columns if c != "time"]
        fig, axes = plt.subplots(2, 2, figsize=(11, 7), sharex=True)
        for a, ax in zip(range(len(ages)), axes.ravel()):
            col = ages[a]
            t = med["time"]
            if lo95 is not None and hi95 is not None:
                ax.fill_between(t, lo95[col], hi95[col], alpha=0.3,
                                color="#1f77b4", label="95% CrI")
            ax.plot(t, med[col], color="#1f77b4", lw=1.5, label="median")
            if obs is not None and len(obs) == len(med):
                ax.plot(t, obs[col], "k.", ms=2.5, alpha=0.6, label="observed")
            ax.set_title(f"age {AGE_LABELS[a] if a < 4 else col}")
            if a == 0:
                ax.legend(fontsize=8)
        fig.suptitle(stream.replace("_", " "))
        fig.supxlabel("day")
        out = os.path.join(fig_dir, f"ppc_{stream}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        plt.close(fig)
        figures.append((f"PPC: {stream.replace('_', ' ')}",
                        os.path.relpath(out, input_dir)))


def plot_posteriors(input_dir, fig_dir, figures):
    samples = _read(os.path.join(input_dir, "parameter_posteriors",
                                 "posterior_samples.csv"))
    if samples is None:
        return
    names = [c for c in samples.columns if c != "sample_index"]
    n = len(names)
    cols = 6
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.4 * cols, 1.9 * rows))
    for ax, name in zip(np.ravel(axes), names):
        ax.hist(samples[name], bins=30, color="#1f77b4", alpha=0.8)
        ax.set_title(name, fontsize=7)
        ax.tick_params(labelsize=6)
        ax.set_yticks([])
    for ax in np.ravel(axes)[n:]:
        ax.axis("off")
    out = os.path.join(fig_dir, "parameter_posteriors.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    figures.append(("Parameter posteriors", os.path.relpath(out, input_dir)))


def plot_trajectory(input_dir, fig_dir, figures, rel, title, fname,
                    extra=None):
    df = _read(os.path.join(input_dir, rel))
    if df is None:
        return
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.fill_between(df["time"], df["q025"], df["q975"], alpha=0.25,
                    color="#1f77b4", label="95% CrI")
    ax.fill_between(df["time"], df["q05"], df["q95"], alpha=0.35,
                    color="#1f77b4", label="90% CrI")
    ax.plot(df["time"], df["median"], color="#1f77b4", lw=1.6, label="median")
    for t0, t1, color, label in NPI_PERIODS:
        if t0 < df["time"].max():
            ax.axvspan(t0, min(t1, df["time"].max()), alpha=0.08, color=color,
                       label=label)
    if extra:
        extra(ax)
    ax.set_xlabel("day")
    ax.set_title(title)
    ax.legend(fontsize=8, ncol=3)
    out = os.path.join(fig_dir, fname)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    figures.append((title, os.path.relpath(out, input_dir)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=os.path.join(REPO, "data", "output"))
    p.add_argument("--figures", default=None)
    args = p.parse_args(argv)

    input_dir = args.input
    fig_dir = args.figures or os.path.join(input_dir, "figures")
    os.makedirs(fig_dir, exist_ok=True)
    figures = []

    plot_ppc(input_dir, fig_dir, figures)
    plot_posteriors(input_dir, fig_dir, figures)
    plot_trajectory(input_dir, fig_dir, figures,
                    os.path.join("rt_trajectories",
                                 "Rt_aggregated_with_uncertainty.csv"),
                    "Effective reproduction number Rt", "rt_trajectory.png",
                    extra=lambda ax: ax.axhline(1.0, color="k", ls="--",
                                                lw=0.8))

    def ene_overlay(ax):
        ene = _read(os.path.join(input_dir, "seroprevalence",
                                 "ene_covid_validation.csv"))
        if ene is not None:
            row = ene[ene["source"] == "ENE_COVID"]
            if len(row):
                r = row.iloc[0]
                ax.errorbar([r["target_day"]], [r["median_seroprevalence"]],
                            yerr=[[r["median_seroprevalence"] - r["lower_95ci"]],
                                  [r["upper_95ci"] - r["median_seroprevalence"]]],
                            fmt="rs", capsize=4, label="ENE-COVID")

    plot_trajectory(input_dir, fig_dir, figures,
                    os.path.join("seroprevalence",
                                 "seroprevalence_trajectory.csv"),
                    "Seroprevalence", "seroprevalence.png", extra=ene_overlay)

    # ---- HTML report -------------------------------------------------------
    summary = _read(os.path.join(input_dir, "mcmc_aggregated",
                                 "metrics_summary.csv"))
    scenarios = _read(os.path.join(input_dir, "scenarios",
                                   "scenario_comparison.csv"))
    parts = ["<html><head><title>Post-calibration analysis</title>",
             "<style>body{font-family:sans-serif;max-width:1100px;margin:auto}"
             "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
             "padding:4px 8px;font-size:13px}img{max-width:100%}</style>",
             "</head><body><h1>Post-calibration analysis report</h1>"]
    if summary is not None:
        parts.append("<h2>Aggregated metrics</h2>")
        parts.append(summary.to_html(index=False, float_format="%.5g"))
    if scenarios is not None:
        parts.append("<h2>Scenario comparison</h2>")
        parts.append(scenarios.to_html(index=False, float_format="%.5g"))
    parts.append("<h2>Figures</h2>")
    for title, rel in figures:
        parts.append(f"<h3>{html.escape(title)}</h3>"
                     f"<img src='{html.escape(rel)}'>")
    parts.append("</body></html>")
    report = os.path.join(input_dir, "analysis_report.html")
    with open(report, "w") as f:
        f.write("\n".join(parts))
    print(f"report: {report} ({len(figures)} figures)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Calibrated-vs-observed overlay for the age-SIR calibration demo.

Re-design of the reference's
``scripts/age-structured-calibration/compare_calibration_and_observed.py``
(:1-111): reads the observed new-confirmed streams from
``data/processed/processed_data.csv`` and the best-fit simulated I
trajectories written by ``mmidv1_tpu.cli.sir_calibration_demo``
(``data/calibration_output/simulated_incidence_best_fit.csv``), then renders

- ``calibration_comparison.png`` — 2x2 observed-vs-simulated panels per age
- ``simulated_cases.png`` — all simulated trajectories + total on one axis

Usage: python scripts/compare_calibration_and_observed.py
           [--observed PATH] [--simulated PATH] [--output DIR]
"""

import argparse
import os
import sys

import numpy as np
import pandas as pd

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AGE_KEYS = ["0_30", "30_60", "60_80", "80_plus"]
AGE_LABELS = ["0-30", "30-60", "60-80", "80+"]
COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728"]


def plot_comparison(observed, simulated, out_dir):
    t = np.arange(len(observed))
    fig, axes = plt.subplots(2, 2, figsize=(13, 8))
    for ax, key, label, color in zip(axes.ravel(), AGE_KEYS, AGE_LABELS,
                                     COLORS):
        obs_col = f"new_confirmed_{key}"
        sim_col = f"simulated_I_{key}"
        if obs_col in observed.columns:
            ax.scatter(t, observed[obs_col], alpha=0.5, color=color, s=18,
                       label="Observed")
        if sim_col in simulated.columns:
            ax.plot(np.arange(len(simulated)), simulated[sim_col],
                    color=color, ls="--", label="Simulated")
        ax.set_title(f"Age Group: {label}")
        ax.set_xlabel("Time (days)")
        ax.set_ylabel("New Confirmed Cases")
        ax.legend(fontsize=9)
    fig.tight_layout()
    out = os.path.join(out_dir, "calibration_comparison.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_simulated_only(simulated, out_dir):
    t = np.arange(len(simulated))
    fig, ax = plt.subplots(figsize=(11, 6.5))
    sim_cols = []
    for key, label, color in zip(AGE_KEYS, AGE_LABELS, COLORS):
        col = f"simulated_I_{key}"
        if col in simulated.columns:
            ax.plot(t, simulated[col], color=color, label=f"Age {label}")
            sim_cols.append(col)
    if sim_cols:
        ax.plot(t, simulated[sim_cols].sum(axis=1), "k--", lw=2,
                label="Total")
    ax.set_title("Simulated Cases by Age Group")
    ax.set_xlabel("Time (days)")
    ax.set_ylabel("Number of Cases")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    out = os.path.join(out_dir, "simulated_cases.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--observed",
                   default=os.path.join(REPO, "data", "processed",
                                        "processed_data.csv"))
    p.add_argument("--simulated",
                   default=os.path.join(REPO, "data", "calibration_output",
                                        "simulated_incidence_best_fit.csv"))
    p.add_argument("--output",
                   default=os.path.join(REPO, "data", "visualizations"))
    p.add_argument("--start-date", default="2020-03-01",
                   help="first observed date of the calibration window (the "
                        "demo's window); simulated day 0 = this date, so "
                        "the observed rows are sliced to it — without the "
                        "slice the two curves sit on day axes offset by the "
                        "pre-window rows of the processed CSV")
    p.add_argument("--end-date", default="2020-12-31")
    args = p.parse_args(argv)

    if not os.path.exists(args.simulated):
        print(f"simulated file not found: {args.simulated} "
              "(run mmidv1_tpu.cli.sir_calibration_demo first)",
              file=sys.stderr)
        return 1
    observed = pd.read_csv(args.observed)
    if "date" in observed.columns:
        observed = observed[(observed["date"] >= args.start_date)
                            & (observed["date"] <= args.end_date)]
        observed = observed.reset_index(drop=True)
    simulated = pd.read_csv(args.simulated)
    os.makedirs(args.output, exist_ok=True)
    outs = [plot_comparison(observed, simulated, args.output),
            plot_simulated_only(simulated, args.output)]
    for o in outs:
        print(f"wrote {o}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Raw-data processor: ``data/raw/ES.csv`` -> ``data/processed/processed_data.csv``.

Re-design of the reference's L7 data-processing script
(``scripts/data-processing/CovidDataProcessor.py``): aggregates the Google
COVID-19 Open Data per-decade age columns into the 4 model age bands
(0_30 = ages 0-29, 30_60 = 30-59, 60_80 = 60-79, 80_plus = 80+), keeps the
national totals, and date-filters to the study window.

Usage:
    python scripts/covid_data_processor.py [--input data/raw/ES.csv]
        [--output data/processed/processed_data.csv]
        [--start 2020-03-01] [--end 2020-12-31] [--check]

``--check`` verifies the output against an existing processed file instead of
overwriting it (regression mode; tested in tests/test_scripts.py).
"""

import argparse
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NON_AGE_COLUMNS = [
    "date", "new_confirmed", "new_deceased", "cumulative_confirmed",
    "cumulative_deceased", "new_hospitalized_patients",
    "cumulative_hospitalized_patients", "new_intensive_care_patients",
    "population", "cumulative_intensive_care_patients",
]

METRIC_BASES = [
    "new_confirmed", "cumulative_confirmed", "new_deceased",
    "cumulative_deceased", "new_hospitalized_patients",
    "cumulative_hospitalized_patients", "new_intensive_care_patients",
    "cumulative_intensive_care_patients",
]

# Metric age columns are decade indices 0..8 (0-9, 10-19, ..., 80+);
# population uses named decade columns.
AGE_BANDS = {
    "0_30": list(range(0, 3)),
    "30_60": list(range(3, 6)),
    "60_80": list(range(6, 8)),
    "80_plus": [8],
}
POPULATION_BANDS = {
    "0_30": ["population_age_00_09", "population_age_10_19",
             "population_age_20_29"],
    "30_60": ["population_age_30_39", "population_age_40_49",
              "population_age_50_59"],
    "60_80": ["population_age_60_69", "population_age_70_79"],
    "80_plus": ["population_age_80_and_older"],
}


def process(input_path: str, start: str, end: str) -> pd.DataFrame:
    df = pd.read_csv(input_path)
    for required in ("country_code", "date"):
        if required not in df.columns:
            raise ValueError(f"Required column '{required}' missing.")

    dates = pd.to_datetime(df["date"])
    df = df[(dates >= start) & (dates <= end)].reset_index(drop=True)

    out = {c: df[c] for c in NON_AGE_COLUMNS if c in df.columns}
    for base in METRIC_BASES:
        for band, decades in AGE_BANDS.items():
            cols = [f"{base}_age_{i}" for i in decades if
                    f"{base}_age_{i}" in df.columns]
            if cols:
                out[f"{base}_{band}"] = (
                    df[cols].apply(pd.to_numeric, errors="coerce").sum(axis=1))
    for band, cols in POPULATION_BANDS.items():
        present = [c for c in cols if c in df.columns]
        if present:
            out[f"population_{band}"] = (
                df[present].apply(pd.to_numeric, errors="coerce").sum(axis=1))
    return pd.DataFrame(out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=os.path.join(REPO, "data", "raw", "ES.csv"))
    p.add_argument("--output",
                   default=os.path.join(REPO, "data", "processed",
                                        "processed_data.csv"))
    p.add_argument("--start", default="2020-01-01")
    p.add_argument("--end", default="2020-12-31")
    p.add_argument("--check", action="store_true",
                   help="verify against the existing output instead of writing")
    args = p.parse_args(argv)

    result = process(args.input, args.start, args.end)
    print(f"Processed {len(result)} rows x {len(result.columns)} columns")

    if args.check:
        existing = pd.read_csv(args.output)
        missing = set(existing.columns) - set(result.columns)
        if missing:
            print(f"MISMATCH: columns missing from regenerated data: {missing}")
            return 1
        merged = result[existing.columns].reset_index(drop=True)
        import numpy as np
        if len(merged) != len(existing):
            print(f"MISMATCH: {len(merged)} regenerated rows vs "
                  f"{len(existing)} committed (window --start/--end?)")
            print("CHECK FAILED")
            return 1
        non_num = [c for c in existing.columns
                   if c not in existing.select_dtypes("number").columns]
        if non_num and not merged[non_num].equals(
                existing[non_num].reset_index(drop=True)):
            print(f"MISMATCH: non-numeric columns differ: {non_num}")
            print("CHECK FAILED")
            return 1
        num = existing.select_dtypes("number").columns
        ok = np.allclose(merged[num].to_numpy(dtype=float),
                         existing[num].to_numpy(dtype=float),
                         rtol=1e-9, atol=1e-9, equal_nan=True)
        print("CHECK", "OK" if ok else "FAILED")
        return 0 if ok else 1

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    result.to_csv(args.output, index=False)
    print(f"Data aggregated and saved to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Externally-validated (ENE-COVID-consistent) Spain-2020 calibration artifact.

The round-3 investigation (scripts/sero_force_profile.py,
results/sero_force_profile.json, PARITY.md "ENE-COVID seroprevalence")
*measured* that the reference's own severity/seed lower bounds force its
day-64 seroprevalence to ~1.0% — a 20x miss of its own validation target
(4.8% [4.3, 5.4], ENE-COVID round 1; the check the reference runs in
``src/model/PostCalibrationAnalyser.cpp:289-299``) — and that relaxing
those floors 10x reaches sero 4.68% at +1,134 nats BETTER Poisson fit.

This script turns that finding into a first-class, reproducible artifact:
``results/spain2020_serovalid/`` with

  - ``param_bounds_serovalid.txt``   — the relaxed bounds in the reference's
    own ``name low high`` format (variant C of the probe: seed_exposed cap
    50 -> 50000, runup_days floor 15 -> 5, severity lower bounds / 10);
  - ``calibrated_parameters.txt``    — the MAP under those bounds with the
    ENE-COVID point treated as a real data stream (Gaussian likelihood,
    se from the survey CI), re-loadable by ``read_sepaihrd_parameters``;
  - ``serovalid_metadata.json``      — plain-Poisson LL, sero term, day-64
    sero, attack rates, and the full bounds provenance;
  - ``laplace_serovalid.npz``        — Laplace (inverse-Hessian) covariance
    at the MAP for the free (off-bound) parameters: honest local
    uncertainty until a gated posterior is run under these bounds.

Reproduce from scratch (no committed warm start):
    python scripts/serovalid_pipeline.py --cold

Default mode warm-starts from the committed probe result
(results/sero_force_profile.json variant C final theta) and polishes.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# shared with nuts_campaign --serovalid via the package module
from mmidv1_tpu.calibration.serovalid import SEVERITY_PREFIXES  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", dest="map_path",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"),
                   help="reference-bounds MAP (cold-start init + LL "
                        "comparison row)")
    p.add_argument("--probe-json",
                   default=os.path.join(REPO, "results",
                                        "sero_force_profile.json"),
                   help="warm start: variant_C final_theta from the round-3 "
                        "forcing probe")
    p.add_argument("--cold", action="store_true",
                   help="ignore --probe-json; start from the "
                        "reference-bounds MAP (full reproduction path, "
                        "slower: the optimizer must cross the severity "
                        "ridge itself)")
    p.add_argument("--laplace",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "laplace_mass.npz"))
    p.add_argument("--seed-cap", type=float, default=50000.0)
    p.add_argument("--runup-lo", type=float, default=5.0)
    p.add_argument("--severity-floor-div", type=float, default=10.0)
    p.add_argument("--sero-se", type=float, default=0.0028,
                   help="Gaussian se on the ENE-COVID point: "
                        "(5.4%% - 4.3%%) / (2 * 1.96) = 0.28%%. Used for the "
                        "survey-weighted diagnostic row only: the relaxed "
                        "ridge's Poisson gradient (~1.8e4 nats per unit "
                        "sero, measured below) overwhelms it, so the "
                        "honest-weight MAP sits near the unconstrained one")
    p.add_argument("--constraint-se", type=float, default=2e-4,
                   help="enforcement weight for the COMMITTED constrained "
                        "MAP (pull toward the ENE-COVID mean strong enough "
                        "to hold the ridge inside the CI; a Lagrangian "
                        "knob, not a survey likelihood — both are reported)")
    p.add_argument("--maxiter", type=int, default=600)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    p.add_argument("--skip-laplace", action="store_true")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "spain2020_serovalid"))
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from mmidv1_tpu.analysis.aggregate import (ENE_COVID_LOWER,
                                               ENE_COVID_MEAN,
                                               ENE_COVID_UPPER)
    from mmidv1_tpu.analysis.metrics import essential_metrics
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.data.config_io import save_calibration_results
    from mmidv1_tpu.models import sepaihrd

    pipe = load_spain_pipeline(REPO, dtype=jnp.float64)
    data, base, space0, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    ts_j = jnp.asarray(ts, jnp.float64)
    base_y0 = jnp.asarray(
        data.initial_sepaihrd_state(
            sigma=base.sigma, gamma_p=base.gamma_p, gamma_A=base.gamma_A,
            gamma_I=base.gamma_I, p=base.p, h=base.h), jnp.float64)
    names = list(space0.names)
    i_seed = names.index("seed_exposed")
    i_run = names.index("runup_days")

    # ---- the relaxed (variant C) bounds -----------------------------------
    from mmidv1_tpu.calibration.serovalid import relax_bounds
    lo0 = np.asarray(space0.lower, np.float64)
    hi0 = np.asarray(space0.upper, np.float64)
    space, relaxed = relax_bounds(
        space0, seed_cap=args.seed_cap, runup_lo=args.runup_lo,
        severity_floor_div=args.severity_floor_div)
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)

    ll_raw = build_objective(space, base, data, ts, substeps=args.substeps,
                             tableau=args.tableau, constraint_mode=REFLECT,
                             dtype=jnp.float64)

    total_pop = float(np.sum(np.asarray(data.population_by_age)))
    from mmidv1_tpu.analysis.metrics import SERO_TARGET_DAY
    t_idx = int(np.argmin(np.abs(np.asarray(ts) - SERO_TARGET_DAY)))

    def solve_traj(theta):
        params = space.apply(base, space.constrain(theta, REFLECT))
        y0, _ = sepaihrd.initial_state_for_params(params, base_y0)
        traj = sepaihrd.solve(params, y0, ts_j, method="fixed",
                              substeps=args.substeps, tableau=args.tableau)
        return params, y0, traj

    from mmidv1_tpu.calibration.serovalid import make_sero_penalty

    def sero_of(theta):
        _, _, traj = solve_traj(theta)
        return (total_pop - jnp.sum(traj[t_idx, 0])) / total_pop

    def make_joint(se):
        pen = make_sero_penalty(space, base, data, ts,
                                substeps=args.substeps,
                                tableau=args.tableau, se=se,
                                constraint_mode=REFLECT, dtype=jnp.float64)

        def joint(theta):
            # Poisson stream LL + ENE-COVID pulled with strength 1/se^2
            return ll_raw(theta) + pen(theta)
        return joint

    ll_jit = jax.jit(ll_raw)
    sero_jit = jax.jit(sero_of)

    # ---- init --------------------------------------------------------------
    prm_map = read_sepaihrd_parameters(args.map_path, 4,
                                       N=data.population_by_age,
                                       M_baseline=base.M_baseline,
                                       dtype=jnp.float64)
    theta_ref = np.asarray(space0.extract(prm_map), np.float64)
    ll_ref = float(ll_jit(jnp.asarray(theta_ref)))
    sero_ref = float(sero_jit(jnp.asarray(theta_ref)))

    th = theta_ref.copy()
    init_src = "reference-bounds MAP (cold)"
    if not args.cold and os.path.exists(args.probe_json):
        with open(args.probe_json) as f:
            probe = json.load(f)
        ft = probe.get("variant_C", {}).get("final_theta")
        if ft is not None and list(ft.keys()) == names:
            th = np.array([ft[n] for n in names], np.float64)
            init_src = f"variant_C final theta of {args.probe_json}"
    width = hi - lo
    th = np.clip(th, lo + 1e-9 * width, hi - 1e-9 * width)

    # step scaling: Laplace stds where available, widened on relaxed axes
    lap = np.load(args.laplace)
    std = np.maximum(lap["std"].astype(np.float64), 1e-12)
    std[relaxed] = np.maximum(std[relaxed], 0.05 * width[relaxed])

    print(f"init: {init_src}")
    print(f"reference-bounds MAP row: LL {ll_ref:.3f}  "
          f"sero {100 * sero_ref:.3f}%", flush=True)

    def polish(th_start, se, tag):
        vg = jax.jit(jax.value_and_grad(make_joint(se))) if se else \
            jax.jit(jax.value_and_grad(ll_raw))
        th0 = th_start.copy()

        def neg(z):
            v, g = vg(jnp.asarray(th0 + z * std))
            return -float(v), -np.asarray(g) * std

        zb = list(zip((lo - th0) / std, (hi - th0) / std))
        t0 = time.perf_counter()
        res = minimize(neg, np.zeros_like(th0), jac=True, method="L-BFGS-B",
                       bounds=zb,
                       options={"maxiter": args.maxiter, "maxcor": 40,
                                "ftol": 1e-13, "gtol": 1e-11})
        # the z->theta map can land 1e-19 outside a zero floor; the saved
        # file must re-load through make_params' non-negativity validation
        th_fin = np.clip(th0 + res.x * std, lo, hi)
        wall = time.perf_counter() - t0
        ll = float(ll_jit(jnp.asarray(th_fin)))
        sero = float(sero_jit(jnp.asarray(th_fin)))
        inside = ENE_COVID_LOWER <= sero <= ENE_COVID_UPPER
        print(f"{tag}: {res.nit} its in {wall:.0f}s -> "
              f"LL {ll:.3f} (dLL vs reference-bounds {ll - ll_ref:+.1f})  "
              f"sero {100 * sero:.3f}% "
              f"({'INSIDE' if inside else 'OUTSIDE'} ENE-COVID CI "
              f"[{100 * ENE_COVID_LOWER:.1f}, "
              f"{100 * ENE_COVID_UPPER:.1f}]%)", flush=True)
        return th_fin, {"ll_poisson_float64": ll, "sero_day64": sero,
                        "inside_ene_covid_ci": bool(inside),
                        "se": se, "nit": int(res.nit), "wall_s": wall}

    # Row 1: unconstrained relaxed-bounds MAP — where the data streams alone
    # put the ridge once the reference's floors are lifted (the survey-
    # weighted se=0.0028 MAP is numerically the same point: the ridge's
    # Poisson gradient is ~1.8e4 nats/unit-sero vs the survey term's ~1e3).
    th_unc, row_unc = polish(th, None, "unconstrained relaxed-bounds MAP")

    # Row 2 (the committed artifact): best Poisson fit HELD inside the
    # ENE-COVID CI by a strong pull toward the survey mean.
    th, row_con = polish(th, args.constraint_se,
                         f"ENE-COVID-constrained MAP (se={args.constraint_se:g})")
    ll_map, sero_map = row_con["ll_poisson_float64"], row_con["sero_day64"]
    inside = row_con["inside_ene_covid_ci"]

    os.makedirs(args.out, exist_ok=True)

    # ---- artifact: relaxed bounds in the reference's on-disk format --------
    bounds_path = os.path.join(args.out, "param_bounds_serovalid.txt")
    with open(bounds_path, "w") as f:
        f.write("# Variant-C relaxed bounds: externally-validated "
                "(ENE-COVID-consistent) calibration mode\n")
        f.write("# Derivation: reference data/configuration/param_bounds.txt"
                " with\n")
        f.write(f"#   seed_exposed upper {hi0[i_seed]:g} -> {args.seed_cap:g}"
                f"; runup_days lower {lo0[i_run]:g} -> {args.runup_lo:g};\n")
        f.write(f"#   severity lower bounds (p_j, h_j, icu_j, d_H_j, "
                f"d_ICU_j) / {args.severity_floor_div:g}\n")
        f.write("# Measured justification: results/sero_force_profile.json"
                " + PARITY.md 'ENE-COVID seroprevalence'\n")
        for n, l, h in zip(names, lo, hi):
            f.write(f"{n}  {l:.10g}  {h:.10g}\n")

    # ---- artifact: re-loadable calibrated parameters ------------------------
    map_params = space.apply(base, jnp.asarray(th))
    save_calibration_results(
        os.path.join(args.out, "calibrated_parameters.txt"),
        map_params, names, ll_map)

    # ---- artifact: metrics + provenance -------------------------------------
    def metrics_of(t):
        params, y0, traj = solve_traj(t)
        return essential_metrics(params, traj, ts_j, y0)

    mets = jax.jit(metrics_of)(jnp.asarray(th))
    meta = {
        "mode": "serovalid (variant C relaxed bounds + ENE-COVID data term)",
        "init": init_src,
        "bounds": {
            "file": os.path.relpath(bounds_path, REPO),
            "seed_cap": args.seed_cap, "runup_lo": args.runup_lo,
            "severity_floor_div": args.severity_floor_div,
            "relaxed_parameters": [names[i] for i in relaxed]},
        "sero_target": {"mean": ENE_COVID_MEAN, "survey_se": args.sero_se,
                        "constraint_se": args.constraint_se,
                        "ci": [ENE_COVID_LOWER, ENE_COVID_UPPER]},
        "reference_bounds_map": {"ll_poisson_float64": ll_ref,
                                 "sero_day64": sero_ref},
        "unconstrained_relaxed_map": row_unc,
        "constrained_map": row_con,
        "ll_poisson_float64": ll_map,
        "delta_ll_vs_reference_bounds": ll_map - ll_ref,
        "sero_day64": sero_map,
        "inside_ene_covid_ci": bool(inside),
        "overall_attack_rate": float(mets["overall_attack_rate"]),
        "attack_rate_by_age": np.asarray(mets["AttackRate_age"]).tolist(),
        "overall_ifr": float(mets["overall_IFR"]),
        "total_deaths": float(mets["total_deaths"]),
        "R0": float(mets["R0"]),
        "optimizer": {"maxiter": args.maxiter},
        "substeps": args.substeps, "tableau": args.tableau,
    }

    # ---- artifact: Laplace covariance over the free parameters --------------
    if not args.skip_laplace:
        print("laplace: Hessian of the joint at the MAP "
              "(free parameters only) ...", flush=True)
        eps_b = 1e-7 * width
        free = [i for i in range(len(names))
                if th[i] > lo[i] + eps_b[i] and th[i] < hi[i] - eps_b[i]]
        t0 = time.perf_counter()
        th_j = jnp.asarray(th)
        idx = jnp.asarray(free)

        def joint_free(z):
            return make_joint(args.constraint_se)(th_j.at[idx].set(z))

        H = np.asarray(jax.jacfwd(jax.grad(joint_free))(th_j[idx]))
        H = 0.5 * (H + H.T)
        # negate (we maximize) and regularize to the PD cone
        w, V = np.linalg.eigh(-H)
        w_floor = max(1e-10, 1e-8 * np.abs(w).max())
        w = np.maximum(w, w_floor)
        cov_free = (V / w) @ V.T
        np.savez(os.path.join(args.out, "laplace_serovalid.npz"),
                 names=np.asarray(names), theta_map=th, free=np.asarray(free),
                 cov_free=cov_free,
                 std=_full_std(len(names), free, cov_free),
                 ll_map=ll_map)
        meta["laplace"] = {"n_free": len(free),
                           "wall_s": time.perf_counter() - t0,
                           "eig_floor": float(w_floor)}
        print(f"laplace: {len(free)} free params in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    with open(os.path.join(args.out, "serovalid_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {args.out}/: param_bounds_serovalid.txt, "
          f"calibrated_parameters.txt, serovalid_metadata.json"
          + ("" if args.skip_laplace else ", laplace_serovalid.npz"))
    return 0 if inside else 4


def _full_std(d, free, cov_free):
    std = np.zeros(d)
    std[np.asarray(free)] = np.sqrt(np.maximum(np.diag(cov_free), 0.0))
    return std


if __name__ == "__main__":
    sys.exit(main())

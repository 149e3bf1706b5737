#!/usr/bin/env python
"""Sensitivity run: is the 20x ENE-COVID seroprevalence miss bound-forced?

Findings so far (scripts/sero_profile_probe.py + sero_ridge_scan.py):
  - the reference's own calibrated parameters give day-64 sero 1.006% — they
    fail the reference's own validation (4.8% [4.3, 5.4],
    ``PostCalibrationAnalyser.cpp:289-299``) by ~4.8x;
  - with ``runup_days > 0 and seed_exposed > 0`` the objective uses run-up
    seeding (``SEPAIHRDObjectiveFunction.cpp:124-163``): the epidemic
    amplitude is seed_exposed x exp(growth), the E0..D0 multipliers are
    ignored, growth is pinned by the observed stream shapes — so the ONLY
    amplitude lever is seed_exposed, whose param_bounds.txt cap is 50, and
    the MAP sits exactly AT that cap (runup_days at its LOWER bound 15);
  - the analytic attack-rate<->severity ridge is therefore blocked: seeds
    cannot scale, and scaling severity alone costs ~35k nats at k=4.75.

This script measures what happens when the seed-amplitude bounds are the
only thing relaxed (seed_exposed cap 50 -> 50000, runup window [15,25] ->
[5,25]; every epidemiological rate keeps the reference's bounds):

  1. gradient check at the MAP: dLL/d(seed_exposed) sign/magnitude;
  2. LL-only whitened L-BFGS-B polish in the relaxed space: where does the
     likelihood itself want the amplitude, and what sero does that imply?
  3. joint polish with the ENE-COVID Gaussian term: can the model reach
     4.8% sero, and at what Poisson-LL cost vs the relaxed optimum?

Writes results/sero_sensitivity.json.
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", dest="map_path",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"))
    p.add_argument("--laplace",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "laplace_mass.npz"))
    p.add_argument("--seed-cap", type=float, default=50000.0)
    p.add_argument("--runup-lo", type=float, default=5.0)
    p.add_argument("--sero-target", type=float, default=0.048)
    p.add_argument("--sero-se", type=float, default=0.0028)
    p.add_argument("--maxiter", type=int, default=400)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "sero_sensitivity.json"))
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from mmidv1_tpu.analysis.metrics import SERO_TARGET_DAY
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.models import sepaihrd

    pipe = load_spain_pipeline(REPO, dtype=jnp.float64)
    data, base, space0, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    ts_j = jnp.asarray(ts, jnp.float64)
    base_y0 = jnp.asarray(
        data.initial_sepaihrd_state(
            sigma=base.sigma, gamma_p=base.gamma_p, gamma_A=base.gamma_A,
            gamma_I=base.gamma_I, p=base.p, h=base.h), jnp.float64)
    names = list(space0.names)

    # ---- relaxed space: amplitude bounds only -----------------------------
    lo = np.asarray(space0.lower, np.float64).copy()
    hi = np.asarray(space0.upper, np.float64).copy()
    i_seed = names.index("seed_exposed")
    i_run = names.index("runup_days")
    hi[i_seed] = args.seed_cap
    lo[i_run] = args.runup_lo
    space = dataclasses.replace(space0, lower=lo, upper=hi)

    ll_raw = build_objective(
        space, base, data, ts, substeps=args.substeps, tableau=args.tableau,
        constraint_mode=REFLECT, dtype=jnp.float64)
    ll_fn = jax.jit(ll_raw)
    grad_fn = jax.jit(jax.grad(ll_raw))

    t_idx = int(np.argmin(np.abs(np.asarray(ts) - SERO_TARGET_DAY)))
    total_pop = float(np.sum(np.asarray(data.population_by_age)))

    def sero_of(theta):
        params = space.apply(base, space.constrain(theta, REFLECT))
        y0, _ = sepaihrd.initial_state_for_params(params, base_y0)
        traj = sepaihrd.solve(params, y0, ts_j, method="fixed",
                              substeps=args.substeps, tableau=args.tableau)
        S64 = jnp.sum(traj[t_idx, 0])
        return (total_pop - S64) / total_pop

    sero_jit = jax.jit(sero_of)

    prm_map = read_sepaihrd_parameters(args.map_path, 4,
                                       N=data.population_by_age,
                                       M_baseline=base.M_baseline,
                                       dtype=jnp.float64)
    theta_map = np.asarray(space.extract(prm_map), np.float64)
    # nudge off the exact walls so REFLECT's boundary derivative is clean
    width = hi - lo
    theta_map = np.clip(theta_map, lo + 1e-9 * width, hi - 1e-9 * width)

    ll_map = float(ll_fn(jnp.asarray(theta_map)))
    sero_map = float(sero_jit(jnp.asarray(theta_map)))
    g = np.asarray(grad_fn(jnp.asarray(theta_map)))
    print(f"MAP (orig bounds): LL {ll_map:.3f}  sero {100*sero_map:.3f}%")
    print(f"dLL/d(seed_exposed) = {g[i_seed]:+.4f}  (at the old cap 50; "
          f"positive = the data wants MORE seeding)")
    print(f"dLL/d(runup_days)   = {g[i_run]:+.4f}  (at the old floor 15)",
          flush=True)

    results = {"map": {"ll": ll_map, "sero_day64": sero_map,
                       "grad_seed_exposed": float(g[i_seed]),
                       "grad_runup_days": float(g[i_run])},
               "relaxation": {"seed_cap": args.seed_cap,
                              "runup_lo": args.runup_lo}}

    lap = np.load(args.laplace)
    std = np.maximum(lap["std"].astype(np.float64), 1e-12)
    std = std.copy()
    # the relaxed coordinates need a sane whitening scale (their Laplace
    # widths were computed wedged against the old walls)
    std[i_seed] = max(std[i_seed], 0.05 * args.seed_cap)
    std[i_run] = max(std[i_run], 1.0)

    def polish(fun_vg, th0, tag):
        zb = list(zip((lo - th0) / std, (hi - th0) / std))
        z = np.zeros_like(th0)
        t0 = time.perf_counter()
        best = None
        for r in range(args.rounds):
            res = minimize(fun_vg, z, jac=True, method="L-BFGS-B", bounds=zb,
                           options={"maxiter": args.maxiter, "maxcor": 40,
                                    "ftol": 1e-13, "gtol": 1e-11})
            z = res.x
            th = th0 + z * std
            v = float(ll_fn(jnp.asarray(th)))
            s = float(sero_jit(jnp.asarray(th)))
            print(f"{tag} round {r}: LL {v:.3f}  sero {100*s:.3f}%  "
                  f"seed_exposed {th[i_seed]:.1f}  runup {th[i_run]:.2f}  "
                  f"({res.nit} its, {time.perf_counter()-t0:.0f}s)",
                  flush=True)
            if best is None or -res.fun > best[0]:
                best = (-float(res.fun), th, v, s)
        return best

    # ---- 2) LL-only polish in the relaxed space ---------------------------
    vg_ll = jax.jit(jax.value_and_grad(ll_raw))

    def neg_ll(z):
        v, gg = vg_ll(jnp.asarray(theta_map + z * std))
        return -float(v), -np.asarray(gg) * std

    _, th_rel, ll_rel, sero_rel = polish(neg_ll, theta_map, "LL-only")
    results["relaxed_ll_optimum"] = {
        "ll": ll_rel, "delta_ll_vs_map": ll_rel - ll_map,
        "sero_day64": sero_rel,
        "seed_exposed": float(th_rel[i_seed]),
        "runup_days": float(th_rel[i_run]),
        "theta": {n: float(v) for n, v in zip(names, th_rel)}}

    # ---- 3) joint (ENE-COVID-constrained) polish in the relaxed space -----
    target, se = args.sero_target, args.sero_se

    def joint(theta):
        return ll_raw(theta) - 0.5 * ((sero_of(theta) - target) / se) ** 2

    vg_joint = jax.jit(jax.value_and_grad(joint))

    def neg_joint(z):
        v, gg = vg_joint(jnp.asarray(th_rel + z * std))
        return -float(v), -np.asarray(gg) * std

    _, th_j, ll_j, sero_j = polish(neg_joint, th_rel.copy(), "joint")
    results["relaxed_joint_optimum"] = {
        "ll": ll_j, "delta_ll_vs_relaxed": ll_j - ll_rel,
        "delta_ll_vs_map": ll_j - ll_map, "sero_day64": sero_j,
        "seed_exposed": float(th_j[i_seed]),
        "runup_days": float(th_j[i_run]),
        "theta": {n: float(v) for n, v in zip(names, th_j)}}
    results["config"] = {"sero_target": target, "sero_se": se,
                         "substeps": args.substeps, "tableau": args.tableau}

    print("\n| mode | Poisson LL | dLL vs MAP | sero(day64) | seed_exposed |")
    print("|---|---|---|---|---|")
    print(f"| MAP (reference bounds) | {ll_map:.1f} | — | "
          f"{100*sero_map:.3f}% | 50 (at cap) |")
    print(f"| relaxed LL optimum | {ll_rel:.1f} | {ll_rel-ll_map:+.1f} | "
          f"{100*sero_rel:.3f}% | {th_rel[i_seed]:.1f} |")
    print(f"| relaxed + ENE-COVID joint | {ll_j:.1f} | {ll_j-ll_map:+.1f} | "
          f"{100*sero_j:.3f}% | {th_j[i_seed]:.1f} |")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

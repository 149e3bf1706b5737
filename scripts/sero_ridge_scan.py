#!/usr/bin/env python
"""Measure the Poisson-LL profile along the attack-rate <-> severity ridge.

Companion to ``scripts/sero_profile_probe.py`` (whose diagonal-whitened joint
polish could not escape the MAP: sero stayed at 1.014%). The H/ICU/D streams
observe severity x infections, so in the linear-epidemic regime (attack rate
~1%, susceptible depletion negligible) there is an ANALYTIC candidate ridge:

    seeds (E0/P0/A0/I0 multipliers, seed_exposed)  x k
    hospitalization fractions h_j, community death rates d_community_j  / k

which multiplies the infection scale (and hence day-64 seroprevalence) by ~k
while keeping the expected daily H / ICU / D streams fixed. ENE-COVID's 4.8%
needs k ~ 4.7 from the MAP's 1.014%.

This scan measures what the committed data actually charges for that move:
  1. LL + sero along the PROJECTED ridge (clipping at param_bounds.txt bounds,
     reporting which coordinates clipped) for k in a grid;
  2. a bounded, Laplace-whitened joint polish (Poisson LL + ENE-COVID
     Gaussian) STARTED from the best ridge point, so the optimizer only has
     to repair the projection residue, not discover the ridge;
  3. verdicts: delta-LL(best polished sero-consistent point) vs the MAP.

Small delta (O(10-100) nats) => the low-sero mode is a bound/initialization
artifact and a sero-informed calibration is legitimate. Large (O(1e3+)) =>
the committed streams actively contradict ENE-COVID under this model.

Reference validation being interrogated: PostCalibrationAnalyser.cpp:289-299
(ENE-COVID round-1 day-64 seroprevalence 4.8% [4.3, 5.4]).

Writes results/sero_ridge.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RIDGE_UP = ["E0_multiplier", "P0_multiplier", "A0_multiplier",
            "I0_multiplier", "seed_exposed"]
RIDGE_DOWN = ["h_0", "h_1", "h_2", "h_3",
              "d_community_0", "d_community_1", "d_community_2",
              "d_community_3"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", dest="map_path",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"))
    p.add_argument("--laplace",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "laplace_mass.npz"))
    p.add_argument("--k", type=float, nargs="+",
                   default=[1.0, 1.5, 2.0, 3.0, 4.0, 4.75, 6.0])
    p.add_argument("--sero-target", type=float, default=0.048)
    p.add_argument("--sero-se", type=float, default=0.0028)
    p.add_argument("--maxiter", type=int, default=300)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "sero_ridge.json"))
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
    data, base, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    ts_j = jnp.asarray(ts, jnp.float64)
    base_y0 = jnp.asarray(
        data.initial_sepaihrd_state(
            sigma=base.sigma, gamma_p=base.gamma_p, gamma_A=base.gamma_A,
            gamma_I=base.gamma_I, p=base.p, h=base.h), jnp.float64)

    ll_fn = jax.jit(build_objective(
        space, base, data, ts, substeps=args.substeps, tableau=args.tableau,
        constraint_mode=REFLECT, dtype=jnp.float64))

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

    names = list(space.names)
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)
    idx_up = [names.index(n) for n in RIDGE_UP if n in names]
    idx_dn = [names.index(n) for n in RIDGE_DOWN if n in names]

    prm_map = read_sepaihrd_parameters(args.map_path, 4,
                                       N=data.population_by_age,
                                       M_baseline=base.M_baseline,
                                       dtype=jnp.float64)
    theta_map = np.asarray(space.extract(prm_map), np.float64)
    ll_map = float(ll_fn(jnp.asarray(theta_map)))
    sero_map = float(sero_jit(jnp.asarray(theta_map)))
    print(f"MAP: LL {ll_map:.3f}  sero {100*sero_map:.3f}%", flush=True)

    results = {"map": {"ll": ll_map, "sero_day64": sero_map},
               "ridge": [], "names_up": RIDGE_UP, "names_down": RIDGE_DOWN}

    best_ridge = (ll_map, theta_map, sero_map, 1.0)
    for k in args.k:
        th = theta_map.copy()
        th[idx_up] *= k
        th[idx_dn] /= k
        clipped = [names[i] for i in idx_up + idx_dn
                   if not (lo[i] <= th[i] <= hi[i])]
        th = np.clip(th, lo, hi)
        v = float(ll_fn(jnp.asarray(th)))
        s = float(sero_jit(jnp.asarray(th)))
        row = {"k": k, "ll": v, "delta_ll": v - ll_map, "sero_day64": s,
               "clipped": clipped}
        results["ridge"].append(row)
        print(f"k={k:5.2f}: LL {v:15.3f} (dLL {v-ll_map:+12.3f})  "
              f"sero {100*s:6.3f}%  clipped: {','.join(clipped) or '-'}",
              flush=True)
        # prefer the ridge point nearest the sero target as the polish seed
        if abs(s - args.sero_target) < abs(best_ridge[2] - args.sero_target):
            best_ridge = (v, th, s, k)

    # ---- joint polish from the best ridge point ---------------------------
    target, se = args.sero_target, args.sero_se

    def joint(theta):
        return ll_fn(theta) - 0.5 * ((sero_of(theta) - target) / se) ** 2

    vg = jax.jit(jax.value_and_grad(joint))
    lap = np.load(args.laplace)
    std = np.maximum(lap["std"].astype(np.float64), 1e-12)
    th0 = best_ridge[1]

    def neg(z):
        v, g = vg(jnp.asarray(th0 + z * std))
        return -float(v), -np.asarray(g) * std

    zb = list(zip((lo - th0) / std, (hi - th0) / std))
    t0 = time.perf_counter()
    res = minimize(neg, np.zeros_like(th0), jac=True, method="L-BFGS-B",
                   bounds=zb, options={"maxiter": args.maxiter, "maxcor": 40,
                                       "ftol": 1e-12, "gtol": 1e-10})
    th_fin = th0 + res.x * std
    ll_fin = float(ll_fn(jnp.asarray(th_fin)))
    sero_fin = float(sero_jit(jnp.asarray(th_fin)))
    print(f"polish from k={best_ridge[3]:.2f}: LL {ll_fin:.3f} "
          f"(dLL vs MAP {ll_fin-ll_map:+.3f})  sero {100*sero_fin:.3f}%  "
          f"({res.nit} its, {time.perf_counter()-t0:.0f}s)", flush=True)
    results["polished"] = {
        "seed_k": best_ridge[3], "ll": ll_fin, "delta_ll_vs_map": ll_fin - ll_map,
        "sero_day64": sero_fin, "iterations": int(res.nit),
        "theta": {n: float(v) for n, v in zip(names, th_fin)}}
    results["config"] = {"sero_target": target, "sero_se": se,
                         "substeps": args.substeps, "tableau": args.tableau}

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

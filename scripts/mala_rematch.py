#!/usr/bin/env python
"""MALA vs ensemble AM-MH rematch after the f32 noise-floor fix.

The 2026-08-17 head-to-head (OPS_ANALYSIS.md "MALA vs ensemble AM-MH")
found AM-MH ahead 4-8x on min-ESS/s and attributed MALA's collapse to the
float32 likelihood noise entering its accept ratio twice. The round-3
per-day incidence reset cut that noise ~13x (dH std 0.218 at eps=1e-3,
OPS_ANALYSIS.md "Noise floor: FIXED") — this script re-runs the identical
protocol to see whether the diagnosis holds up: 2048 chains from the
artifact MAP, artifact posterior covariance as MALA preconditioner / MH
proposal seed, 2000 steps, f32, min-ESS/s over post-burn-in draws.

Writes results/mala_rematch.json and a markdown table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chains", type=int, default=2048)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--burn", type=int, default=500)
    p.add_argument("--posterior",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "posterior_samples.npz"))
    p.add_argument("--map", dest="map_path",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"))
    p.add_argument("--fixed-eps", type=float, nargs="+",
                   default=[0.05, 0.15, 0.3])
    p.add_argument("--substeps", type=int, default=3)
    p.add_argument("--tableau", default="cash_karp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "mala_rematch.json"))
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"],
                   help="'cpu' forces the CPU backend (smoke tests; the "
                        "JAX_PLATFORMS env var cannot override the axon "
                        "sitecustomize, so this must be a config update)")
    args = p.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mmidv1_tpu.analysis.diagnostics import summarize
    from mmidv1_tpu.calibration.mala import MALAConfig, run_mala
    from mmidv1_tpu.calibration.mh import MHConfig, run_mh
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters

    dtype = jnp.float32
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")

    loglik = build_objective(space, params, data, ts, substeps=args.substeps,
                             tableau=args.tableau, constraint_mode=REFLECT,
                             dtype=dtype)
    ll_batch = None
    vag = None
    if dev.platform == "tpu":
        from mmidv1_tpu.ops import (build_objective_pallas,
                                    build_objective_pallas_grad)
        ll_batch = build_objective_pallas(
            space, params, data, ts, substeps=args.substeps,
            tableau=args.tableau, constraint_mode=REFLECT, dtype=dtype,
            block_b=2048)
        vag = build_objective_pallas_grad(
            space, params, data, ts, substeps=args.substeps,
            tableau=args.tableau, constraint_mode=REFLECT, dtype=dtype,
            block_b=2048)

    prm_map = read_sepaihrd_parameters(args.map_path, 4,
                                       N=data.population_by_age,
                                       M_baseline=params.M_baseline,
                                       dtype=dtype)
    theta0 = space.extract(prm_map).astype(dtype)
    post = np.load(args.posterior)
    draws = post["samples"].reshape(-1, space.dim).astype(np.float64)
    cov = np.cov(draws, rowvar=False)
    cov += 1e-10 * np.eye(space.dim)

    B, T = args.chains, args.steps
    results = {"config": {"chains": B, "steps": T, "burn": args.burn,
                          "substeps": args.substeps, "tableau": args.tableau}}

    def ess_per_sec(samples, wall):
        sub = samples[args.burn:, :: max(1, samples.shape[1] // 256), :]
        d = summarize(np.asarray(sub), list(space.names))
        ess = min(v["ess"] for v in d.values())
        rh = max(v["rhat"] for v in d.values())
        return ess, ess / wall, rh

    rows = []

    # ---- ensemble AM-MH ----------------------------------------------------
    cfg = MHConfig(iterations=T, burn_in=args.burn,
                   adaptation_period=100, thinning=1)
    t0 = time.perf_counter()
    res = run_mh(loglik, space, theta0, jax.random.PRNGKey(args.seed), cfg,
                 n_chains=B, initial_cov=jnp.asarray(cov, dtype),
                 jitter=1.0, loglik_batch=ll_batch)
    jax.block_until_ready(res.samples)
    wall = time.perf_counter() - t0
    ess, eps_s, rh = ess_per_sec(np.asarray(res.samples), wall)
    acc = float(np.mean(np.asarray(res.acceptance_rate)))
    rows.append(("ensemble AM-MH (Pallas objective)",
                 B * T / wall, acc, ess, eps_s, rh, wall))
    print(f"AM-MH: {B*T/wall:.3e} steps/s  accept {acc:.3f}  min-ESS {ess:.0f}"
          f"  min-ESS/s {eps_s:.1f}  (wall {wall:.0f}s)", flush=True)

    # ---- MALA, RM-adapted --------------------------------------------------
    mcfg = MALAConfig(iterations=T, burn_in=args.burn, adaptation_period=100,
                      thinning=1, initial_step_size=0.1)
    t0 = time.perf_counter()
    mres = run_mala(loglik, space, theta0, jax.random.PRNGKey(args.seed + 1),
                    mcfg, n_chains=B, initial_cov=jnp.asarray(cov, dtype),
                    jitter=1.0, value_and_grad_batch=vag)
    jax.block_until_ready(mres.samples)
    wall = time.perf_counter() - t0
    ess, eps_s, rh = ess_per_sec(np.asarray(mres.samples), wall)
    acc = float(np.mean(np.asarray(mres.acceptance_rate)))
    step = float(np.median(np.asarray(mres.final_eps)))
    rows.append((f"MALA RM-adapted (eps->{step:.2e})",
                 B * T / wall, acc, ess, eps_s, rh, wall))
    print(f"MALA adapt: {B*T/wall:.3e} steps/s  accept {acc:.3f}  "
          f"eps {step:.2e}  min-ESS {ess:.0f}  min-ESS/s {eps_s:.1f}",
          flush=True)

    # ---- MALA, fixed eps ---------------------------------------------------
    for eps in args.fixed_eps:
        fcfg = MALAConfig(iterations=T, burn_in=args.burn,
                          adaptation_period=100, thinning=1,
                          initial_step_size=eps, adapt_scale=False)
        t0 = time.perf_counter()
        fres = run_mala(loglik, space, theta0,
                        jax.random.PRNGKey(args.seed + 2), fcfg, n_chains=B,
                        initial_cov=jnp.asarray(cov, dtype), jitter=1.0,
                        value_and_grad_batch=vag)
        jax.block_until_ready(fres.samples)
        wall = time.perf_counter() - t0
        ess, eps_s, rh = ess_per_sec(np.asarray(fres.samples), wall)
        acc = float(np.mean(np.asarray(fres.acceptance_rate)))
        rows.append((f"MALA fixed eps={eps}", B * T / wall, acc, ess, eps_s,
                     rh, wall))
        print(f"MALA eps={eps}: accept {acc:.3f}  min-ESS {ess:.0f}  "
              f"min-ESS/s {eps_s:.1f}", flush=True)

    print("\n| sampler | steps/s | acceptance | min-ESS | min-ESS/s |")
    print("|---|---|---|---|---|")
    for name, sps, acc, ess, eps_s, rh, wall in rows:
        print(f"| {name} | {sps:.2e} | {acc:.2f} | {ess:.0f} | {eps_s:.0f} |")

    results["rows"] = [
        {"sampler": n, "steps_per_sec": s, "acceptance": a, "min_ess": e,
         "min_ess_per_sec": es, "max_rhat": r, "wall_s": w}
        for n, s, a, e, es, r, w in rows]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""End-to-end Spain-2020 SEPAIHRD calibration — the reproducible artifact.

Runs the reference's primary workload (``src/model/main.cpp:136-563``):
load data/configuration -> build the 62-parameter space -> Phase 1 optimizer
(CLAMP) -> covariance conditioning -> Phase 2 ensemble adaptive-Metropolis
(REFLECT) -> write re-loadable calibrated parameters + posterior samples +
run metadata.

The quality bar: final best log-likelihood must EXCEED the reference's
recorded best 1.41969205e+06 (``data/configuration/initial_guess.txt:3``).
Note the committed reference parameters themselves evaluate to only
1.206857e+06 on the committed data (see PARITY.md) — this script demonstrates
the recalibration actually beating the recorded value.

Usage (defaults give a ~1-minute TPU run that clears the bar):
    python scripts/calibrate_spain.py [--algorithm psomcmc] [--chains 64]
        [--pso-particles 512] [--pso-iters 60] [--mcmc-iters 600]
        [--platform tpu|cpu] [--out results/spain2020] [--full]

``--full`` uses the reference's production configuration files
(pso_settings.txt / mcmc_settings.txt: 100k iterations, burn-in 5k,
thinning 100) — a long TPU run.
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

REFERENCE_BEST_LL = 1.41969205e+06   # data/configuration/initial_guess.txt:3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algorithm", default="psomcmc",
                   choices=["pso", "psomcmc", "hill", "hillmcmc", "nuts"])
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--pso-particles", type=int, default=512)
    p.add_argument("--pso-iters", type=int, default=60)
    p.add_argument("--mcmc-iters", type=int, default=600)
    p.add_argument("--thinning", type=int, default=5)
    p.add_argument("--burn-in", type=int, default=100)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--engine", default="xla", choices=["xla", "pallas"],
                   help="objective engine for the MCMC phase (pallas = the "
                        "fused VMEM-resident kernel, ~2x on TPU)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--x64", action="store_true",
                   help="float64 (CPU parity runs); default float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init", default=None,
                   help="warm-start theta from a calibrated_parameters.txt "
                        "(grid semantics stay pinned to initial_guess.txt)")
    p.add_argument("--out", default=os.path.join(REPO, "results", "spain2020"))
    p.add_argument("--full", action="store_true",
                   help="use the production settings files")
    args = p.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.calibrator import calibrate
    from mmidv1_tpu.calibration.mh import MHConfig
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import CLAMP, REFLECT
    from mmidv1_tpu.calibration.pso import PSOConfig
    from mmidv1_tpu.calibration.hill import HillClimbConfig
    from mmidv1_tpu.calibration.nuts import NUTSConfig
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import (read_sepaihrd_parameters, read_settings,
                                 save_calibration_results)

    dtype = jnp.float64 if args.x64 else jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}; dtype {dtype.__name__}")

    t_load = time.perf_counter()
    cfg_dir = os.path.join(REPO, "data", "configuration")
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    M = params.M_baseline
    print(f"config loaded: {space.dim} calibratable params, "
          f"{data.n_data_points} observation days, grid {len(ts)} points "
          f"({time.perf_counter() - t_load:.1f}s)")

    loglik_clamp = build_objective(space, params, data, ts,
                                   substeps=args.substeps,
                                   constraint_mode=CLAMP, dtype=dtype)
    loglik_reflect = build_objective(space, params, data, ts,
                                     substeps=args.substeps,
                                     constraint_mode=REFLECT, dtype=dtype)
    loglik_batch_reflect = loglik_batch_clamp = None
    if args.engine == "pallas":
        from mmidv1_tpu.ops import build_objective_pallas
        loglik_batch_reflect = build_objective_pallas(
            space, params, data, ts, substeps=args.substeps,
            constraint_mode=REFLECT, dtype=dtype,
            block_b=min(2048, args.chains))
        loglik_batch_clamp = build_objective_pallas(
            space, params, data, ts, substeps=args.substeps,
            constraint_mode=CLAMP, dtype=dtype,
            block_b=min(2048, args.pso_particles))
    if args.init:
        init_params = read_sepaihrd_parameters(
            args.init, 4, N=data.population_by_age, M_baseline=M, dtype=dtype)
        theta0 = space.extract(init_params).astype(dtype)
        print(f"warm start from {args.init}")
    else:
        theta0 = space.extract(params).astype(dtype)
    ll0 = float(loglik_clamp(theta0))
    print(f"initial objective at committed params: {ll0:.6e} "
          f"(reference recorded best: {REFERENCE_BEST_LL:.8e})")

    if args.full:
        pso_cfg = PSOConfig.from_settings(
            read_settings(os.path.join(cfg_dir, "pso_settings.txt")))
        mh_cfg = MHConfig.from_settings(
            read_settings(os.path.join(cfg_dir, "mcmc_settings.txt")))
        hill_cfg = HillClimbConfig.from_settings(
            read_settings(os.path.join(cfg_dir, "hill_climbing_settings.txt")))
        nuts_cfg = NUTSConfig.from_settings(
            read_settings(os.path.join(cfg_dir, "nuts_settings.txt")))
    else:
        pso_cfg = PSOConfig(swarm_size=args.pso_particles, iterations=args.pso_iters)
        mh_cfg = MHConfig(iterations=args.mcmc_iters, burn_in=args.burn_in,
                          adaptation_period=50, thinning=args.thinning)
        hill_cfg = HillClimbConfig(iterations=max(args.pso_iters, 30))
        nuts_cfg = NUTSConfig(iterations=max(args.mcmc_iters // 10, 50))

    phase1_config = hill_cfg if args.algorithm.startswith("hill") else pso_cfg
    key = jax.random.PRNGKey(args.seed)

    t0 = time.perf_counter()
    result = calibrate(loglik_clamp, loglik_reflect, space, theta0, key,
                       algorithm=args.algorithm, phase1_config=phase1_config,
                       mh_config=mh_cfg, nuts_config=nuts_cfg,
                       n_chains=args.chains,
                       loglik_batch_reflect=loglik_batch_reflect,
                       loglik_batch_clamp=loglik_batch_clamp)
    best_ll = float(result.best_logl)
    wall = time.perf_counter() - t0
    print(f"calibration done in {wall:.1f}s: best logL {best_ll:.6e} "
          f"({'BEATS' if best_ll > REFERENCE_BEST_LL else 'below'} reference "
          f"{REFERENCE_BEST_LL:.8e})")
    if result.phase1_logl is not None:
        print(f"  phase 1 best: {float(result.phase1_logl):.6e}")

    # float64 re-selection: the f32 objective's noise floor at LL ~1.4e6 is
    # O(1e2), so candidates within that band are indistinguishable in-run.
    # Re-evaluate every chain's MAP (and phase 1's best) in double precision
    # on the SAME grid and pick the true argmax.
    if not args.x64:
        jax.config.update("jax_enable_x64", True)
        ll64 = build_objective(space, jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params),
            data, ts, substeps=args.substeps, constraint_mode=REFLECT,
            dtype=jnp.float64)
        cands = [np.asarray(result.best_theta)[None, :]]
        if result.mh_result is not None:
            cands.append(np.asarray(result.mh_result.final_state.best_x))
        if result.phase1_best is not None:
            cands.append(np.asarray(result.phase1_best)[None, :])
        cands = jnp.asarray(np.unique(np.concatenate(cands, axis=0), axis=0),
                            jnp.float64)
        lls64 = np.asarray(jax.jit(jax.vmap(ll64))(cands))
        k = int(np.argmax(lls64))
        best_ll64 = float(lls64[k])
        result = result._replace(best_theta=cands[k])
        print(f"float64 re-selection over {len(cands)} candidate MAPs: "
              f"{best_ll64:.8e}")
    else:
        best_ll64 = best_ll
    print(f"float64 best log-likelihood: {best_ll64:.8e}")

    os.makedirs(args.out, exist_ok=True)
    # save from a float64 pytree so the %.8e artifact round-trips to the
    # float64-verified likelihood
    params64 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)
    best_params = space.apply(params64,
                              jnp.asarray(np.asarray(result.best_theta),
                                          jnp.float64))
    save_calibration_results(
        os.path.join(args.out, "calibrated_parameters.txt"),
        best_params, list(space.names), best_ll64)
    # NOTE (grid semantics, mirrors the reference): the objective's time grid
    # is FIXED from the initial guess's runup_days (main.cpp:241; int cast).
    # When runup_days is itself calibrated, re-loading calibrated_parameters
    # .txt and rebuilding the grid from ITS runup_days yields a different
    # likelihood — evaluate reloaded thetas on the original grid
    # (grid_runup_days below) to reproduce best_logl.

    if result.samples is not None:
        np.savez_compressed(
            os.path.join(args.out, "posterior_samples.npz"),
            samples=np.asarray(result.samples),
            logls=np.asarray(result.sample_logls),
            names=np.asarray(space.names))

    meta = {
        "best_logl": best_ll,
        "best_logl_float64": best_ll64,
        "grid_runup_days": int(np.asarray(params.runup_days)),
        "initial_logl": ll0,
        "reference_best_logl": REFERENCE_BEST_LL,
        "beats_reference": best_ll64 > REFERENCE_BEST_LL,
        "phase1_logl": (float(result.phase1_logl)
                        if result.phase1_logl is not None else None),
        "algorithm": args.algorithm,
        "engine": args.engine,
        "chains": args.chains,
        "pso": dataclasses.asdict(pso_cfg) if args.algorithm.startswith("pso")
               else None,
        "mcmc_iterations": mh_cfg.iterations,
        "substeps": args.substeps,
        "dtype": dtype.__name__,
        "seed": args.seed,
        "wall_seconds": wall,
        "device": f"{dev.platform}/{dev.device_kind}",
        "n_params": space.dim,
        "observation_days": data.n_data_points,
    }
    with open(os.path.join(args.out, "run_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    print(f"artifacts written to {args.out}")
    return 0 if best_ll64 > REFERENCE_BEST_LL else 1


if __name__ == "__main__":
    sys.exit(main())

"""``sepaihrd_objective_benchmark`` — the performance harness CLI.

Re-design of ``src/model/sepaihrd_objective_benchmark_main.cpp`` (565 lines):
``--mode micro|pso|hill|mcmc|all`` with repeats and jittered evaluations,
reporting µs/eval, evals/sec, optimizer wall time, and objective call counts.
The reference's cache-on/off axis is obsolete (there is no simulation cache —
recompute beats memoization when the whole batch solves in one fused program,
SURVEY.md §3.2); the batch-size axis replaces it (--batch).

Run:  python -m mmidv1_tpu.cli.benchmark_main --mode micro --batch 4096
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from ..utils.logging import get_logger
from .common import load_spain_pipeline, setup_jax


def _timed(fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sepaihrd_objective_benchmark",
                                description=__doc__)
    p.add_argument("--mode", default="micro",
                   choices=["micro", "pso", "hill", "mcmc", "hillmcmc",
                            "all"])
    p.add_argument("--batch", type=int, default=4096,
                   help="objective batch size (vmap width)")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--iterations", type=int, default=50,
                   help="optimizer/sampler iterations per timed run")
    p.add_argument("--chains", type=int, default=1024)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5",
                   help="fixed-grid RK tableau; cash_karp with --substeps 3 "
                        "is the measured-equal-accuracy fast config "
                        "(PARITY.md)")
    p.add_argument("--num-days", type=int, default=None)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--x64", action="store_true")
    p.add_argument("--project-root", default=None)
    p.add_argument("--json", action="store_true", help="machine-readable output")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the timed section "
                        "into DIR (view with TensorBoard/Perfetto)")
    args = p.parse_args(argv)

    log = get_logger("benchmark")
    jax = setup_jax(args.platform, args.x64)
    import jax.numpy as jnp

    from ..calibration.hill import HillClimbConfig, run_hill_climb
    from ..calibration.mh import MHConfig, run_mh
    from ..calibration.objective import build_objective
    from ..calibration.param_space import CLAMP, REFLECT
    from ..calibration.pso import PSOConfig, run_pso

    dev = jax.devices()[0]
    pipe = load_spain_pipeline(args.project_root, num_days=args.num_days)
    dtype = pipe.params.dtype
    results = {"device": f"{dev.platform}/{dev.device_kind}",
               "dtype": str(np.dtype(dtype.__name__ if hasattr(dtype, "__name__")
                                     else dtype)),
               "batch": args.batch, "n_params": pipe.space.dim}

    loglik_c = build_objective(pipe.space, pipe.params, pipe.data, pipe.ts,
                               substeps=args.substeps, tableau=args.tableau,
                               constraint_mode=CLAMP,
                               dtype=dtype)
    loglik_r = build_objective(pipe.space, pipe.params, pipe.data, pipe.ts,
                               substeps=args.substeps, tableau=args.tableau,
                               constraint_mode=REFLECT,
                               dtype=dtype)
    theta0 = jnp.asarray(pipe.theta0, dtype=dtype)
    key = jax.random.PRNGKey(0)

    modes = ([args.mode] if args.mode != "all"
             else ["micro", "pso", "hill", "mcmc", "hillmcmc"])

    if "micro" in modes:
        # jittered evaluations like the reference's micro mode (:420-470)
        obj = jax.jit(jax.vmap(loglik_r))
        thetas = theta0[None, :] + 0.01 * pipe.space.sigmas.astype(dtype) * \
            jax.random.normal(key, (args.batch, pipe.space.dim), dtype=dtype)
        t0 = time.perf_counter()
        obj(thetas).block_until_ready()
        results["micro_compile_s"] = time.perf_counter() - t0
        if args.profile:
            with jax.profiler.trace(args.profile):
                obj(thetas).block_until_ready()
            log.info(f"profiler trace written to {args.profile}")
        dt = _timed(lambda: obj(thetas).block_until_ready(), args.repeats)
        results["micro_evals_per_sec"] = args.batch / dt
        results["micro_us_per_eval"] = dt / args.batch * 1e6
        log.info(f"micro: {args.batch / dt:.3e} evals/s "
                 f"({dt / args.batch * 1e6:.2f} us/eval amortized)")

        # in-scan metric: production loops (PSO/hill/MCMC) call the
        # objective inside a device-side lax.scan, so the per-dispatch
        # host->device latency above (~30 ms on tunneled TPU setups) is
        # amortized away; this is the engine rate those loops actually see
        SCAN_STEPS = 20

        @jax.jit
        def scan_evals(key):
            def body(acc, k):
                t = thetas + 0.001 * jax.random.normal(k, thetas.shape,
                                                       dtype=dtype)
                return acc + jax.vmap(loglik_r)(t).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), dtype),
                                  jax.random.split(key, SCAN_STEPS))
            return acc

        scan_evals(jax.random.PRNGKey(9)).block_until_ready()  # compile
        dts = _timed(lambda: scan_evals(jax.random.PRNGKey(10))
                     .block_until_ready(), args.repeats) / SCAN_STEPS
        results["micro_evals_per_sec_inscan"] = args.batch / dts
        results["micro_us_per_eval_inscan"] = dts / args.batch * 1e6
        log.info(f"micro (in-scan): {args.batch / dts:.3e} evals/s "
                 f"({dts / args.batch * 1e6:.2f} us/eval)")

    if "pso" in modes:
        cfg = PSOConfig(swarm_size=min(args.batch, 1024),
                        iterations=args.iterations)
        t0 = time.perf_counter()
        res = run_pso(loglik_c, pipe.space, key, cfg, theta0=theta0)
        float(res.best_f)
        wall = time.perf_counter() - t0
        evals = cfg.swarm_size * (cfg.iterations + 2)
        results["pso_wall_s"] = wall
        results["pso_best_logl"] = float(res.best_f)
        results["pso_evals"] = evals
        log.info(f"pso: {wall:.1f}s wall, best {float(res.best_f):.6e}, "
                 f"~{evals} evals")

    if "hill" in modes:
        cfg = HillClimbConfig(iterations=args.iterations)
        t0 = time.perf_counter()
        res = run_hill_climb(loglik_c, pipe.space, theta0, key, cfg)
        float(res.best_logl)
        wall = time.perf_counter() - t0
        results["hill_wall_s"] = wall
        results["hill_best_logl"] = float(res.best_logl)
        log.info(f"hill: {wall:.1f}s wall, best {float(res.best_logl):.6e}")

    if "mcmc" in modes:
        cfg = MHConfig(iterations=args.iterations, burn_in=args.iterations // 5,
                       adaptation_period=25, thinning=1)
        t0 = time.perf_counter()
        res = run_mh(loglik_r, pipe.space, theta0, key, cfg,
                     n_chains=args.chains)
        float(res.best_logp)
        wall = time.perf_counter() - t0
        results["mcmc_wall_s"] = wall
        results["mcmc_chain_steps_per_sec"] = args.chains * args.iterations / wall
        results["mcmc_best_logl"] = float(res.best_logp)
        results["mcmc_mean_acceptance"] = float(np.mean(
            np.asarray(res.acceptance_rate)))
        log.info(f"mcmc: {wall:.1f}s wall ({args.chains} chains x "
                 f"{args.iterations} steps incl. compile), best "
                 f"{float(res.best_logp):.6e}")

    if "hillmcmc" in modes:
        # the reference harness's combined mode (:88-182): hill-climb to the
        # MAP neighborhood, then sample from there with the hill covariance
        from ..calibration.calibrator import condition_covariance

        h_cfg = HillClimbConfig(iterations=args.iterations)
        m_cfg = MHConfig(iterations=args.iterations,
                         burn_in=args.iterations // 5,
                         adaptation_period=25, thinning=1)
        t0 = time.perf_counter()
        hres = run_hill_climb(loglik_c, pipe.space, theta0, key, h_cfg)
        cov0 = condition_covariance(hres.final_cov,
                                    pipe.space.sigmas.astype(dtype))
        mres = run_mh(loglik_r, pipe.space, hres.best_x,
                      jax.random.fold_in(key, 1), m_cfg,
                      n_chains=args.chains, initial_cov=cov0)
        float(mres.best_logp)
        wall = time.perf_counter() - t0
        best = max(float(hres.best_logl), float(mres.best_logp))
        results["hillmcmc_wall_s"] = wall
        results["hillmcmc_best_logl"] = best
        results["hillmcmc_hill_best_logl"] = float(hres.best_logl)
        log.info(f"hillmcmc: {wall:.1f}s wall, best {best:.6e}")

    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

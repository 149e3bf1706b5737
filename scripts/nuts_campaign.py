#!/usr/bin/env python
"""Production NUTS campaign on the Spain-2020 posterior (Pallas adjoint engine).

Fields the gradient sampler on the real calibration problem (the reference
runs NUTS only as a demo mode, ``main.cpp:48-79`` / ``NUTSSampler.cpp:321-427``;
its single chain at ~1 leapfrog/s cannot touch the production posterior).
Here every leapfrog is a fused Pallas forward+adjoint solve over the whole
chain ensemble (``ops/sepaihrd_adjoint.py``), and the sampler runs in
Laplace-whitened coordinates (dense mass matrix from the polished MAP's
inverse Hessian — ``run_nuts_dense``; see scripts/map_polish.py).

Writes the same artifact tree as ``production_campaign.py`` (posterior trace,
convergence diagnostics, float64-re-selected MAP) plus min-ESS/s for the
head-to-head against the AM-MH campaign recorded in PARITY.md.

Usage:
    python scripts/nuts_campaign.py [--chains 512] [--iterations 1500]
        [--warmup 500] [--depth 6] [--out results/spain2020_nuts]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_BEST_LL = 1.41969205e+06


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chains", type=int, default=512)
    p.add_argument("--iterations", type=int, default=1500)
    p.add_argument("--warmup", type=int, default=500,
                   help="dual-averaging adaptation window (iterations)")
    p.add_argument("--depth", type=int, default=6, help="max tree depth")
    p.add_argument("--delta-target", type=float, default=0.8,
                   help="dual-averaging acceptance target; set AT OR BELOW "
                        "the f32 noise-floor acceptance (~0.78 measured on "
                        "this posterior, scripts/energy_error_probe.py) or "
                        "the adaptation spirals the step toward zero")
    p.add_argument("--eps-floor", type=float, default=0.0,
                   help="lower clamp on the adapted step (whitened units); "
                        "bounds the noise-floor death spiral")
    p.add_argument("--eps-ceil", type=float, default=float("inf"),
                   help="upper clamp on the adapted step (whitened units)")
    p.add_argument("--posterior-burn-frac", type=float, default=0.5,
                   help="fraction of POST-warmup draws additionally "
                        "discarded from the reported posterior and its "
                        "diagnostics (Vehtari et al. 2021 default: half) — "
                        "warm-started chains still need forgetting time "
                        "beyond the step-size window, and keeping the "
                        "drift-contaminated head holds split-R-hat up by "
                        "pure dilution long after the chains have mixed")
    p.add_argument("--posterior-burn-iters", type=int, default=0,
                   help="ABSOLUTE post-warmup burn-in (overrides "
                        "--posterior-burn-frac when > 0; capped at 90%% of "
                        "the post-warmup draws). A proportional burn "
                        "over-discards as a gated run extends: on the r19 "
                        "campaign the excess of the worst rank-R-hat over "
                        "1.0 times the kept-window length measured "
                        "constant (~235) for every burn in {400..2000} "
                        "iterations — the warm-start transient is dead by "
                        "~400, so R-hat is governed purely by kept-window "
                        "LENGTH and discarding half of an 8000-iteration "
                        "run just pushes the same gate thousands of "
                        "iterations further out")
    p.add_argument("--segments", type=int, default=30,
                   help="split the run into this many device dispatches "
                        "(a monolithic dispatch holds one RPC deadline open "
                        "for minutes and dies UNAVAILABLE on tunneled TPUs)")
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    p.add_argument("--jitter", type=float, default=1.0)
    p.add_argument("--mass", default="laplace-dense",
                   choices=["laplace-dense", "laplace", "posterior", "sigmas",
                            "empirical-dense", "logit-dense", "logit-file"],
                   help="mass matrix: 'laplace-dense' whitens by the "
                        "Cholesky factor of the full Laplace covariance at "
                        "the polished MAP (run_nuts_dense - the production "
                        "choice; correlated stiffness pins the DIAGONAL "
                        "Laplace mass at step ~3e-3, measured campaign r2); "
                        "'laplace' whitens by the Laplace marginal stds "
                        "only; 'posterior' whitens by the AM-MH trace's "
                        "marginal stds (random-walk-width-inflated ~100x "
                        "here - step pinned at ~1e-3, measured); 'sigmas' "
                        "uses the proposal sigmas (~100-1000x wider still). "
                        "Both laplace modes start the chains at the MAP; "
                        "'empirical-dense' whitens by the pooled covariance "
                        "of a PREVIOUS NUTS trace (--trace) - the production "
                        "two-stage recipe: the Laplace mass under-scales the "
                        "posterior's soft directions ~6x (measured: chains "
                        "sit at whitened radius ~50, not sqrt(d)=7.9), so "
                        "stage 1's real HMC samples are the right width "
                        "estimate (the AM-MH cloud was NOT - its width was "
                        "init diffusion, PARITY.md round-2 addendum); "
                        "'logit-dense' samples in UNCONSTRAINED logit "
                        "coordinates (theta = lo + width*sigmoid(y)) with a "
                        "dense mass on y estimated from --trace: the "
                        "posterior pins nine parameters against their "
                        "bounds (p_1 at 100%% of draws), which under "
                        "clamp/reflect crushes the dual-averaged step to "
                        "~4e-4 and freezes ridge mixing (r9: split-R-hat "
                        "stuck ~5.5); eliminating the walls instead of "
                        "enforcing them is the fix")
    p.add_argument("--power", default="1",
                   help="power-logit exponent selection for logit-dense: "
                        "'auto' sets k=8 (log-like bulk) for every "
                        "parameter whose trace stays below 0.8 of its box "
                        "width and k=1 (plain logit) otherwise — the "
                        "beta*kappa NPI degeneracies are straight lines in "
                        "log space but bananas under plain logit (measured: "
                        "quadratic fit removes 80%% vs 1%% of the "
                        "transverse width), and a curved valley defeats any "
                        "fixed dense mass; a number sets a uniform k")
    p.add_argument("--mass-file", default=None,
                   help="mass .npz with mu/scale in logit-y space (from "
                        "scripts/make_capped_mass.py) for --mass logit-file")
    p.add_argument("--trace", default=None,
                   help="samples.npz from a previous campaign (for "
                        "--mass empirical-dense)")
    p.add_argument("--warm", default=None,
                   help="samples.npz whose final iteration warm-starts the "
                        "ensemble (chains continue from those positions)")
    p.add_argument("--resume", action="store_true",
                   help="resume a checkpointed run from <out>/nuts_state.npz "
                        "+ <out>/partial_samples.npz (written after every "
                        "segment); the continuation is bit-identical to the "
                        "uninterrupted run (same seed-derived key table, "
                        "sliced at the checkpointed iteration)")
    p.add_argument("--posterior",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "posterior_samples.npz"))
    p.add_argument("--laplace",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "laplace_mass.npz"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--bwd-block", type=int, default=512,
                   help="Pallas adjoint bwd_block_b (bwd lanes = value // 2; "
                        "512 is the conservative default — run "
                        "scripts/adjoint_lane_probe.py and pass the winner)")
    p.add_argument("--init",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"))
    p.add_argument("--out",
                   default=os.path.join(REPO, "results", "spain2020_nuts"))
    p.add_argument("--stages", type=int, default=1,
                   help="mass-refinement ladder depth (dense modes only): "
                        "each pre-final stage runs --stage-iterations, "
                        "re-estimates the dense mass from its post-warmup "
                        "draws, and warm-starts the next stage from its "
                        "final ensemble; only the final stage's draws form "
                        "the posterior")
    p.add_argument("--stage-iterations", type=int, default=0,
                   help="iterations per pre-final stage (0 -> 2x --warmup)")
    p.add_argument("--report", action="store_true",
                   help="regenerate the full analysis tree (PPC bands, Rt, "
                        "metrics, scenarios) from the campaign posterior")
    p.add_argument("--require-rhat", type=float, default=0.0,
                   help="exit nonzero unless BOTH max split-R-hat and max "
                        "rank-normalized R-hat land under this bar "
                        "(0 = no gate)")
    p.add_argument("--stop-when-converged", type=int, default=0,
                   help="stop the final stage early once the live "
                        "burned-window worst split- AND rank-R-hat have "
                        "stayed below "
                        "0.98 x --require-rhat for this many CONSECUTIVE "
                        "segments (and >= 100 burned iterations exist); "
                        "0 = run every iteration. The end-of-run gate still "
                        "re-checks the full split+rank diagnostics, and a "
                        "later --resume continues bit-exactly")
    p.add_argument("--serovalid", action="store_true",
                   help="sample the externally-validated (ENE-COVID-"
                        "consistent) problem instead of the reference-"
                        "bounds one: variant-C relaxed bounds "
                        "(calibration/serovalid.py, same derivation as "
                        "scripts/serovalid_pipeline.py) + the ENE-COVID "
                        "seroprevalence Gaussian data term added to the "
                        "Poisson stream log-likelihood")
    p.add_argument("--sero-se", type=float, default=0.0028,
                   help="sero-term standard error (serovalid mode); the "
                        "default is the ENE-COVID round-1 survey CI width")
    p.add_argument("--platform", default="default", choices=["default", "cpu"],
                   help="'cpu' forces the CPU backend (smoke tests; the "
                        "JAX_PLATFORMS env var cannot override the axon "
                        "sitecustomize, so this must be a config update)")
    p.add_argument("--max-dispatch-seconds", type=float, default=50.0,
                   help="upper bound on the ESTIMATED device time of one "
                        "XLA dispatch; --segments is raised (never lowered) "
                        "so every stage's dispatches fit. Measured on the "
                        "tunneled v5e (2026-08-19): dispatches of ~260 s "
                        "die UNAVAILABLE ~150 s in (13/13 attempts), while "
                        "55 s dispatches and 1-iteration (~15 s) dispatches "
                        "always survive. 2026-08-20: ~87 s dispatches died "
                        "4/4 at the FIRST execute RPC, so the deadline is "
                        "nearer 90 s than 2 min — stay at/below ~50 s")
    args = p.parse_args(argv)

    def dispatch_bounded_segments(n_iters: int) -> int:
        """Minimum segment count keeping each dispatch under the budget.

        Conservative model: every tree runs to the depth CAP (2^depth
        value-and-grads per chain per iteration) at the measured tunneled
        throughput floor of ~20k value-and-grads/s (probe_shortseg: 512
        chains x depth 10 -> ~13-16 s device per iteration; r4_probe_d10:
        64 chains x depth 10 -> 3.12 s/iter = 21k v&g/s, so the rate barely
        drops at small chain counts and 20k is a safe floor for both).
        """
        vag_rate = 20000.0
        iter_s = (2.0 ** args.depth) * args.chains / vag_rate
        per = max(1, int(args.max_dispatch_seconds / max(iter_s, 1e-9)))
        return max(1, -(-n_iters // per))

    args.segments = max(args.segments,
                        dispatch_bounded_segments(args.iterations))
    print(f"dispatch bound: {args.segments} segments over "
          f"{args.iterations} iterations "
          f"(~{args.iterations / args.segments:.1f} it/dispatch, "
          f"budget {args.max_dispatch_seconds:.0f}s)", flush=True)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # MMIDV1_JAX_CACHE_DIR overrides the persistent cache location (a fresh
    # temp dir gives honest cold-compile timings — bench.py BENCH_COLD=1)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MMIDV1_JAX_CACHE_DIR",
                                     os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    dtype = jnp.float32

    from mmidv1_tpu.calibration.nuts import (NUTSConfig, run_nuts_dense,
                                             run_nuts_whitened)
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.data.config_io import save_calibration_results
    from mmidv1_tpu.utils.checkpoint import write_posterior_trace

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    # fast-fail a wedged tunnel session (rc=7, retryable by the autopilot)
    # before committing to the pipeline's long silent compile
    from mmidv1_tpu.utils.tpu_guard import assert_first_rpc_responsive
    assert_first_rpc_responsive()
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    M = params.M_baseline

    sero_pen = None
    if args.serovalid:
        from mmidv1_tpu.calibration.serovalid import (make_sero_penalty,
                                                      relax_bounds)
        space, relaxed_idx = relax_bounds(space)
        sero_pen = make_sero_penalty(space, params, data, ts,
                                     substeps=args.substeps,
                                     tableau=args.tableau, se=args.sero_se,
                                     constraint_mode=REFLECT, dtype=dtype)
        print(f"serovalid mode: variant-C relaxed bounds "
              f"({len(relaxed_idx)} parameters) + ENE-COVID sero term "
              f"(se {args.sero_se})")

    ll_stream = build_objective(space, params, data, ts,
                                substeps=args.substeps,
                                tableau=args.tableau,
                                constraint_mode=REFLECT, dtype=dtype)
    if sero_pen is None:
        loglik = ll_stream
    else:
        def loglik(theta):
            return ll_stream(theta) + sero_pen(theta)
    vag = None
    if args.engine == "pallas" and dev.platform == "tpu":
        from mmidv1_tpu.ops import build_objective_pallas_grad
        vag = build_objective_pallas_grad(
            space, params, data, ts, substeps=args.substeps,
            tableau=args.tableau, constraint_mode=REFLECT, dtype=dtype,
            block_b=min(2048, args.chains), bwd_block_b=args.bwd_block)
        if sero_pen is not None:
            # the Pallas kernels compute the Poisson-stream v&g; the sero
            # term (one extra fixed-grid solve) rides XLA autodiff and the
            # two gradients add — exact, engine-agnostic composition
            pen_vag = jax.vmap(jax.value_and_grad(sero_pen))
            stream_vag = vag

            def vag(thetas):
                v1, g1 = stream_vag(thetas)
                v2, g2 = pen_vag(thetas)
                return v1 + v2, g1 + g2
            print("gradient engine: Pallas forward+adjoint kernels "
                  "+ XLA sero-term grads")
        else:
            print("gradient engine: Pallas forward+adjoint kernels")
    else:
        print("gradient engine: XLA jax.value_and_grad")

    init = read_sepaihrd_parameters(args.init, 4, N=data.population_by_age,
                                    M_baseline=M, dtype=dtype)
    theta0 = space.extract(init).astype(dtype)

    if args.mass == "posterior":
        import dataclasses
        post = np.load(args.posterior)
        assert list(post["names"]) == list(space.names)
        std = post["samples"].std(axis=0, ddof=1).astype(np.float64)
        std = np.maximum(std, 1e-12)
        print(f"mass matrix: diag posterior stds from {args.posterior} "
              f"(range {std.min():.2e}..{std.max():.2e})")
        space = dataclasses.replace(space, sigmas=std)
    elif args.mass in ("laplace", "laplace-dense"):
        import dataclasses
        lap = np.load(args.laplace)
        assert list(lap["names"]) == list(space.names)
        std = np.maximum(lap["std"].astype(np.float64), 1e-12)
        theta0 = jnp.asarray(lap["theta_map"], dtype)
        print(f"mass matrix: Laplace ({args.mass}) from {args.laplace} "
              f"(std range {std.min():.2e}..{std.max():.2e}); chains start "
              f"at the polished MAP (LL {float(lap['ll_map']):.8e})")
        if args.mass == "laplace":
            space = dataclasses.replace(space, sigmas=std)
        else:
            free = lap["free"]
            cov = np.diag(std ** 2)
            cov[np.ix_(free, free)] = lap["cov_free"]
            dense_scale = np.linalg.cholesky(cov)
    elif args.mass == "empirical-dense":
        assert args.trace, "--mass empirical-dense needs --trace samples.npz"
        tr = np.load(args.trace)
        assert list(tr["names"]) == list(space.names)
        flat_tr = tr["samples"].reshape(-1, space.dim).astype(np.float64)
        cov_emp = np.cov(flat_tr, rowvar=False)
        # 10% diagonal shrinkage keeps the factor PD when the trace is short
        diag = np.diag(np.maximum(np.diag(cov_emp), 1e-24))
        cov = 0.9 * cov_emp + 0.1 * diag
        dense_scale = np.linalg.cholesky(cov)
        lap = np.load(args.laplace)
        theta0 = jnp.asarray(lap["theta_map"], dtype)
        print(f"mass matrix: dense empirical covariance of {args.trace} "
              f"({flat_tr.shape[0]} draws; marginal-std range "
              f"{np.sqrt(np.diag(cov)).min():.2e}.."
              f"{np.sqrt(np.diag(cov)).max():.2e})")
    elif args.mass == "logit-dense":
        assert args.trace, "--mass logit-dense needs --trace samples.npz"
        from mmidv1_tpu.calibration.nuts import logit_transform
        tr = np.load(args.trace)
        assert list(tr["names"]) == list(space.names)
        lo_np = np.asarray(space.lower, np.float64)
        hi_np = np.asarray(space.upper, np.float64)
        flat_tr = tr["samples"].reshape(-1, space.dim).astype(np.float64)
        if args.power == "auto":
            u_hi = np.quantile((flat_tr - lo_np) / (hi_np - lo_np),
                               0.995, axis=0)
            power_k = np.where(u_hi < 0.8, 8.0, 1.0)
            print(f"power-logit: k=8 (log-like) for "
                  f"{int((power_k > 1).sum())}/{space.dim} parameters, "
                  f"k=1 for the rest")
        else:
            power_k = np.full(space.dim, float(args.power))
        y_tr = logit_transform(flat_tr, lo_np, hi_np, power=power_k)
        mu_y = y_tr.mean(axis=0)
        cov_emp = np.cov(y_tr, rowvar=False)
        diag = np.diag(np.maximum(np.diag(cov_emp), 1e-24))
        cov = 0.9 * cov_emp + 0.1 * diag
        # wall-pinned parameters (clamped at the box edge in the source
        # trace) transform to a near-constant y column whose empirical std
        # is an artifact of the transform's clip; their true y-scale is the
        # tail's O(1) exponential width — floor the marginal std so the
        # whitening neither magnifies the direction ~1e4x nor freezes it
        y_std_floor = 0.25
        add = np.maximum(y_std_floor ** 2 - np.diag(cov), 0.0)
        cov = cov + np.diag(add)
        dense_scale = np.linalg.cholesky(cov)
        print(f"mass matrix: logit-space dense covariance of {args.trace} "
              f"({y_tr.shape[0]} draws; y-marginal-std range "
              f"{np.sqrt(np.diag(cov)).min():.2e}.."
              f"{np.sqrt(np.diag(cov)).max():.2e}; "
              f"{int((add > 0).sum())} wall-pinned stds floored at "
              f"{y_std_floor})")
    elif args.mass == "logit-file":
        assert args.mass_file, "--mass logit-file needs --mass-file mass.npz"
        lo_np = np.asarray(space.lower, np.float64)
        hi_np = np.asarray(space.upper, np.float64)
        mf = np.load(args.mass_file)
        assert list(mf["names"]) == list(space.names)
        mu_y = mf["mu"].astype(np.float64)
        dense_scale = mf["scale"].astype(np.float64)
        power_k = (mf["power"].astype(np.float64) if "power" in mf.files
                   else np.ones(space.dim))
        sd = np.sqrt((dense_scale ** 2).sum(axis=1))
        print(f"mass matrix: precomputed logit-space factor {args.mass_file} "
              f"(curvature-capped; y-marginal-std range "
              f"{sd.min():.2e}..{sd.max():.2e})")

    warm_init = None
    if args.warm:
        wtr = np.load(args.warm)
        last = wtr["samples"][-1]            # (B_prev, d) final ensemble
        if last.shape[0] >= args.chains:
            warm_init = last[:args.chains]
        else:                                # tile + tiny resample
            reps = -(-args.chains // last.shape[0])
            warm_init = np.tile(last, (reps, 1))[:args.chains]
        print(f"warm start: ensemble from the final iteration of {args.warm}")

    cfg = NUTSConfig(iterations=args.iterations,
                     adaptation_window=args.warmup,
                     max_tree_depth=args.depth,
                     delta_target=args.delta_target,
                     eps_floor=args.eps_floor, eps_ceil=args.eps_ceil)

    # The z-coordinate checkpoint decodes only under the mass that was active
    # when it was written (utils/checkpoint.py::save_nuts_state docstring).
    # Staged runs REFRESH the mass between stages, so the final stage's
    # factor must persist alongside the checkpoint for --resume to decode the
    # state correctly — recomputing from --trace would silently shift every
    # chain position.
    mass_path = None  # set after args.out exists

    def save_active_mass(mu, scale, power=None):
        kw = dict(names=np.asarray(space.names),
                  mu=np.asarray(mu, np.float64),
                  scale=np.asarray(scale, np.float64))
        if power is not None:
            kw["power"] = np.asarray(power, np.float64)
        tmp = mass_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **kw)
        os.replace(tmp, mass_path)

    # -- segment-level checkpointing: every completed segment persists the
    # sampler state + all samples so far, so a killed multi-hour run loses at
    # most one segment (tunneled-TPU RPCs drop; --resume continues exactly)
    from mmidv1_tpu.utils.checkpoint import load_nuts_state, save_nuts_state
    os.makedirs(args.out, exist_ok=True)
    mass_path = os.path.join(args.out, "active_mass.npz")
    state_path = os.path.join(args.out, "nuts_state.npz")
    partial_path = os.path.join(args.out, "partial_samples.npz")
    prev_xs, prev_lps = [], []
    initial_state = None
    DENSE_MODES = ("laplace-dense", "empirical-dense", "logit-dense",
                   "logit-file")
    if args.stages > 1 and args.mass not in DENSE_MODES:
        p.error("--stages > 1 requires a dense mass mode")
    if args.stages > 1 and (args.stage_iterations or
                            2 * args.warmup) <= args.warmup:
        p.error("--stage-iterations must exceed --warmup: each pre-final "
                "stage re-estimates the mass from its POST-warmup draws, "
                "and a stage shorter than the warmup has none")
    if args.resume and args.stages > 1:
        p.error("--resume continues a single-stage run; rerun the final "
                "stage alone (its mass is already on disk via --trace)")
    import glob as glob_mod
    seg_glob = os.path.join(args.out, "partial_samples_[0-9]*.npz")
    if args.resume:
        # resume is only wired through run_nuts_dense (the checkpointed
        # state lives in z-coordinates of the dense mass); a whitened-mode
        # "resume" would silently restart from scratch and then substitute
        # the stale partial trace for the fresh samples
        if args.mass not in DENSE_MODES:
            p.error("--resume requires a dense mass mode "
                    "(laplace-dense / empirical-dense / logit-dense)")
        if not os.path.exists(state_path):
            p.error(f"--resume: no checkpoint at {state_path}")
        seg_files = sorted(glob_mod.glob(seg_glob))
        if os.path.exists(partial_path):     # legacy cumulative format:
            seg_files.insert(0, partial_path)  # always the oldest chunk
        if not seg_files:
            # without the partial trace the resumed run's samples would
            # start mid-campaign and the warmup slice below would drop
            # non-warmup draws
            p.error(f"--resume: checkpoint exists but no partial samples in "
                    f"{args.out}; cannot reconstruct the full trace")
        initial_state = load_nuts_state(state_path)
        if os.path.exists(mass_path):
            with np.load(mass_path) as mz:
                assert list(mz["names"]) == list(space.names)
                if args.mass in ("logit-dense", "logit-file"):
                    mu_y = mz["mu"].astype(np.float64)
                    if "power" in mz.files:
                        power_k = mz["power"].astype(np.float64)
                else:
                    theta0 = jnp.asarray(mz["mu"], dtype)
                dense_scale = mz["scale"].astype(np.float64)
            print("resume: active mass restored from active_mass.npz "
                  "(the checkpointed z-state decodes only under it)")
        else:
            # the checkpointed z-state decodes only under the mass that was
            # active when it was written; recomputing it from --trace would
            # silently shift every chain position
            if args.mass in ("logit-dense", "logit-file"):
                p.error(f"--resume: {mass_path} is missing and the logit "
                        "z-checkpoint cannot be decoded without the exact "
                        "active mass; restore the file or restart")
            print("WARNING: resume without active_mass.npz — falling back "
                  "to the mass recomputed from the CLI inputs; if the "
                  "original run refreshed its mass (--stages) every chain "
                  "position will silently shift. Backfilling the file so "
                  "the NEXT resume is protected.", flush=True)
            save_active_mass(np.asarray(theta0), dense_scale)
        for f in seg_files:
            with np.load(f) as z:
                prev_xs.append(z["samples"])
                prev_lps.append(z["logps"])
        # reconcile the partial trace against the checkpoint: the partial
        # file is written BEFORE the state (state = commit point), so a
        # crash in between leaves extra UNCHECKPOINTED draws that the
        # resumed run will re-draw bit-exactly — drop them, both in memory
        # and on disk (a stale on-disk tail would corrupt the NEXT resume)
        it_ck = int(initial_state.it)
        total = sum(x.shape[0] for x in prev_xs)
        if total > it_ck:
            print(f"dropping {total - it_ck} uncheckpointed draws "
                  f"(crash between partial write and state save)")
            drop = total - it_ck
            while drop > 0 and prev_xs:
                take = min(drop, prev_xs[-1].shape[0])
                keep = prev_xs[-1].shape[0] - take
                src = seg_files[len(prev_xs) - 1]
                if keep == 0:
                    prev_xs.pop()
                    prev_lps.pop()
                    os.remove(src)
                else:
                    prev_xs[-1] = prev_xs[-1][:keep]
                    prev_lps[-1] = prev_lps[-1][:keep]
                    np.savez(src + ".rewrite", samples=prev_xs[-1],
                             logps=prev_lps[-1])
                    os.replace(src + ".rewrite.npz", src)
                drop -= take
        elif total < it_ck:
            p.error(f"--resume: partial files hold {total} iterations but "
                    f"the checkpoint is at {it_ck}; the trace has a hole "
                    f"and cannot be reconstructed — restart without --resume")
        print(f"resuming from iteration {it_ck} "
              f"({len(prev_xs)} partial files)")
    else:
        # a fresh run must not inherit another campaign's partial files —
        # they would be concatenated into the posterior on a later --resume
        # (nor its active mass: it is rewritten at this run's final stage)
        if os.path.exists(mass_path):
            os.remove(mass_path)
        for f in glob_mod.glob(seg_glob):
            os.remove(f)
        for f in glob_mod.glob(os.path.join(args.out, ".tmp_partial_*.npz")):
            os.remove(f)
        if os.path.exists(partial_path):
            os.remove(partial_path)

    seg_counter = {"n": len(prev_xs)}
    stop_streak = {"n": 0}
    # live-monitor accumulator: a <=128-chain subset of every segment, kept
    # incrementally (concatenating the FULL trace each segment would copy
    # O(segments x total) bytes — ~50 GB over a production campaign)
    mon_xs = [x[:, :: max(1, x.shape[1] // 128), :] for x in prev_xs]

    def on_segment(state, xs, lps):
        xs, lps = np.asarray(xs), np.asarray(lps)
        prev_xs.append(xs)
        prev_lps.append(lps)
        # partial file FIRST, sampler state LAST: the state checkpoint is
        # the commit point. A crash between the two writes leaves one EXTRA
        # partial, which --resume truncates back to state.it and re-runs
        # bit-exactly; the reverse order would leave a hole in the trace
        # that --resume could not detect. The tmp name is dot-prefixed so a
        # truncated leftover can never match the resume glob.
        f = os.path.join(args.out,
                         f"partial_samples_{seg_counter['n']:04d}.npz")
        tmp = os.path.join(args.out,
                           f".tmp_partial_{seg_counter['n']:04d}.npz")
        np.savez(tmp, samples=xs, logps=lps)
        os.replace(tmp, f)
        save_nuts_state(state_path, state)
        seg_counter["n"] += 1
        # live convergence read on the accumulated post-warmup draws (chain
        # subset; host-side NumPy) so a long TPU campaign can be steered —
        # extended, restaged, or stopped early — without waiting for the end
        mon_xs.append(xs[:, :: max(1, xs.shape[1] // 128), :])
        acc = np.concatenate(mon_xs, axis=0)
        if acc.shape[0] > args.warmup + 20:
            from mmidv1_tpu.analysis.diagnostics import split_rhat
            r = split_rhat(acc[args.warmup:])
            worst = np.argsort(-r)[:3]
            stat = ", ".join(f"{space.names[j]} {r[j]:.2f}" for j in worst)
            # the gate slice (post-warmup head burned): the full-trace number
            # is dilution-biased low while chains still hold offsets — the
            # burned window is what --require-rhat will actually see
            if args.posterior_burn_iters > 0:
                nb = args.warmup + min(
                    args.posterior_burn_iters,
                    int(0.9 * max(0, acc.shape[0] - args.warmup)))
            else:
                nb = args.warmup + int(args.posterior_burn_frac
                                       * (acc.shape[0] - args.warmup))
            rb = split_rhat(acc[nb:]) if acc.shape[0] - nb > 20 else r
            # the end-of-run gate (below) requires max(split, RANK) under
            # the bar, and rank-normalized R-hat runs ~0.03 ABOVE split on
            # this posterior — an early stop keyed on split alone fires
            # while rank still fails, and every extension then early-stops
            # after --stop-when-converged segments (~30 iters) just to
            # fail the same end gate: ~7 min of restart overhead per 30
            # iterations of progress. Gate the stop on BOTH statistics.
            # Rank-normalization (rankdata over the full kept window) costs
            # ~10-20 s of host time per segment on a production window —
            # a ~15-25% throughput tax — so compute it only once split is
            # within 0.03 of the stop bar (it exists purely to gate the
            # stop; while split itself fails, rank cannot pass either).
            # safety margin on the EXCESS over 1.0 (not the raw gate):
            # 0.98 * 1.01 < 1.0 would make a tight gate unreachable —
            # split-R-hat essentially never dips below 1.0
            stop_bar = 1.0 + 0.98 * (args.require_rhat - 1.0)
            rkb = None
            if (args.require_rhat > 1.0 and acc.shape[0] - nb > 20
                    and float(np.max(rb)) < stop_bar + 0.03):
                from mmidv1_tpu.analysis.diagnostics import \
                    rank_normalized_rhat
                rkb = float(np.max(rank_normalized_rhat(acc[nb:])))
            print(f"  [seg @ iter {int(state.it)}] worst split-R-hat: {stat}"
                  f" | burned-window worst {float(np.max(rb)):.2f}"
                  + (f" (rank {rkb:.2f})" if rkb is not None else ""),
                  flush=True)
            if (args.stop_when_converged > 0 and args.require_rhat > 1.0
                    and acc.shape[0] - nb >= 100
                    and rkb is not None
                    and max(float(np.max(rb)), rkb) < stop_bar):
                stop_streak["n"] += 1
                if stop_streak["n"] >= args.stop_when_converged:
                    print(f"  [seg @ iter {int(state.it)}] EARLY STOP: "
                          f"burned-window worst split- AND rank-R-hat "
                          f"under {stop_bar:.3f} for "
                          f"{stop_streak['n']} consecutive segments",
                          flush=True)
                    return True
            else:
                stop_streak["n"] = 0

    t0 = time.perf_counter()
    if args.mass in ("logit-dense", "logit-file"):
        from mmidv1_tpu.calibration.nuts import run_nuts_logit
        power_vec = jnp.asarray(power_k, dtype)
        stage_iters = args.stage_iterations or 2 * args.warmup
        for stage in range(args.stages - 1):
            s_cfg = NUTSConfig(iterations=stage_iters,
                               adaptation_window=args.warmup,
                               max_tree_depth=args.depth,
                               delta_target=args.delta_target,
                               eps_floor=args.eps_floor,
                               eps_ceil=args.eps_ceil)
            res = run_nuts_logit(loglik, space,
                                 jax.random.fold_in(
                                     jax.random.PRNGKey(args.seed), stage + 1),
                                 s_cfg, mu=jnp.asarray(mu_y, dtype),
                                 scale=jnp.asarray(dense_scale, dtype),
                                 n_chains=args.chains, jitter=args.jitter,
                                 value_and_grad_batch=vag,
                                 segments=max(
                                     args.segments * stage_iters
                                     // max(args.iterations, 1),
                                     dispatch_bounded_segments(stage_iters)),
                                 init=warm_init, power=power_vec)
            jax.block_until_ready(res.samples)
            draws = np.asarray(
                res.samples[args.warmup:]).reshape(-1, space.dim)
            y_draws = logit_transform(draws.astype(np.float64), lo_np,
                                      hi_np, power=power_k)
            mu_y = y_draws.mean(axis=0)
            cov_emp = np.cov(y_draws, rowvar=False)
            dg = np.diag(np.maximum(np.diag(cov_emp), 1e-24))
            cov_s = 0.9 * cov_emp + 0.1 * dg
            cov_s += np.diag(np.maximum(0.25 ** 2 - np.diag(cov_s), 0.0))
            dense_scale = np.linalg.cholesky(cov_s)
            warm_init = np.asarray(res.samples[-1])
            print(f"stage {stage + 1}/{args.stages}: logit-space mass "
                  f"refreshed from {draws.shape[0]} draws (y-marginal-std "
                  f"range {np.sqrt(np.diag(cov_s)).min():.2e}.."
                  f"{np.sqrt(np.diag(cov_s)).max():.2e})", flush=True)
        if not args.resume:
            save_active_mass(mu_y, dense_scale, power_k)
        res = run_nuts_logit(loglik, space, jax.random.PRNGKey(args.seed),
                             cfg, mu=jnp.asarray(mu_y, dtype),
                             scale=jnp.asarray(dense_scale, dtype),
                             n_chains=args.chains, jitter=args.jitter,
                             value_and_grad_batch=vag,
                             segments=args.segments,
                             init=warm_init,
                             initial_state=initial_state,
                             on_segment=on_segment, power=power_vec)
    elif args.mass in ("laplace-dense", "empirical-dense"):
        # optional mass-refinement ladder: each pre-final stage runs a short
        # adaptation campaign, then the dense mass is re-estimated from ITS
        # post-warmup draws and the next stage warm-starts from its final
        # ensemble (the measured two-stage recipe — the Laplace mass
        # under-scales soft directions ~6x; real HMC draws are the right
        # width — generalized to N stages). Only the final stage's draws
        # form the posterior; only the final stage checkpoints.
        stage_iters = args.stage_iterations or 2 * args.warmup
        for stage in range(args.stages - 1):
            s_cfg = NUTSConfig(iterations=stage_iters,
                               adaptation_window=args.warmup,
                               max_tree_depth=args.depth,
                               delta_target=args.delta_target,
                               eps_floor=args.eps_floor,
                               eps_ceil=args.eps_ceil)
            res = run_nuts_dense(loglik, space,
                                 jax.random.fold_in(
                                     jax.random.PRNGKey(args.seed), stage + 1),
                                 s_cfg, mu=theta0,
                                 scale=jnp.asarray(dense_scale, dtype),
                                 n_chains=args.chains, jitter=args.jitter,
                                 value_and_grad_batch=vag,
                                 segments=max(
                                     args.segments // 4,
                                     dispatch_bounded_segments(stage_iters)),
                                 init=warm_init)
            jax.block_until_ready(res.samples)
            draws = np.asarray(
                res.samples[args.warmup:]).reshape(-1, space.dim)
            cov_emp = np.cov(draws.astype(np.float64), rowvar=False)
            dg = np.diag(np.maximum(np.diag(cov_emp), 1e-24))
            dense_scale = np.linalg.cholesky(0.9 * cov_emp + 0.1 * dg)
            warm_init = np.asarray(res.samples[-1])
            print(f"stage {stage + 1}/{args.stages}: mass refreshed from "
                  f"{draws.shape[0]} draws (marginal-std range "
                  f"{np.sqrt(np.diag(cov_emp)).min():.2e}.."
                  f"{np.sqrt(np.diag(cov_emp)).max():.2e})")
        if not args.resume:
            save_active_mass(np.asarray(theta0), dense_scale)
        res = run_nuts_dense(loglik, space, jax.random.PRNGKey(args.seed),
                             cfg, mu=theta0,
                             scale=jnp.asarray(dense_scale, dtype),
                             n_chains=args.chains, jitter=args.jitter,
                             value_and_grad_batch=vag,
                             segments=args.segments,
                             init=warm_init,
                             initial_state=initial_state,
                             on_segment=on_segment)
    else:
        # --warm threads through as a 2-D theta0 (run_nuts warm-ensemble
        # form; the sigma whitening is a broadcastable scaling)
        w_theta0 = (jnp.asarray(warm_init, dtype) if warm_init is not None
                    else theta0)
        res = run_nuts_whitened(loglik, space, w_theta0,
                                jax.random.PRNGKey(args.seed), cfg,
                                n_chains=args.chains, jitter=args.jitter,
                                value_and_grad_batch=vag,
                                segments=args.segments)
    jax.block_until_ready(res.samples)
    wall_proc = time.perf_counter() - t0
    # total campaign wall: a resumed/extended run accumulates the previous
    # completed run's wall (from its metadata), so min-ESS/s divides the
    # full trace by the full time, not just this process's share (a crashed
    # run leaves no metadata — its time is undercounted, which only makes
    # the reported throughput conservative)
    wall = wall_proc
    if args.resume:
        prev_meta_path = os.path.join(args.out, "campaign_metadata.json")
        if os.path.exists(prev_meta_path):
            try:
                with open(prev_meta_path) as f:
                    wall += float(json.load(f).get("wall_seconds", 0.0))
            except Exception:
                pass
    if prev_xs:
        # full history (pre-resume parts + this process's parts)
        res = res._replace(
            samples=jnp.asarray(np.concatenate(prev_xs, axis=0)),
            sample_logps=jnp.asarray(np.concatenate(prev_lps, axis=0)))
    # Every iteration costs up to 2^depth leapfrogs = value_and_grad calls
    # over the whole ensemble (masked trees run full depth — batched design).
    iters_run = args.iterations - (int(initial_state.it)
                                   if initial_state is not None else 0)
    grads = max(iters_run, 1) * (2 ** args.depth) * args.chains
    print(f"campaign: {args.iterations} iters x {args.chains} chains in "
          f"{wall_proc:.0f}s this process "
          f"({grads / wall_proc:.3e} value_and_grads/s incl. host; "
          f"{wall:.0f}s campaign total)")
    print(f"mean accept-stat {float(np.mean(np.asarray(res.mean_accept))):.3f}; "
          f"median step size {float(np.median(np.asarray(res.step_sizes))):.4f} "
          "(whitened units); "
          f"mean tree depth {float(np.mean(np.asarray(res.mean_depth))):.2f}"
          f"/{args.depth}")

    os.makedirs(args.out, exist_ok=True)
    total_T = int(res.samples.shape[0])
    if args.posterior_burn_iters > 0:
        burn = args.warmup + min(args.posterior_burn_iters,
                                 int(0.9 * max(0, total_T - args.warmup)))
        burn_desc = f"absolute --posterior-burn-iters {args.posterior_burn_iters}"
    else:
        burn = args.warmup + int(args.posterior_burn_frac
                                 * max(0, total_T - args.warmup))
        burn_desc = f"{args.posterior_burn_frac:.0%} of {total_T - args.warmup}"
    burn = min(burn, max(total_T - 8, args.warmup))
    if burn > args.warmup:
        print(f"posterior: discarding {burn - args.warmup} post-warmup "
              f"burn-in draws ({burn_desc}); keeping {total_T - burn}")
    samples = np.asarray(res.samples[burn:])
    logps = np.asarray(res.sample_logps[burn:])
    np.savez_compressed(os.path.join(args.out, "samples.npz"),
                        samples=samples, logps=logps,
                        names=np.array(list(space.names)))
    write_posterior_trace(os.path.join(args.out, "posterior_trace.csv"),
                          samples, logps, list(space.names))

    from mmidv1_tpu.analysis.diagnostics import summarize
    sub = samples[:, :: max(1, samples.shape[1] // 512), :]
    diag = summarize(sub, list(space.names))
    max_rhat = max(v["rhat"] for v in diag.values())
    max_rank_rhat = max(v["rank_rhat"] for v in diag.values())
    min_ess = min(v["ess"] for v in diag.values())
    print(f"convergence: max split-R-hat {max_rhat:.3f} "
          f"(rank-normalized {max_rank_rhat:.3f}), min ESS {min_ess:.0f}"
          f" -> min-ESS/s {min_ess / wall:.2f}")

    if args.report:
        # full analysis tree from the posterior (PPC bands, Rt, metrics,
        # scenarios — same layer production_campaign.py uses); must run
        # BEFORE the x64 flip below, which changes every jitted dtype
        from mmidv1_tpu.analysis import generate_full_report
        out = generate_full_report(samples, space, params, data, ts,
                                   args.out, num_samples_for_ppc=200,
                                   batch_size=1024, substeps=args.substeps,
                                   tableau=args.tableau, seed=args.seed)
        print(f"report over {out['n_draws']} draws -> {args.out}")

    # float64 MAP re-selection over per-chain bests (f32 noise floor ~1e2 at
    # LL ~1.4e6 — PARITY.md reproducibility note 2)
    jax.config.update("jax_enable_x64", True)
    params64 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)
    ll64 = build_objective(space, params64, data, ts, substeps=args.substeps,
                           tableau=args.tableau,
                           constraint_mode=REFLECT, dtype=jnp.float64)
    flat = samples.reshape(-1, space.dim)
    top = flat[np.argsort(logps.reshape(-1))[-256:]]
    cands = jnp.asarray(np.concatenate(
        [np.asarray(res.best_x)[None], top], axis=0), jnp.float64)
    lls = np.asarray(jax.jit(jax.vmap(ll64))(cands))
    k = int(np.argmax(lls))
    print(f"float64 MAP over {len(lls)} candidates: {float(lls[k]):.8e} "
          f"({'BEATS' if lls[k] > REFERENCE_BEST_LL else 'below'} reference)")
    map_params = space.apply(params64, cands[k])
    save_calibration_results(
        os.path.join(args.out, "calibrated_parameters.txt"), map_params,
        list(space.names), float(lls[k]))

    meta = {"sampler": f"nuts_{args.mass}", "engine": args.engine,
            "chains": args.chains, "iterations": args.iterations,
            "warmup": args.warmup, "max_tree_depth": args.depth,
            "substeps": args.substeps, "tableau": args.tableau,
            "wall_seconds": wall,
            "value_and_grads_per_sec_incl_host": grads / wall_proc,
            "mean_accept": float(np.mean(np.asarray(res.mean_accept))),
            "mean_tree_depth": float(np.mean(np.asarray(res.mean_depth))),
            "best_logl_float64": float(lls[k]),
            "diagnostics": {"max_rhat": max_rhat,
                            "max_rank_rhat": max_rank_rhat,
                            "min_ess": min_ess,
                            "min_ess_per_sec": min_ess / wall,
                            "per_parameter": diag},
            "posterior_burn": {"iters": burn - args.warmup,
                               "policy": burn_desc,
                               "kept": total_T - burn},
            "seed": args.seed,
            "device": f"{dev.platform}/{dev.device_kind}"}
    if args.serovalid:
        # logps in samples.npz are the JOINT (Poisson + sero term) density;
        # best_logl_float64 above stays plain-Poisson for comparability
        from mmidv1_tpu.calibration.serovalid import (RUNUP_LO, SEED_CAP,
                                                      SEVERITY_FLOOR_DIV)
        meta["serovalid"] = {"sero_se": args.sero_se,
                             "seed_cap": SEED_CAP, "runup_lo": RUNUP_LO,
                             "severity_floor_div": SEVERITY_FLOOR_DIV}
    with open(os.path.join(args.out, "campaign_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"artifacts -> {args.out}")
    if args.require_rhat > 0:
        if max(max_rhat, max_rank_rhat) >= args.require_rhat:
            print(f"CONVERGENCE GATE FAILED: max(split {max_rhat:.3f}, "
                  f"rank {max_rank_rhat:.3f}) >= {args.require_rhat}")
            # 3, not 2: argparse's p.error exits with 2, and an unattended
            # driver must distinguish "ran but not converged" (extend with
            # --resume) from "bad invocation" (do not retry)
            return 3
        print(f"convergence gate passed (< {args.require_rhat})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

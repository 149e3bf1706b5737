#!/usr/bin/env python
"""Production MCMC campaign: segmented 8192-chain sampling on TPU.

The production counterpart of the reference's 100k-iteration single-chain run
(``data/configuration/mcmc_settings.txt``): an 8192-chain ensemble advances in
checkpointed segments (`run_mh_checkpointed`) with the Pallas fused objective,
writes a posterior trace per segment, float64-re-selects the MAP, and
regenerates the full analysis report from the campaign posterior.

Usage:
    python scripts/production_campaign.py [--chains 8192] [--iterations 20000]
        [--segments 20] [--thinning 500] [--out results/spain2020_campaign]
        [--init results/spain2020/calibrated_parameters.txt]
"""

import argparse
import glob as glob_mod
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
    p.add_argument("--chains", type=int, default=8192)
    p.add_argument("--iterations", type=int, default=20000)
    p.add_argument("--segments", type=int, default=20)
    p.add_argument("--burn-in", type=int, default=500)
    p.add_argument("--thinning", type=int, default=500)
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5",
                   help="fixed-grid RK tableau; cash_karp with --substeps 3 "
                        "is the measured-equal-accuracy fast config "
                        "(PARITY.md tableau table)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"))
    p.add_argument("--out",
                   default=os.path.join(REPO, "results", "spain2020_campaign"))
    p.add_argument("--skip-report", action="store_true")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64"],
                   help="float64 requires jax_enable_x64 (CPU smoke runs)")
    p.add_argument("--rungs", type=int, default=1,
                   help=">1 switches to replica-exchange (parallel "
                        "tempering): --chains chains split over this many "
                        "temperature rungs; posterior = the cold rung")
    p.add_argument("--beta-min", type=float, default=0.05,
                   help="hottest inverse temperature of the geometric ladder")
    p.add_argument("--proposal", default="am", choices=["am", "de"],
                   help="MH proposal family (rungs=1 only): 'am' adaptive "
                        "Metropolis, 'de' differential evolution (walker "
                        "differences - tracks the curved posterior manifold "
                        "measured on Spain-2020, where straight-line moves "
                        "lose likelihood 15-90x faster than the global "
                        "covariance predicts)")
    p.add_argument("--laplace", default=None,
                   help="path to a laplace_mass.npz (produced by "
                        "scripts/map_polish.py): start every chain at the "
                        "polished MAP, jitter and propose at the Laplace "
                        "posterior scale, and seed the adaptive-Metropolis "
                        "covariance with the Laplace covariance. Without "
                        "this, init/proposals ride the config proposal "
                        "sigmas, which are ~100-1000x wider than the true "
                        "posterior here (measured via the MAP Hessian)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32

    from mmidv1_tpu.analysis import generate_full_report
    from mmidv1_tpu.calibration.mh import MHConfig, run_mh_checkpointed
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.ops import build_objective_pallas
    from mmidv1_tpu.utils.checkpoint import write_posterior_trace

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    M = params.M_baseline

    loglik = build_objective(space, params, data, ts, substeps=args.substeps,
                             tableau=args.tableau,
                             constraint_mode=REFLECT, dtype=dtype)
    if dev.platform == "tpu" and args.dtype == "float32":
        ll_batch = build_objective_pallas(space, params, data, ts,
                                          substeps=args.substeps,
                                          tableau=args.tableau,
                                          constraint_mode=REFLECT,
                                          dtype=dtype,
                                          block_b=min(2048, args.chains))
    else:   # Pallas compiles only for TPU; CPU smoke runs use the XLA path
        ll_batch = None
    init = read_sepaihrd_parameters(args.init, 4, N=data.population_by_age,
                                    M_baseline=M, dtype=dtype)
    theta0 = space.extract(init)

    initial_cov = None
    if args.laplace:
        # Laplace warm start: MAP + curvature-scale init/proposals
        import dataclasses
        from mmidv1_tpu.calibration.calibrator import condition_covariance
        lap = np.load(args.laplace)
        assert list(lap["names"]) == list(space.names)
        std = np.maximum(lap["std"].astype(np.float64), 1e-12)
        theta0 = jnp.asarray(lap["theta_map"], dtype)
        space = dataclasses.replace(space,
                                    sigmas=jnp.asarray(std, dtype))
        d = space.dim
        free = lap["free"]
        cov = np.diag(std ** 2)
        cov[np.ix_(free, free)] = lap["cov_free"]
        initial_cov = condition_covariance(jnp.asarray(cov, dtype),
                                           space.sigmas.astype(dtype))
        print(f"Laplace warm start from {args.laplace}: MAP LL "
              f"{float(lap['ll_map']):.8e}, {int(free.sum())}/{d} free, "
              f"std range {std.min():.2e}..{std.max():.2e}")
    else:
        # warm proposal covariance from the committed posterior ensemble
        # (same conditioning as the phase-1 -> phase-2 transfer)
        post_path = os.path.join(os.path.dirname(args.init),
                                 "posterior_samples.npz")
        if os.path.exists(post_path):
            from mmidv1_tpu.calibration.calibrator import condition_covariance
            z = np.load(post_path)
            post = z["samples"].reshape(-1, space.dim)[-50000:]
            cov = np.cov(post.T)
            initial_cov = condition_covariance(
                jnp.asarray(cov, dtype), space.sigmas.astype(dtype))
            print(f"warm covariance from {post_path} ({post.shape[0]} draws)")

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    swap_rate = None
    resumed_any = False
    if args.rungs > 1:
        # replica-exchange campaign: --chains total slots split over the
        # temperature ladder; the returned samples are the cold rung's
        from mmidv1_tpu.calibration.tempering import (PTConfig, init_pt_state,
                                                      make_pt_runner)
        from mmidv1_tpu.utils.checkpoint import load_pt_state, save_pt_state

        n_per_rung, rem = divmod(args.chains, args.rungs)
        if rem:
            raise SystemExit("--chains must divide evenly by --rungs")
        per_segment = -(-args.iterations // args.segments)
        pt_cfg = PTConfig(iterations=per_segment, burn_in=args.burn_in,
                          adaptation_period=100, thinning=args.thinning,
                          n_rungs=args.rungs, beta_min=args.beta_min)
        ckpt = os.path.join(args.out, "campaign_checkpoint_pt.npz")
        ll_b = ll_batch if ll_batch is not None else jax.jit(jax.vmap(loglik))
        state, start = None, 0
        if os.path.exists(ckpt):
            resumed_any = True
            state = load_pt_state(ckpt)
            # run_pt rounds each segment UP to whole thinning blocks, so
            # divide by the steps actually run, not the nominal per_segment
            steps_per_segment = (-(-per_segment // args.thinning)
                                 * args.thinning)
            start = int(np.asarray(state.step)) // steps_per_segment
            print(f"resuming PT campaign at step {int(np.asarray(state.step))}")
        runner = make_pt_runner(space, pt_cfg, ll_b)
        res = None
        for s in range(start, args.segments):
            k_init, k_run = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), s))
            if state is None:
                state = init_pt_state(space, theta0, ll_b, k_init,
                                      n_rungs=args.rungs,
                                      n_chains=n_per_rung,
                                      initial_cov=initial_cov,
                                      betas=pt_cfg.ladder(dtype))
            res = runner(state, k_run)
            state = res.final_state
            # Persist each segment's cold-rung draws next to the checkpoint
            # so a resumed campaign's posterior covers pre-resume segments.
            np.savez_compressed(
                os.path.join(args.out, f"pt_segment_{s:04d}.npz"),
                samples=np.asarray(res.samples),
                sample_logps=np.asarray(res.sample_logps))
            save_pt_state(ckpt, state)
        if res is None:
            raise SystemExit("PT checkpoint already covers all segments")
        # Concatenate exactly the segments THIS campaign covers (0..segments),
        # not a bare glob: stale pt_segment files from an earlier, larger or
        # differently-configured run in the same out dir must not leak into
        # the posterior.
        seg_files = [os.path.join(args.out, f"pt_segment_{s:04d}.npz")
                     for s in range(args.segments)]
        missing = [f for f in seg_files if not os.path.exists(f)]
        if missing:
            raise SystemExit(f"missing PT segment files: {missing[:3]}...")
        stale = sorted(set(glob_mod.glob(
            os.path.join(args.out, "pt_segment_*.npz"))) - set(seg_files))
        if stale:
            print(f"WARNING: ignoring {len(stale)} stale pt_segment files "
                  f"beyond --segments {args.segments} (e.g. {stale[-1]})")
        all_xs, all_lps = [], []
        for f in seg_files:
            with np.load(f) as z:
                all_xs.append(z["samples"])
                all_lps.append(z["sample_logps"])
        all_samples = np.concatenate(all_xs, axis=0)
        all_logps = np.concatenate(all_lps, axis=0)
        # Drop draws recorded during burn-in: the temperature ladder is still
        # adapting there (pt_adapt_ladder freezes at step == burn_in), so
        # those draws come from a moving kernel and would contaminate both
        # the posterior and the split-R-hat diagnostics.
        n_burn_draws = min(args.burn_in // args.thinning, all_samples.shape[0] - 1)
        if n_burn_draws:
            print(f"dropping {n_burn_draws} stored burn-in draws "
                  f"(of {all_samples.shape[0]})")
        res = res._replace(
            samples=jnp.asarray(all_samples[n_burn_draws:]),
            sample_logps=jnp.asarray(all_logps[n_burn_draws:]))
        swap_rate = np.asarray(res.swap_rate)
        print(f"swap rates per rung pair: {np.round(swap_rate, 3)}")
        final_betas = np.asarray(res.final_state.betas)
        print(f"final (adapted) ladder: {np.round(final_betas, 4)}")
        print("per-pair swap-prob EMA: "
              f"{np.round(np.asarray(res.final_state.swap_prob), 3)}")
    else:
        cfg = MHConfig(iterations=args.iterations, burn_in=args.burn_in,
                       adaptation_period=100, thinning=args.thinning,
                       proposal=args.proposal)
        ckpt = os.path.join(args.out, "campaign_checkpoint.npz")
        resumed_mh = os.path.exists(ckpt)
        resumed_any = resumed_mh

        def persist_segment(s, seg_res):
            # per-segment sample files, written BEFORE the state checkpoint
            # (run_mh_checkpointed calls this first): run_mh_checkpointed's
            # returned samples cover only THIS process, so a resumed
            # campaign's posterior must be reassembled from these
            np.savez_compressed(
                os.path.join(args.out, f"mh_segment_{s:04d}.npz"),
                samples=np.asarray(seg_res.samples),
                sample_logps=np.asarray(seg_res.sample_logps))

        if not resumed_mh:
            # fresh campaign: segment files from an older run in the same
            # out dir must not leak into this posterior
            for f in glob_mod.glob(os.path.join(args.out,
                                                "mh_segment_*.npz")):
                os.remove(f)
        res = run_mh_checkpointed(
            loglik, space, theta0, jax.random.PRNGKey(args.seed), cfg,
            n_chains=args.chains, segments=args.segments,
            checkpoint_path=ckpt,
            initial_cov=initial_cov, loglik_batch=ll_batch,
            on_segment=persist_segment)
        if resumed_mh:
            seg_files = [os.path.join(args.out, f"mh_segment_{s:04d}.npz")
                         for s in range(args.segments)]
            missing = [f for f in seg_files if not os.path.exists(f)]
            if missing:
                raise SystemExit(
                    f"resumed MH campaign is missing segment files "
                    f"{missing[:3]}... (pre-resume segments ran without "
                    f"persistence?) — rerun without the checkpoint for a "
                    f"fresh campaign")
            all_xs, all_lps = [], []
            for f in seg_files:
                with np.load(f) as z:
                    all_xs.append(z["samples"])
                    all_lps.append(z["sample_logps"])
            res = res._replace(
                samples=jnp.asarray(np.concatenate(all_xs, axis=0)),
                sample_logps=jnp.asarray(np.concatenate(all_lps, axis=0)))
            print(f"resumed posterior reassembled from {len(seg_files)} "
                  f"segment files (pre-resume draws included)")
    wall = time.perf_counter() - t0
    # a resumed campaign accumulates the previous completed run's wall so
    # chain-steps/s divides total steps by total time (final_state.step
    # includes pre-resume steps)
    prev_meta_path = os.path.join(args.out, "campaign_metadata.json")
    if resumed_any and os.path.exists(prev_meta_path):
        try:
            with open(prev_meta_path) as f:
                wall += float(json.load(f).get("wall_seconds", 0.0))
        except Exception:
            pass
    steps = int(np.asarray(res.final_state.step)) * args.chains
    print(f"campaign: {args.iterations} iters x {args.chains} chains in "
          f"{wall:.0f}s ({steps/wall:.3e} chain-steps/s incl. host overhead)")
    print(f"mean acceptance {float(np.mean(np.asarray(res.acceptance_rate))):.3f}")

    samples = np.asarray(res.samples)
    write_posterior_trace(os.path.join(args.out, "posterior_trace.csv"),
                          samples, np.asarray(res.sample_logps),
                          list(space.names))

    # convergence diagnostics over a chain subset (host-side NumPy)
    from mmidv1_tpu.analysis.diagnostics import summarize

    sub = samples[:, :: max(1, samples.shape[1] // 512), :]
    diag = summarize(sub, list(space.names))
    print(f"convergence: max split-R-hat "
          f"{max(v['rhat'] for v in diag.values()):.3f}, min ESS "
          f"{min(v['ess'] for v in diag.values()):.0f}")

    if not args.skip_report:
        out = generate_full_report(samples, space, params, data, ts,
                                   args.out, num_samples_for_ppc=200,
                                   batch_size=1024, substeps=args.substeps,
                                   seed=args.seed)
        print(f"report over {out['n_draws']} draws -> {args.out}")

    # float64 MAP re-selection across all chain MAPs (x64 flips jit dtypes,
    # so this must come after every float32 program has run)
    if args.dtype != "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp64
    params64 = jax.tree_util.tree_map(
        lambda x: jnp64.asarray(np.asarray(x), jnp64.float64), params)
    ll64 = build_objective(space, params64, data, ts, substeps=args.substeps,
                           tableau=args.tableau,
                           constraint_mode=REFLECT, dtype=jnp64.float64)
    cands = jnp64.asarray(
        np.asarray(res.final_state.best_x).reshape(-1, space.dim),
        jnp64.float64)
    lls = np.asarray(jax.jit(jax.vmap(ll64))(cands))
    k = int(np.argmax(lls))
    print(f"float64 MAP over {len(lls)} chains: {float(lls[k]):.8e} "
          f"({'BEATS' if lls[k] > REFERENCE_BEST_LL else 'below'} reference)")

    # save the float64 MAP in the re-loadable initial-guess format so the
    # hillmcmc polish / next campaign can warm-start from it directly
    from mmidv1_tpu.data.config_io import save_calibration_results
    map_params = space.apply(params64, cands[k])
    save_calibration_results(
        os.path.join(args.out, "calibrated_parameters.txt"), map_params,
        list(space.names), float(lls[k]))

    meta = {"chains": args.chains, "iterations": args.iterations,
            "proposal": args.proposal,
            "diagnostics": {"max_rhat": max(v["rhat"] for v in diag.values()),
                            "min_ess": min(v["ess"] for v in diag.values()),
                            "per_parameter": diag},
            "segments": args.segments, "thinning": args.thinning,
            "wall_seconds": wall, "chain_steps_per_sec_incl_host": steps / wall,
            "best_logl_float64": float(lls[k]),
            "mean_acceptance": float(np.mean(np.asarray(res.acceptance_rate))),
            "stored_samples": int(samples.shape[0] * samples.shape[1]),
            "rungs": args.rungs,
            "swap_rate": (None if swap_rate is None
                          else [float(x) for x in swap_rate]),
            "final_ladder": (None if args.rungs <= 1
                             else [float(b) for b in
                                   np.asarray(res.final_state.betas)]),
            "device": f"{dev.platform}/{dev.device_kind}", "seed": args.seed}
    with open(os.path.join(args.out, "campaign_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)

    return 0


if __name__ == "__main__":
    sys.exit(main())

"""``sepaihrd_age_structured_main`` — the full Spain-2020 pipeline CLI.

Re-design of the reference's primary executable
(``src/model/main.cpp:136-563``):

    data + configuration -> baseline simulation (CSV) -> calibration with
    ``--algorithm pso|psomcmc|hill|hillmcmc|nuts`` (:48-79) ->
    saveCalibrationResults -> R0 / Rt report -> full post-calibration report.

Run:  python -m mmidv1_tpu.cli.sepaihrd_main --algorithm psomcmc [options]
"""

from __future__ import annotations

import argparse
import sys
import time
import numpy as np

from ..utils.fileutils import ensure_directory_exists, join_paths
from ..utils.logging import get_logger
from .common import load_spain_pipeline, setup_jax

ALGORITHMS = ("pso", "psomcmc", "hill", "hillmcmc", "nuts")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sepaihrd_age_structured_main",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--algorithm", "-a", default="psomcmc", choices=ALGORITHMS,
                   help="calibration algorithm menu (reference main.cpp:48-79)")
    p.add_argument("--project-root", default=None)
    p.add_argument("--output-dir", default=None,
                   help="default <root>/data/output")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--x64", action="store_true")
    p.add_argument("--chains", type=int, default=64,
                   help="MCMC ensemble size (the reference runs 1 chain)")
    p.add_argument("--num-days", type=int, default=None,
                   help="truncate the observation window (smoke tests)")
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-report", action="store_true",
                   help="skip the post-calibration analysis stage")
    p.add_argument("--ppc-samples", type=int, default=100)
    p.add_argument("--scale", type=float, default=1.0,
                   help="scale factor on configured iteration counts "
                        "(e.g. 0.01 for a smoke run)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = get_logger("sepaihrd_main")
    jax = setup_jax(args.platform, args.x64)
    import jax.numpy as jnp

    from ..analysis import calculate_r0, calculate_rt, generate_full_report
    from ..calibration.calibrator import calibrate
    from ..calibration.hill import HillClimbConfig
    from ..calibration.mh import MHConfig
    from ..calibration.nuts import NUTSConfig
    from ..calibration.objective import build_objective
    from ..calibration.param_space import CLAMP, REFLECT
    from ..calibration.pso import PSOConfig
    from ..data import save_calibration_results
    from ..models import sepaihrd
    from ..models.results import save_results_csv
    from .. import constants as C

    dev = jax.devices()[0]
    log.info(f"device: {dev.platform} / {dev.device_kind}")

    pipe = load_spain_pipeline(args.project_root, num_days=args.num_days)
    out_dir = args.output_dir or join_paths(pipe.root, "data", "output")
    ensure_directory_exists(out_dir)
    dtype = pipe.params.dtype
    ts_j = jnp.asarray(pipe.ts, dtype=dtype)

    # ---- baseline simulation at the initial-guess parameters (:263-367) ----
    y0 = sepaihrd.runup_seeded_state(pipe.params, None)
    traj = sepaihrd.solve(pipe.params, y0, ts_j, method="fixed",
                          substeps=args.substeps)
    baseline_csv = join_paths(out_dir, "sepaihrd_age_baseline_results.csv")
    save_results_csv(baseline_csv, pipe.ts, np.asarray(traj), C.COMPARTMENTS)
    log.info(f"baseline simulation saved: {baseline_csv}")

    # ---- calibration (:377-433) -------------------------------------------
    def scaled(n, lo=2):
        return max(lo, int(n * args.scale))

    import dataclasses as _dc
    mh_cfg = MHConfig.from_settings(pipe.settings.get("mcmc", {}))
    mh_cfg = _dc.replace(mh_cfg, iterations=scaled(mh_cfg.iterations),
                         burn_in=scaled(mh_cfg.burn_in, 0),
                         thinning=max(1, min(mh_cfg.thinning,
                                             scaled(mh_cfg.iterations) // 2)))
    pso_cfg = PSOConfig.from_settings(pipe.settings.get("pso", {}))
    pso_cfg = _dc.replace(pso_cfg, iterations=scaled(pso_cfg.iterations))
    hill_cfg = HillClimbConfig.from_settings(pipe.settings.get("hill", {}))
    hill_cfg = _dc.replace(hill_cfg, iterations=scaled(hill_cfg.iterations))
    nuts_cfg = NUTSConfig.from_settings(pipe.settings.get("nuts", {}))
    nuts_cfg = _dc.replace(nuts_cfg, iterations=scaled(nuts_cfg.iterations))

    loglik_clamp = build_objective(pipe.space, pipe.params, pipe.data, pipe.ts,
                                   substeps=args.substeps,
                                   constraint_mode=CLAMP, dtype=dtype)
    loglik_reflect = build_objective(pipe.space, pipe.params, pipe.data,
                                     pipe.ts, substeps=args.substeps,
                                     constraint_mode=REFLECT, dtype=dtype)
    theta0 = jnp.asarray(pipe.theta0, dtype=dtype)
    ll0 = float(loglik_clamp(theta0))
    log.info(f"initial objective: {ll0:.6e}")

    t0 = time.perf_counter()
    # mh_config is passed for 'pso'/'hill' too — reference parity: the menu
    # maps pso == psomcmc and hill == hillmcmc to the same two-phase run
    # (main.cpp:69-72, enum PSO_MCMC/HILL_MCMC)
    result = calibrate(loglik_clamp, loglik_reflect, pipe.space, theta0,
                       jax.random.PRNGKey(args.seed),
                       algorithm=args.algorithm,
                       phase1_config=(hill_cfg if args.algorithm.startswith("hill")
                                      else pso_cfg),
                       mh_config=mh_cfg, nuts_config=nuts_cfg,
                       n_chains=args.chains)
    best_ll = float(result.best_logl)
    log.info(f"calibration ({args.algorithm}) done in "
             f"{time.perf_counter() - t0:.1f}s: best logL {best_ll:.6e} "
             f"(improvement {best_ll - ll0:+.3e})")

    # ---- save re-loadable calibrated parameters (:436-458) ----------------
    best_params = pipe.space.apply(pipe.params,
                                   jnp.asarray(result.best_theta, dtype=dtype))
    calib_file = join_paths(out_dir, "calibrated_parameters.txt")
    save_calibration_results(calib_file, best_params, list(pipe.space.names),
                             best_ll)
    log.info(f"calibrated parameters saved: {calib_file}")

    # final calibrated simulation
    y0b, _ = sepaihrd.initial_state_for_params(best_params, y0)
    traj_b = sepaihrd.solve(best_params, y0b, ts_j, method="fixed",
                            substeps=args.substeps)
    save_results_csv(join_paths(out_dir, "sepaihrd_age_calibrated_results.csv"),
                     pipe.ts, np.asarray(traj_b), C.COMPARTMENTS)

    # ---- reproduction numbers (:461-496) ----------------------------------
    r0 = float(calculate_r0(best_params))
    mid = len(pipe.ts) // 2
    rt0 = float(calculate_rt(best_params, traj_b[0, 0], float(pipe.ts[0])))
    rt_mid = float(calculate_rt(best_params, traj_b[mid, 0],
                                float(pipe.ts[mid])))
    log.info(f"R0 = {r0:.4f}; Rt(t={pipe.ts[0]:.0f}) = {rt0:.4f}; "
             f"Rt(t={pipe.ts[mid]:.0f}) = {rt_mid:.4f}")

    # ---- post-calibration report (:498-563) --------------------------------
    if not args.skip_report and result.samples is not None:
        # strip warm-up draws from the published posterior: stored samples
        # cover ALL iterations (burn-in/adaptation included), and the report
        # takes an ITERATION-axis burn_in (thinned units for MH)
        rep_burn = (nuts_cfg.adaptation_window if args.algorithm == "nuts"
                    else mh_cfg.burn_in // max(1, mh_cfg.thinning))
        # tiny --scale smoke configs: never burn away the whole trace
        rep_burn = min(rep_burn, max(0, np.asarray(result.samples).shape[0] - 1))
        rep = generate_full_report(
            np.asarray(result.samples), pipe.space, pipe.params, pipe.data,
            pipe.ts, out_dir, num_samples_for_ppc=args.ppc_samples,
            burn_in=rep_burn,
            substeps=args.substeps, seed=args.seed)
        log.info(f"full report written under {out_dir} "
                 f"({rep['n_draws']} posterior draws)")

    print(f"best_loglikelihood {best_ll:.8e}")
    print(f"R0 {r0:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

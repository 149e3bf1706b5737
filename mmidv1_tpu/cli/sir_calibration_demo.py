"""``sir_age_structured_calibration_demo`` — hill+MH calibration of the age-SIR.

Re-design of ``src/sir_age_structured/CalibrationDemo.cpp`` (299 lines):
calibrate q, scale_C_total, gamma_0..3 against observed new-confirmed cases
via the Poisson incidence objective, Phase 1 hill climbing -> Phase 2
adaptive Metropolis, then save the MCMC samples CSV.

Run:  python -m mmidv1_tpu.cli.sir_calibration_demo [options]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..utils.fileutils import ensure_directory_exists, get_project_root, join_paths
from ..utils.logging import get_logger
from .common import setup_jax


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sir_age_structured_calibration_demo",
                                description=__doc__)
    p.add_argument("--project-root", default=None)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--hill-iters", type=int, default=150)
    p.add_argument("--mcmc-iters", type=int, default=2000)
    p.add_argument("--burn-in", type=int, default=200)
    p.add_argument("--chains", type=int, default=32)
    p.add_argument("--num-days", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    setup_jax(args.platform)
    import jax

    from ..calibration.calibrator import calibrate
    from ..calibration.hill import HillClimbConfig
    from ..calibration.mh import MHConfig
    from ..calibration.param_space import CLAMP, REFLECT
    from ..calibration.sir_objective import build_sir_objective
    from ..calibration.sir_space import SIRParameterSpace
    from ..data import CalibrationData
    from ..data.contact_matrix import read_matrix_from_csv
    from ..models.sir import make_age_sir_params

    log = get_logger("sir_calibration_demo")
    root = args.project_root or get_project_root()
    C = read_matrix_from_csv(join_paths(root, "data", "contacts.csv"), 4, 4)
    data = CalibrationData.from_csv(
        join_paths(root, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-12-31")
    N = data.population_by_age

    # Initial model (CalibrationDemo.cpp:53-66)
    params0 = make_age_sir_params(N=N, C=C, q=0.1, gamma=[0.1] * 4, scale_C=1.0)
    I0 = data.initial_active_cases()
    y0 = np.stack([N - I0, I0, np.zeros_like(I0)])

    observed = data.new_confirmed
    if args.num_days is not None:
        observed = observed[:args.num_days]
    ts = np.arange(float(len(observed)))

    names = ["q", "scale_C_total"] + [f"gamma_{i}" for i in range(4)]
    bounds = {"q": (1e-4, 1.0), "scale_C_total": (0.1, 5.0),
              **{f"gamma_{i}": (0.01, 1.0) for i in range(4)}}
    sigmas = {"q": 0.01, "scale_C_total": 0.05,
              **{f"gamma_{i}": 0.01 for i in range(4)}}
    space = SIRParameterSpace.create(names, bounds, sigmas, params0)

    ll_clamp = build_sir_objective(space, params0, observed, ts, y0,
                                   constraint_mode=CLAMP)
    ll_reflect = build_sir_objective(space, params0, observed, ts, y0,
                                     constraint_mode=REFLECT)
    theta0 = space.extract(params0)
    log.info(f"initial objective: {float(ll_clamp(theta0)):.6e}")

    t0 = time.perf_counter()
    result = calibrate(
        ll_clamp, ll_reflect, space, theta0, jax.random.PRNGKey(args.seed),
        algorithm="hillmcmc",
        phase1_config=HillClimbConfig(iterations=args.hill_iters),
        mh_config=MHConfig(iterations=args.mcmc_iters, burn_in=args.burn_in,
                           adaptation_period=100, thinning=1),
        n_chains=args.chains)
    log.info(f"calibration done in {time.perf_counter()-t0:.1f}s")

    print("\n--- Final Calibration Results ---")
    print("Best Parameters:")
    for name, v in zip(space.names, np.asarray(result.best_theta)):
        print(f"  {name}: {v:.6f}")
    print(f"Best Objective Value:        {float(result.best_logl):.6f}")

    # Save MCMC samples (CalibrationDemo.cpp:183-220 format)
    out_dir = ensure_directory_exists(
        join_paths(root, "data", "calibration_output"))
    out = join_paths(out_dir, "mcmc_samples.csv")
    samples = np.asarray(result.samples).reshape(-1, space.dim)
    logls = np.asarray(result.sample_logls).reshape(-1)
    with open(out, "w") as f:
        f.write("sample_index,objective_value," + ",".join(space.names) + "\n")
        for i, (ll, row) in enumerate(zip(logls, samples)):
            f.write(f"{i},{ll:.6f}" + "".join(f",{v:.8e}" for v in row) + "\n")
    log.info(f"MCMC samples -> {out}")

    # Save the best-fit simulated I compartment per age group in the
    # reference's format (CalibrationDemo.cpp:236-281: Time,
    # simulated_I_<age-label> columns) — consumed by
    # scripts/compare_calibration_and_observed.py.
    from ..models.sir import solve_age_sir

    best_params = space.apply(params0, result.best_theta)
    traj = np.asarray(solve_age_sir(best_params, y0, ts, method="fixed"))
    age_labels = ["0_30", "30_60", "60_80", "80_plus"]
    if len(age_labels) != len(N):
        age_labels = [str(j) for j in range(len(N))]
    sim_out = join_paths(out_dir, "simulated_incidence_best_fit.csv")
    with open(sim_out, "w") as f:
        f.write("Time" + "".join(f",simulated_I_{a}" for a in age_labels)
                + "\n")
        for i, t in enumerate(ts):
            f.write(f"{t:g}" + "".join(f",{v:.4f}" for v in traj[i, 1, :])
                    + "\n")
    log.info(f"best-fit simulated incidence -> {sim_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

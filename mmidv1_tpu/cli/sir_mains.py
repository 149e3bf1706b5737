"""The three scalar-SIR runners: ``sir_model``, ``sir_pop_var``, ``sir_stochastic``.

Re-design of ``src/base/main/{sir_main,sir_population_variable_main,
sir_stochastic_main}.cpp`` + the GSL model classes they drive
(``src/base/SIRModel.cpp``, ``SIR_population_variable.cpp``,
``SIR_stochastic.cpp``). All three read the reference's
``input_parameters.txt`` format and write the same output CSVs under
``data/output/``:

    sir_result.csv                         (t,S,I,R)
    sir_variable_population_result.csv     (t,S,I,R) + equilibria on stdout
    stochastic_sir_stats.csv               (t,mean_*,median_*,p05_*,p95_*)
    stochastic_sir_sim_<k>.csv             (first <=100 simulations)

Run:  python -m mmidv1_tpu.cli.sir_mains {deterministic|popvar|stochastic}
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..utils.fileutils import get_output_path, get_project_root, join_paths
from ..utils.logging import get_logger
from .common import setup_jax

MAX_SAVED_SIMS = 100   # reference SIR_stochastic.cpp:117


def _load_params(args):
    from ..data import read_scalar_sir_parameters

    path = args.params
    if path is None:
        root = get_project_root(args.project_root or os.getcwd())
        path = join_paths(root, "data", "configuration",
                          "sir_input_parameters.txt")
    return read_scalar_sir_parameters(path)


def run_deterministic(args) -> int:
    """``sir_model``: RKF45 solve of the classic SIR, daily reporting grid
    (the main pins t to [0, 365], ``sir_main.cpp:21-22``)."""
    import jax.numpy as jnp

    from ..models.sir import SIRParams, sir_rhs
    from ..ode import integrate_times

    log = get_logger("sir_model")
    prm = _load_params(args)
    p = SIRParams(N=prm["N"], beta=prm["beta"], gamma=prm["gamma"])
    ts = np.arange(0.0, 365.0 + 1.0)
    y0 = jnp.asarray([prm["S0"], prm["I0"], prm["R0"]])
    t0 = time.perf_counter()
    traj = np.asarray(integrate_times(lambda t, y: sir_rhs(t, y, p), y0,
                                      jnp.asarray(ts), atol=prm["eps"],
                                      rtol=0.0, dt0=prm["h"], method="rkf45"))
    out = get_output_path("sir_result.csv", root=args.project_root)
    with open(out, "w") as f:
        f.write("t,S,I,R\n")
        for t, (S, I, R) in zip(ts, traj):
            f.write(f"{t:g},{S:.10g},{I:.10g},{R:.10g}\n")
    log.info(f"deterministic SIR finished in {time.perf_counter()-t0:.2f}s "
             f"-> {out}")
    return 0


def run_popvar(args) -> int:
    """``sir_pop_var``: SIR with births/deaths + equilibria report
    (``SIR_population_variable.cpp:21-143``)."""
    import jax.numpy as jnp

    from ..models.sir import SIRParams, equilibria, sir_vital_rhs
    from ..ode import integrate_times

    log = get_logger("sir_pop_var")
    prm = _load_params(args)
    p = SIRParams(N=prm["N"], beta=prm["beta"], gamma=prm["gamma"],
                  B=prm["B"], mu=prm["mu"])
    ts = np.arange(prm["t_start"], prm["t_end"] + 1.0)
    y0 = jnp.asarray([prm["S0"], prm["I0"], prm["R0"]])
    traj = np.asarray(integrate_times(lambda t, y: sir_vital_rhs(t, y, p), y0,
                                      jnp.asarray(ts), atol=prm["eps"],
                                      rtol=0.0, dt0=prm["h"], method="rkf45"))
    out = get_output_path("sir_variable_population_result.csv",
                          root=args.project_root)
    with open(out, "w") as f:
        f.write("t,S,I,R\n")
        for t, (S, I, R) in zip(ts, traj):
            f.write(f"{t:g},{S:.10g},{I:.10g},{R:.10g}\n")

    eq = equilibria(p)
    print("Equilibria for SIR model with population variation "
          "(assuming B=mu*N for constant pop. equilibrium):")
    print(f"Disease-Free Equilibrium (DFE): S={eq['dfe'][0]:.6g}, I=0, R=0")
    print(f"Basic Reproduction Number R0 = {eq['R0']:.6g}")
    if eq["endemic"] is not None:
        S, I, R = eq["endemic"]
        print("Endemic Equilibrium (EE) exists:")
        print(f"  S*={S:.6g}, I*={I:.6g}, R*={R:.6g}")
    else:
        print("Endemic Equilibrium (EE) does not exist (R0 <= 1)")
    log.info(f"results -> {out}")
    return 0


def run_stochastic(args) -> int:
    """``sir_stochastic``: binomial-chain ensemble + summary statistics
    (``SIR_stochastic.cpp:75-255``); all simulations advance under one jit
    instead of the reference's serial GSL loop."""
    import jax

    from ..models.sir import SIRParams, run_stochastic_sir, stochastic_statistics

    log = get_logger("sir_stochastic")
    prm = _load_params(args)
    p = SIRParams(N=prm["N"], beta=prm["beta"], gamma=prm["gamma"])
    n_sims = int(prm["numSimulations"])
    h = max(prm["h"], 0.01)
    t0 = time.perf_counter()
    trajs = np.asarray(run_stochastic_sir(
        p, [prm["S0"], prm["I0"], prm["R0"]], prm["t_start"], prm["t_end"], h,
        n_sims, jax.random.PRNGKey(args.seed)))
    stats = stochastic_statistics(trajs)
    log.info(f"{n_sims} stochastic simulations in {time.perf_counter()-t0:.2f}s")

    ts = prm["t_start"] + h * np.arange(trajs.shape[1])
    out = get_output_path("stochastic_sir_stats.csv", root=args.project_root)
    cols = ("S", "I", "R")
    with open(out, "w") as f:
        f.write("t," + ",".join(f"{s}_{c}" for s in
                                ("mean", "median", "p05", "p95")
                                for c in cols) + "\n")
        for i, t in enumerate(ts):
            row = [f"{t:g}"]
            for s in ("mean", "median", "p05", "p95"):
                row += [f"{stats[s][i, j]:.6g}" for j in range(3)]
            f.write(",".join(row) + "\n")

    for k in range(min(n_sims, MAX_SAVED_SIMS)):
        sim_out = get_output_path(f"stochastic_sir_sim_{k}.csv",
                                  root=args.project_root)
        with open(sim_out, "w") as f:
            f.write("t,S,I,R\n")
            for i, t in enumerate(ts):
                f.write(f"{t:g},{trajs[k,i,0]:g},{trajs[k,i,1]:g},"
                        f"{trajs[k,i,2]:g}\n")
    log.info(f"stats -> {out}; {min(n_sims, MAX_SAVED_SIMS)} per-sim CSVs")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sir_mains", description=__doc__)
    p.add_argument("variant",
                   choices=["deterministic", "popvar", "stochastic"])
    p.add_argument("--params", default=None,
                   help="input_parameters.txt path (default: vendored copy)")
    p.add_argument("--project-root", default=None)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    setup_jax(args.platform)
    return {"deterministic": run_deterministic, "popvar": run_popvar,
            "stochastic": run_stochastic}[args.variant](args)


if __name__ == "__main__":
    sys.exit(main())

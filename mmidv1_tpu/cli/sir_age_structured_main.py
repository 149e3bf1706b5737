"""``sir_age_structured_main`` — age-SIR baseline + intervention demo CLI.

Re-design of ``src/sir_age_structured/main.cpp`` (249 lines): load contacts +
population, run the baseline age-SIR simulation, then the split-simulation
intervention demo (contact_reduction 0.3 at t=20, resume from the saved
state, :102-167), writing result CSVs in the reference's format.

Run:  python -m mmidv1_tpu.cli.sir_age_structured_main [options]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..utils.fileutils import get_project_root, get_output_path, join_paths
from ..utils.logging import get_logger
from .common import setup_jax


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sir_age_structured_main",
                                description=__doc__)
    p.add_argument("--project-root", default=None)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--days", type=float, default=100.0)
    p.add_argument("--q", type=float, default=0.05)
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--intervention-time", type=float, default=20.0)
    p.add_argument("--contact-reduction", type=float, default=0.3)
    args = p.parse_args(argv)

    setup_jax(args.platform)
    import jax.numpy as jnp

    from ..data import CalibrationData
    from ..data.contact_matrix import read_matrix_from_csv
    from ..models.interventions import Intervention, solve_age_sir_scheduled
    from ..models.results import SIR_COMPARTMENTS, save_results_csv
    from ..models.sir import make_age_sir_params, solve_age_sir

    log = get_logger("sir_age_structured_main")
    root = args.project_root or get_project_root()
    C = read_matrix_from_csv(join_paths(root, "data", "contacts.csv"), 4, 4)
    data = CalibrationData.from_csv(
        join_paths(root, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-12-31")
    N = data.population_by_age
    params = make_age_sir_params(N=N, C=C, q=args.q, gamma=[args.gamma] * 4)

    I0 = data.initial_active_cases()
    y0 = jnp.asarray(np.stack([N - I0, I0, np.zeros_like(I0)]))
    ts = np.arange(0.0, args.days + 1.0)

    # --- baseline run (main.cpp:60-100) -------------------------------------
    traj = solve_age_sir(params, y0, jnp.asarray(ts), method="adaptive")
    out = get_output_path("sir_age_baseline_results.csv", root=root)
    save_results_csv(out, ts, np.asarray(traj)[:, :, :], SIR_COMPARTMENTS)
    log.info(f"baseline -> {out}")

    # --- split-simulation intervention demo (main.cpp:102-167) --------------
    schedule = [Intervention(args.intervention_time, "contact_reduction",
                             args.contact_reduction)]
    traj_i, final_params = solve_age_sir_scheduled(params, y0, ts, schedule)
    out_i = get_output_path("sir_age_intervention_results.csv", root=root)
    save_results_csv(out_i, ts, np.asarray(traj_i), SIR_COMPARTMENTS)
    log.info(f"intervention demo -> {out_i} "
             f"(scale_C after: {float(final_params.scale_C):.3f})")

    total_I_base = float(np.asarray(traj)[:, 1].sum(axis=1).max())
    total_I_int = float(np.asarray(traj_i)[:, 1].sum(axis=1).max())
    print(f"peak_infected_baseline {total_I_base:.1f}")
    print(f"peak_infected_intervention {total_I_int:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

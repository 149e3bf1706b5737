"""Full post-calibration report: one batched posterior replay.

Re-design of ``PostCalibrationAnalyser::generateFullReport``
(reference: ``src/model/PostCalibrationAnalyser.cpp:53-148``). The reference
loops posterior draws through a memoized sequential simulator with batched CSV
dumps and an async writer; here the selected draws replay as vmapped batched
solves on the accelerator (chunked to bound HBM), metrics and quantile bands
are vectorized reductions, and only the final CSV emission happens host-side
(through the same async-writer design).

Produces the reference's full output tree (see
:mod:`mmidv1_tpu.analysis.writers`): posterior-predictive bands, per-batch +
pooled metric summaries, parameter posteriors, Rt / seroprevalence trajectory
bands, ENE-COVID day-64 validation, and the +/-10%-kappa scenario comparison.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..calibration.objective import build_incidence_fn
from ..calibration.param_space import REFLECT, ParameterSpace
from ..data.calibration_data import CalibrationData
from ..models import sepaihrd
from ..params import SEPAIHRDParams
from . import aggregate, writers
from .metrics import essential_metrics, seroprevalence_trajectory
from .reproduction import rt_trajectory


def _replay_fn(space: ParameterSpace, base_params: SEPAIHRDParams,
               base_y0: jnp.ndarray, ts: jnp.ndarray, substeps: int,
               use_scalar_beta: bool, tableau: str = "dopri5"):
    """theta -> (metrics dict, rt(t), sero(t), trajectory)."""

    def replay(theta):
        theta = space.constrain(theta, REFLECT)
        params = space.apply(base_params, theta)
        y0, _inf = sepaihrd.initial_state_for_params(params, base_y0)
        traj = sepaihrd.solve(params, y0, ts, method="fixed",
                              substeps=substeps, tableau=tableau)
        m = essential_metrics(params, traj, ts, y0,
                              use_scalar_beta=use_scalar_beta)
        rt = rt_trajectory(params, traj, ts)
        sero = seroprevalence_trajectory(params, traj)
        return m, rt, sero

    return replay


def generate_full_report(
    samples: np.ndarray,
    space: ParameterSpace,
    base_params: SEPAIHRDParams,
    data: CalibrationData,
    ts: Sequence[float],
    output_dir: str,
    *,
    num_samples_for_ppc: int = 100,
    burn_in: int = 0,
    thinning: int = 1,
    batch_size: int = 256,
    substeps: int = 4,
    tableau: str = "dopri5",
    seed: int = 12345,
    use_scalar_beta: bool = False,
    scenario_kappa_delta: float = 0.1,
    async_io: bool = True,
    base_initial_state: Optional[np.ndarray] = None,
) -> Dict[str, object]:
    """Run the complete analysis and write the reference-shaped output tree.

    ``samples``: (n, d) or (n_stored, B, d) posterior draws (flattened).
    Returns the in-memory results (summary dict, PPC bands, trajectory bands,
    scenario rows) for programmatic use.
    """
    dtype = base_params.dtype
    ts = np.asarray(ts, dtype=np.float64)
    ts_j = jnp.asarray(ts, dtype=dtype)
    runup_offset = int(np.searchsorted(ts, 0.0, side="left"))
    ts_obs = ts[runup_offset:]
    n_ages = base_params.n_ages

    samples = np.asarray(samples)
    if samples.ndim == 3:
        # burn-in/thinning are ITERATION counts: apply them on the stored-
        # iteration axis BEFORE flattening the (n_stored, B, d) ensemble —
        # applied after, burn_in would count individual chain-draws and a
        # thinning stride sharing a factor with B would systematically
        # select a fixed chain subset
        samples = samples[burn_in::max(1, thinning)]
        sel = samples.reshape(-1, samples.shape[-1])
    else:
        sel = samples[burn_in::max(1, thinning)]
    if sel.size == 0:
        raise ValueError("no posterior samples left after burn-in/thinning")

    if base_initial_state is None:
        base_initial_state = data.initial_sepaihrd_state(
            sigma=base_params.sigma, gamma_p=base_params.gamma_p,
            gamma_A=base_params.gamma_A, gamma_I=base_params.gamma_I,
            p=base_params.p, h=base_params.h)
    base_y0 = jnp.asarray(base_initial_state, dtype=dtype)

    writer = writers.AsyncWriter() if async_io else None

    def emit(fn, *args, **kwargs):
        if writer is not None:
            writer.submit(fn, *args, **kwargs)
        else:
            fn(*args, **kwargs)

    # ------------------------------------------------------------------
    # 1) Posterior predictive checks (random subsample, batched incidence)
    # ------------------------------------------------------------------
    idx = aggregate.select_ppc_draws(len(sel), num_samples_for_ppc, seed)
    incidence = build_incidence_fn(space, base_params, data, ts,
                                   base_initial_state=base_initial_state,
                                   substeps=substeps, tableau=tableau,
                                   constraint_mode=REFLECT, dtype=dtype)
    inc_batch = jax.jit(jax.vmap(lambda th: incidence(th)[1]))
    daily = []
    for start in range(0, len(idx), batch_size):
        chunk = jnp.asarray(sel[idx[start:start + batch_size]], dtype=dtype)
        daily.append(np.asarray(inc_batch(chunk)))
    daily = np.concatenate(daily, axis=0)            # (m, 3, T_obs, A)
    ppc = aggregate.posterior_predictive(daily, data, ts_obs)
    emit(writers.write_posterior_predictive,
         os.path.join(output_dir, "posterior_predictive"), ppc)

    # ------------------------------------------------------------------
    # 2) Batched metric replay over ALL selected draws
    # ------------------------------------------------------------------
    replay = _replay_fn(space, base_params, base_y0, ts_j, substeps,
                        use_scalar_beta, tableau)
    replay_batch = jax.jit(jax.vmap(replay))

    all_batch_stats = []
    rt_all, sero_all = [], []
    for bi, start in enumerate(range(0, len(sel), batch_size)):
        chunk = jnp.asarray(sel[start:start + batch_size], dtype=dtype)
        m, rt, sero = replay_batch(chunk)
        cols = aggregate.metric_table(
            {k: np.asarray(v) for k, v in m.items()}, n_ages)
        emit(writers.write_batch_metrics,
             os.path.join(output_dir, "mcmc_batches", f"batch_{bi}.csv"),
             cols, n_ages)
        all_batch_stats.append(aggregate.aggregate_batch_metrics(cols))
        rt_all.append(np.asarray(rt))
        sero_all.append(np.asarray(sero))

    summary = aggregate.aggregate_all_batches(all_batch_stats)
    emit(writers.write_aggregated_summary,
         os.path.join(output_dir, "mcmc_aggregated", "metrics_summary.csv"),
         summary)

    rt_bands = aggregate.trajectory_bands(np.concatenate(rt_all), ts)
    sero_bands = aggregate.trajectory_bands(np.concatenate(sero_all), ts)
    emit(writers.write_aggregated_trajectory,
         os.path.join(output_dir, "rt_trajectories",
                      "Rt_aggregated_with_uncertainty.csv"), rt_bands)
    emit(writers.write_aggregated_trajectory,
         os.path.join(output_dir, "seroprevalence",
                      "seroprevalence_trajectory.csv"), sero_bands)

    ene = aggregate.ene_covid_validation(summary)
    emit(writers.write_ene_covid_validation,
         os.path.join(output_dir, "seroprevalence", "ene_covid_validation.csv"),
         ene)

    # ------------------------------------------------------------------
    # 3) Parameter posteriors
    # ------------------------------------------------------------------
    emit(writers.write_parameter_posteriors,
         os.path.join(output_dir, "parameter_posteriors"), sel,
         list(space.names))

    # ------------------------------------------------------------------
    # 4) Scenario analysis around the posterior mean: +/-10% on the first
    #    calibratable kappa (reference PostCalibrationAnalyser.cpp:110-140;
    #    baseline kappa_1 is fixed, so index 1)
    # ------------------------------------------------------------------
    scenario_rows = []
    mean_theta = jnp.asarray(sel.mean(axis=0), dtype=dtype)
    mean_params = space.apply(base_params, space.constrain(mean_theta, REFLECT))
    if int(mean_params.kappa_values.shape[-1]) > 1:
        k_idx = 1

        def scenario_metrics(params):
            y0, _ = sepaihrd.initial_state_for_params(params, base_y0)
            traj = sepaihrd.solve(params, y0, ts_j, method="fixed",
                                  substeps=substeps, tableau=tableau)
            return essential_metrics(params, traj, ts_j, y0,
                                     use_scalar_beta=use_scalar_beta)

        # one jitted wrapper outside the loop: all three scenarios share
        # shapes, so they share ONE compile of the solve+metrics program
        scenario_fn = jax.jit(scenario_metrics)
        scenarios = [("baseline", mean_params)]
        for name, f in (("stricter_lockdown", 1.0 - scenario_kappa_delta),
                        ("weaker_lockdown", 1.0 + scenario_kappa_delta)):
            kv = mean_params.kappa_values.at[k_idx].multiply(f)
            scenarios.append((name, mean_params.replace(kappa_values=kv)))
        for name, prm in scenarios:
            cols = aggregate.metric_table(
                {k: np.asarray(v) for k, v in
                 scenario_fn(prm).items()}, n_ages)
            scenario_rows.append((name, {k: float(np.asarray(v)) for k, v in
                                         cols.items()}))
        emit(writers.write_scenario_comparison,
             os.path.join(output_dir, "scenarios", "scenario_comparison.csv"),
             scenario_rows)

    if writer is not None:
        writer.wait_for_completion()
        writer.close()

    return {"summary": summary, "ppc": ppc, "rt_bands": rt_bands,
            "sero_bands": sero_bands, "ene_covid": ene,
            "scenarios": scenario_rows, "n_draws": len(sel)}

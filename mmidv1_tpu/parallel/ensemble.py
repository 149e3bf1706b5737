"""Mesh-sharded ensemble MCMC and PSO.

The headline scale-out capability (BASELINE.md north star: 8192-chain MCMC on a
TPU mesh). The reference's analogue is a single sequential chain + OpenMP swarm
loops (``MetropolisHastingsSampler.cpp:283-384``,
``ParticleSwarmOptimizer.cpp:274,310,368``); here the ensemble's batch axis is
sharded over a ``chains`` device mesh:

- :func:`run_mh_sharded` — explicit ``shard_map``: each device advances its
  local chains; covariance re-estimation ``psum``s the global cross-section
  moments; the final MAP is an ``all_gather`` reduction. Per-chain RNG comes
  from shard-invariant slices of a global per-step draw table (see
  :mod:`mmidv1_tpu.calibration.mh`), so results are IDENTICAL to the
  single-device ensemble up to collective reduction order.
- :func:`run_mh_gspmd` — the same jitted single-device program fed
  mesh-sharded state (GSPMD): XLA partitions it and inserts the collectives.
- :func:`run_pso_sharded` — PSO swarm sharded over the mesh via GSPMD (the
  global-best/ mean reductions inside ``run_pso`` lower to psums).

All three are validated against unsharded runs on an 8-virtual-device CPU mesh
in ``tests/test_parallel.py`` — the TPU-native replacement for the reference's
``ParallelConsistencyTest`` (``tests/model/SEPAIHRDObjectivefunctionTest.cpp:492``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..calibration.mh import MHConfig, MHResult, MHState, run_mh
from ..calibration.pso import PSOConfig, PSOResult, init_pso_state, run_pso
from ..calibration.param_space import ParameterSpace
from .mesh import check_divisible, ensemble_mesh, shard_state_fields

# Chain-batched fields of each sampler state (everything else — covariance
# factors, counters — is replicated). Sharding by NAME, not shape: a shape
# heuristic mis-shards the (d, d) covariance whenever d equals the chain
# count.
_MH_BATCH_FIELDS = ("x", "logp", "log_scale", "best_x", "best_logp",
                    "accept_count")
_PSO_BATCH_FIELDS = ("x", "v", "fitness", "pbest_x", "pbest_f",
                     "success_count", "total_updates")
_MALA_BATCH_FIELDS = ("x", "logp", "grad", "log_eps", "best_x", "best_logp",
                      "accept_count")
_PT_BATCH_FIELDS = ("x", "logp", "log_scale", "best_x", "best_logp",
                    "accept_count")

# PartitionSpec pytrees matching MHState / MHResult: batch-leading leaves split
# over the chains axis, shared leaves replicated.
def _mh_state_specs(axis: str) -> MHState:
    b, r = P(axis), P()
    return MHState(x=b, logp=b, log_scale=b, chol=r, cov=r,
                   best_x=b, best_logp=b, accept_count=b, step=r)


def _mh_result_specs(axis: str) -> MHResult:
    b, r = P(axis), P()
    return MHResult(samples=P(None, axis), sample_logps=P(None, axis),
                    best_x=r, best_logp=r, acceptance_rate=b,
                    final_cov=r, final_scale=b,
                    final_state=_mh_state_specs(axis))


def run_mh_sharded(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MHConfig,
    *,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    initial_cov: Optional[jnp.ndarray] = None,
    initial_state: Optional[MHState] = None,
    jitter: float = 1.0,
    loglik_batch: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> MHResult:
    """Ensemble adaptive-Metropolis sharded over a ``chains`` mesh (shard_map).

    ``n_chains`` is the GLOBAL chain count and must divide evenly over the
    mesh. Covariance adaptation and the final MAP reduction are collective
    (psum / all_gather); everything else is chain-local. ``initial_state``
    resumes a previous sharded run (its batch leaves must be mesh-sharded or
    shard-shaped). ``loglik_batch`` is an optional batch-native objective
    (e.g. the Pallas kernel, :func:`mmidv1_tpu.ops.build_objective_pallas`)
    evaluated per device on its local chain shard.
    """
    if mesh is None:
        mesh = ensemble_mesh()
    axis = mesh.axis_names[0]
    b_local = check_divisible(n_chains, mesh, "n_chains")
    theta0 = jnp.asarray(theta0)

    def local_run(theta0, key, initial_state):
        dev = jax.lax.axis_index(axis)
        return run_mh(loglik, space, theta0, key, cfg, n_chains=b_local,
                      initial_cov=initial_cov, initial_state=initial_state,
                      jitter=jitter, axis_name=axis, n_total=n_chains,
                      offset=dev * b_local, _jit=False,
                      loglik_batch=loglik_batch)

    if initial_state is None:
        fn = jax.shard_map(lambda t, k: local_run(t, k, None), mesh=mesh,
                           in_specs=(P(), P()), out_specs=_mh_result_specs(axis),
                           check_vma=False)
        return jax.jit(fn)(theta0, key)
    fn = jax.shard_map(local_run, mesh=mesh,
                       in_specs=(P(), P(), _mh_state_specs(axis)),
                       out_specs=_mh_result_specs(axis), check_vma=False)
    return jax.jit(fn)(theta0, key, initial_state)


def run_mh_gspmd(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg: MHConfig,
    *,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    initial_cov: Optional[jnp.ndarray] = None,
    jitter: float = 1.0,
) -> MHResult:
    """Ensemble adaptive-Metropolis under GSPMD auto-partitioning.

    Builds the initial ensemble state, shards its batch leaves over the mesh
    with ``NamedSharding``, and runs the SAME program as the single-device
    :func:`run_mh` — XLA inserts the cross-shard collectives (the scaling-book
    recipe: pick a mesh, annotate shardings, let XLA do the rest).
    """
    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(n_chains, mesh, "n_chains")
    from ..calibration.mh import init_mh_state

    # Mirror run_mh's internal key split exactly, so a GSPMD run with `key`
    # consumes the same random stream as an unsharded run_mh(key) — bit-for-bit
    # parity modulo collective reduction order.
    k_init, _k_run = jax.random.split(key)
    loglik_batch = jax.vmap(loglik)
    state0 = init_mh_state(space, jnp.asarray(theta0), loglik_batch, k_init,
                           n_chains, jitter=jitter, initial_cov=initial_cov,
                           reg_eps=cfg.regularization_epsilon)
    state0 = shard_state_fields(state0, mesh, _MH_BATCH_FIELDS,
                                axis_name=mesh.axis_names[0])
    # Re-enter run_mh with the sharded state; shardings propagate through jit.
    return run_mh(loglik, space, jnp.asarray(theta0), key, cfg,
                  n_chains=n_chains, initial_state=state0)


def run_pso_sharded(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    key: jax.Array,
    cfg: PSOConfig,
    *,
    theta0: Optional[jnp.ndarray] = None,
    mesh: Optional[Mesh] = None,
    dtype=None,
) -> PSOResult:
    """PSO with the swarm sharded over the mesh (GSPMD).

    The swarm-wide reductions inside :func:`run_pso` (global best, diversity,
    evolutionary-state estimation, pbest covariance) lower to psums across the
    mesh; per-particle updates stay local. Ring/Von-Neumann neighbor gathers
    cross shard boundaries via collective permutes — GLOBAL_BEST is the
    zero-communication-overhead production topology.
    """
    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(cfg.swarm_size, mesh, "swarm_size")
    if dtype is None:
        dtype = space.lower.dtype
    fitness_batch = jax.vmap(loglik)
    # Mirror run_pso's internal key split so `key` consumes the same stream as
    # an unsharded run_pso(key) — exact parity modulo reduction order.
    k_init, _k_run = jax.random.split(key)
    state0 = init_pso_state(space, k_init, cfg, fitness_batch, theta0, dtype)
    state0 = shard_state_fields(state0, mesh, _PSO_BATCH_FIELDS,
                                axis_name=mesh.axis_names[0])
    return run_pso(loglik, space, key, cfg, theta0=theta0, dtype=dtype,
                   initial_state=state0)


def run_pt_gspmd(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg,
    *,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    initial_cov: Optional[jnp.ndarray] = None,
    jitter: float = 1.0,
    loglik_batch: Optional[Callable] = None,
):
    """Replica-exchange sampler with the CHAIN axis sharded over the mesh
    (GSPMD; the rung axis is replicated).

    Tempering is mesh-friendly by construction: swap moves exchange rung
    rows chain-column-wise (elementwise in the sharded axis — zero
    communication), per-rung covariance re-estimation contracts over the
    chain axis (XLA inserts the psum), and only the tiny (K, d, d)
    covariance state is replicated. ``n_chains`` is the per-rung chain
    count and must divide over the mesh.
    """
    from ..calibration.tempering import init_pt_state, run_pt

    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(n_chains, mesh, "n_chains")
    axis = mesh.axis_names[0]
    if loglik_batch is None:
        loglik_batch = jax.vmap(loglik)

    # Mirror run_pt's internal key split so a GSPMD run with `key` consumes
    # the same random stream as the unsharded run_pt(key).
    k_init, _k_run = jax.random.split(key)
    dtype = jnp.asarray(theta0).dtype
    state0 = init_pt_state(space, jnp.asarray(theta0), loglik_batch, k_init,
                           n_rungs=cfg.n_rungs, n_chains=n_chains,
                           jitter=jitter, initial_cov=initial_cov,
                           reg_eps=cfg.regularization_epsilon,
                           betas=cfg.ladder(dtype))

    # (K, N, ...) leaves: split the chain axis (dim 1) over the mesh; the
    # (K, d, d) covariance state and swap counters are replicated.
    state0 = shard_state_fields(state0, mesh, _PT_BATCH_FIELDS,
                                axis_name=axis, batch_dim=1)
    return run_pt(loglik, space, jnp.asarray(theta0), key, cfg,
                  n_chains=n_chains, initial_state=state0,
                  loglik_batch=loglik_batch)


def run_nuts_gspmd(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg,
    *,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    jitter: float = 0.1,
    value_and_grad_batch: Optional[Callable] = None,
):
    """Batch-native NUTS with the chain axis GSPMD-sharded over the mesh.

    Every tree operation (leapfrog, masked joins, U-turn tests) is
    chain-local, so the scanned program partitions with zero collectives;
    only the final best-chain argmax reduces across shards. Pass the Pallas
    adjoint engine as ``value_and_grad_batch`` on TPU meshes — each device
    runs the kernel pair on its local chain shard."""
    from jax.sharding import NamedSharding
    from ..calibration.nuts import run_nuts

    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(n_chains, mesh, "n_chains")
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return run_nuts(loglik, space, theta0, key, cfg, n_chains=n_chains,
                    jitter=jitter, value_and_grad_batch=value_and_grad_batch,
                    chain_sharding=sharding)


def run_nuts_logit_gspmd(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    key: jax.Array,
    cfg,
    *,
    mu: jnp.ndarray,
    scale: jnp.ndarray,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    jitter: float = 1.0,
    value_and_grad_batch: Optional[Callable] = None,
    init: Optional[jnp.ndarray] = None,
):
    """Logit-space dense-mass NUTS (the Spain-2020 production sampler,
    :func:`mmidv1_tpu.calibration.nuts.run_nuts_logit`) with the chain axis
    GSPMD-sharded over the mesh.

    The logit transform and its Jacobian are elementwise in the chain axis
    and the dense-mass matmuls contract only the (replicated) parameter
    axis, so the whole wrapper partitions with zero collectives — same
    argument as :func:`run_nuts_gspmd`."""
    from jax.sharding import NamedSharding
    from ..calibration.nuts import run_nuts_logit

    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(n_chains, mesh, "n_chains")
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return run_nuts_logit(loglik, space, key, cfg, mu=mu, scale=scale,
                          n_chains=n_chains, jitter=jitter,
                          value_and_grad_batch=value_and_grad_batch,
                          chain_sharding=sharding, init=init)


def run_mala_gspmd(
    loglik: Callable[[jnp.ndarray], jnp.ndarray],
    space: ParameterSpace,
    theta0: jnp.ndarray,
    key: jax.Array,
    cfg,
    *,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    initial_cov: Optional[jnp.ndarray] = None,
    jitter: float = 1.0,
    value_and_grad_batch: Optional[Callable] = None,
):
    """Ensemble preconditioned MALA with the chain axis sharded over the mesh
    (GSPMD). The Langevin drift, proposal densities, and accept/reject are
    chain-local (zero communication); the ensemble-covariance preconditioner
    contraction crosses shards (XLA inserts the psum)."""
    from ..calibration.mala import (MALAConfig, _bounded_value_and_grad,
                                    init_mala_state, run_mala)

    if mesh is None:
        mesh = ensemble_mesh()
    check_divisible(n_chains, mesh, "n_chains")
    if value_and_grad_batch is None:
        value_and_grad_batch = jax.vmap(jax.value_and_grad(loglik))
    eval_batch = _bounded_value_and_grad(space, value_and_grad_batch,
                                         cfg.grad_clip_norm)
    # Mirror run_mala's internal key split so a GSPMD run with `key` consumes
    # the same random stream as the unsharded run.
    k_init, _k_run = jax.random.split(key)
    state0 = init_mala_state(space, jnp.asarray(theta0), eval_batch, k_init,
                             n_chains, jitter=jitter, initial_cov=initial_cov,
                             cfg=cfg)
    state0 = shard_state_fields(state0, mesh, _MALA_BATCH_FIELDS,
                                axis_name=mesh.axis_names[0])
    return run_mala(loglik, space, jnp.asarray(theta0), key, cfg,
                    n_chains=n_chains, initial_state=state0,
                    value_and_grad_batch=value_and_grad_batch)

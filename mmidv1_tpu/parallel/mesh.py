"""Device-mesh helpers for the ensemble (``chains``) data-parallel axis.

The reference has no distributed layer at all — its entire parallelism surface
is OpenMP loops inside one process (SURVEY.md section 2, parallelism table).
This module introduces the TPU-native replacement: a 1-D ``jax.sharding.Mesh``
over a ``chains`` axis. MCMC ensembles, PSO swarms, and posterior-replay
batches all shard their leading batch dimension over it; cross-chain reductions
(covariance moments, global best, acceptance statistics, posterior quantiles)
become XLA collectives (``psum``/``all_gather``) riding ICI.

Two complementary sharding styles are supported (both tested for parity
against single-device runs in ``tests/test_parallel.py``):

- **GSPMD**: place the batch-leading leaves of a state pytree with
  ``NamedSharding(mesh, P("chains"))`` (:func:`shard_ensemble_pytree`) and run
  the SAME jitted program — XLA partitions it and inserts the collectives.
- **shard_map**: explicit per-device programs with hand-placed ``psum`` /
  ``all_gather`` (:func:`mmidv1_tpu.parallel.ensemble.run_mh_sharded`) for
  exact control of collective placement on the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS_AXIS = "chains"


def ensemble_mesh(n_devices: Optional[int] = None,
                  axis_name: str = CHAINS_AXIS,
                  devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all local devices).

    On a TPU pod slice the devices arrive ICI-ordered from ``jax.devices()``,
    so a 1-D ``chains`` axis maps neighboring shards onto ICI neighbors — the
    all-reduces in covariance adaptation ride ICI, never DCN.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = CHAINS_AXIS) -> NamedSharding:
    """Sharding that splits the LEADING axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ensemble_pytree(tree, mesh: Mesh, batch_size: int,
                          axis_name: str = CHAINS_AXIS):
    """device_put a pytree so every leaf whose leading dim equals ``batch_size``
    is split over the mesh and everything else is replicated.

    This is the GSPMD entry: feed the result to the existing jitted programs
    (``run_mh``, ``run_pso``) and XLA partitions them automatically.
    """
    split = batch_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def place(leaf):
        leaf_arr = jax.numpy.asarray(leaf)
        if leaf_arr.ndim >= 1 and leaf_arr.shape[0] == batch_size:
            return jax.device_put(leaf_arr, split)
        return jax.device_put(leaf_arr, rep)

    return jax.tree_util.tree_map(place, tree)


def shard_state_fields(state, mesh: Mesh, batch_fields: Sequence[str],
                       axis_name: str = CHAINS_AXIS, batch_dim: int = 0):
    """device_put a NamedTuple state, sharding NAMED fields over the mesh.

    Unlike :func:`shard_ensemble_pytree`'s shape heuristic (which can
    mis-shard a ``(d, d)`` covariance when ``d`` happens to equal the chain
    count), this places exactly the fields named in ``batch_fields`` with the
    batch axis ``batch_dim`` split over the mesh, and replicates everything
    else.
    """
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = axis_name
    split = NamedSharding(mesh, P(*spec))
    rep = replicated_sharding(mesh)
    batch_fields = set(batch_fields)
    unknown = batch_fields - set(state._fields)
    if unknown:
        raise ValueError(f"unknown state fields: {sorted(unknown)}")
    placed = {
        name: jax.device_put(jax.numpy.asarray(getattr(state, name)),
                             split if name in batch_fields else rep)
        for name in state._fields
    }
    return type(state)(**placed)


def check_divisible(n: int, mesh: Mesh, what: str = "batch") -> int:
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(
            f"{what} size {n} is not divisible by the mesh's {n_dev} devices")
    return n // n_dev

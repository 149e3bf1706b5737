"""Multi-host initialization for pod-scale runs.

The reference is a single OpenMP process; this is the scale-out entry the
rebuild adds (SURVEY.md §5.7). One call per host before any JAX computation:

    from mmidv1_tpu.parallel import multihost
    multihost.initialize()                      # env-driven (TPU pods)
    mesh = ensemble_mesh()                      # spans ALL hosts' devices

After ``jax.distributed.initialize``, ``jax.devices()`` returns the global
device list, so :func:`mmidv1_tpu.parallel.ensemble_mesh` and the sharded
samplers work unchanged — the ensemble's ``psum``/``all_gather`` collectives
ride ICI within a pod slice and DCN across slices, hidden behind the same
sharded-array program. Checkpointing and CSV emission should run on process 0
only (:func:`is_primary`).

On a single host (this environment) ``initialize`` is a no-op, so code can
call it unconditionally.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..utils.logging import get_logger


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` when running under a multi-host launcher.

    With no arguments, relies on the TPU pod environment variables (the
    standard ``jax.distributed.initialize()`` auto-detection). Returns True
    if a multi-process runtime was initialized, False for single-host no-op.
    """
    log = get_logger("multihost")
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    if coordinator_address is None and num_processes is None:
        try:
            import os
            # every launcher jax.distributed auto-detects, not just TPU
            # pods: gating on TPU vars alone would silently skip init under
            # SLURM/Open MPI/GKE, leaving each host running an independent
            # duplicate campaign (every is_primary() would be True)
            if not any(k in os.environ for k in
                       ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                        "MEGASCALE_COORDINATOR_ADDRESS",
                        "JAX_COORDINATOR_ADDRESS", "SLURM_PROCID",
                        "OMPI_COMM_WORLD_RANK", "PMI_RANK")):
                return False      # single host, nothing to do
            jax.distributed.initialize()
        except Exception as e:   # noqa: BLE001 — single-host fallback
            log.warning(f"distributed init skipped: {e}")
            return False
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    n = jax.process_count()
    log.info(f"distributed runtime: {n} processes, "
             f"{len(jax.devices())} global devices")
    return n > 1


def is_primary() -> bool:
    """True on the process that should own file IO (checkpoints, CSV trees)."""
    return jax.process_index() == 0

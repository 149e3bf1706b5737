"""Mesh-sharded scale-out layer (the distributed backend SURVEY.md §5.7 calls for).

See :mod:`mmidv1_tpu.parallel.mesh` for the design notes.
"""

from . import multihost
from .ensemble import (run_mala_gspmd, run_mh_gspmd, run_mh_sharded,
                       run_nuts_gspmd, run_nuts_logit_gspmd,
                       run_pso_sharded, run_pt_gspmd)
from .mesh import (CHAINS_AXIS, batch_sharding, check_divisible, ensemble_mesh,
                   replicated_sharding, shard_ensemble_pytree,
                   shard_state_fields)

__all__ = [
    "CHAINS_AXIS",
    "batch_sharding",
    "check_divisible",
    "ensemble_mesh",
    "replicated_sharding",
    "shard_ensemble_pytree",
    "shard_state_fields",
    "run_mh_gspmd",
    "run_mh_sharded",
    "run_pso_sharded",
    "run_pt_gspmd",
    "run_mala_gspmd",
    "run_nuts_gspmd",
    "run_nuts_logit_gspmd",
    "multihost",
]

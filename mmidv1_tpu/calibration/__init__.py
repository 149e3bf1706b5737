from .param_space import ParameterSpace, CLAMP, REFLECT
from .objective import build_objective, build_incidence_fn, make_time_grid, lowest
from .mh import MHConfig, MHResult, run_mh
from .mala import MALAConfig, MALAResult, run_mala
from .tempering import PTConfig, PTResult, run_pt
from .pso import PSOConfig, PSOResult, PSOVariant, Topology, run_pso
from .hill import HillClimbConfig, HillClimbResult, run_hill_climb
from .nuts import (NUTSConfig, NUTSResult, run_nuts, run_nuts_dense,
                   run_nuts_whitened)
from .calibrator import CalibrationResult, calibrate, condition_covariance
from .sir_space import SIRParameterSpace
from .sir_objective import build_sir_objective

__all__ = [
    "ParameterSpace", "CLAMP", "REFLECT",
    "build_objective", "build_incidence_fn", "make_time_grid", "lowest",
    "MHConfig", "MHResult", "run_mh",
    "MALAConfig", "MALAResult", "run_mala",
    "PTConfig", "PTResult", "run_pt",
    "PSOConfig", "PSOResult", "PSOVariant", "Topology", "run_pso",
    "HillClimbConfig", "HillClimbResult", "run_hill_climb",
    "NUTSConfig", "NUTSResult", "run_nuts", "run_nuts_dense",
    "run_nuts_whitened",
    "CalibrationResult", "calibrate", "condition_covariance",
    "SIRParameterSpace", "build_sir_objective",
]

from .param_space import ParameterSpace, CLAMP, REFLECT
from .objective import build_objective, build_incidence_fn, make_time_grid, lowest

__all__ = [
    "ParameterSpace", "CLAMP", "REFLECT",
    "build_objective", "build_incidence_fn", "make_time_grid", "lowest",
]

"""Calibratable-parameter space for the age-structured SIR model.

Re-design of ``SIRParameterManager``
(reference: ``src/sir_age_structured/parameters/SIRParameterManager.cpp:6-96``):
name grammar ``q`` / ``scale_C_total`` / ``gamma_<age>`` with the reference's
default proposal sigmas; ``apply`` is a pure jit/vmap-safe scatter into an
:class:`mmidv1_tpu.models.sir.AgeSIRParams` pytree. Constraint modes (clamp /
reflect) are inherited from the SEPAIHRD :class:`ParameterSpace` — they only
touch the bounds arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.sir import AgeSIRParams
from ..utils.exceptions import InvalidParameterException
from .param_space import ParameterSpace

DEFAULT_SIGMAS = {"q": 0.05, "scale_C_total": 0.05, "gamma": 0.01}


@dataclasses.dataclass(frozen=True)
class SIRParameterSpace(ParameterSpace):
    """Maps (q, scale_C_total, gamma_i) names onto AgeSIRParams leaves."""

    @classmethod
    def create(cls, names: Sequence[str],
               bounds: Dict[str, Tuple[float, float]],
               sigmas: Optional[Dict[str, float]],
               template: AgeSIRParams) -> "SIRParameterSpace":
        if not names:
            raise InvalidParameterException("SIRParameterSpace",
                                            "Parameter names list cannot be empty.")
        if len(set(names)) != len(names):
            raise InvalidParameterException("SIRParameterSpace",
                                            "Duplicate parameter names.")
        sigmas = dict(sigmas or {})
        n_ages = template.n_ages
        scatter: Dict[str, list] = {}
        for ti, name in enumerate(names):
            if name == "q":
                field, idx = "q", -1
                sigmas.setdefault(name, DEFAULT_SIGMAS["q"])
            elif name == "scale_C_total":
                field, idx = "scale_C", -1
                sigmas.setdefault(name, DEFAULT_SIGMAS["scale_C_total"])
            elif name.startswith("gamma_"):
                try:
                    idx = int(name[6:])
                except ValueError:
                    raise InvalidParameterException(
                        "SIRParameterSpace",
                        f"Could not parse age index from parameter name '{name}'")
                if not (0 <= idx < n_ages):
                    raise InvalidParameterException(
                        "SIRParameterSpace",
                        f"Invalid age index in parameter name '{name}'. "
                        f"Max index: {n_ages - 1}")
                field = "gamma"
                sigmas.setdefault(name, DEFAULT_SIGMAS["gamma"])
            else:
                raise InvalidParameterException(
                    "SIRParameterSpace",
                    f"Parameter name '{name}' not recognized for AgeSIRModel "
                    "calibration.")
            if name not in bounds:
                raise InvalidParameterException(
                    "SIRParameterSpace", f"Missing bounds for parameter: {name}")
            scatter.setdefault(field, []).append((idx, ti))

        packed = {
            field: (np.array([i for i, _ in pairs], dtype=np.int32),
                    np.array([t for _, t in pairs], dtype=np.int32))
            for field, pairs in scatter.items()
        }
        # Host (NumPy) constants, like ParameterSpace.create: closure-captured
        # bounds lower to MLIR literals without a device fetch at trace time
        import jax.dtypes
        dt = jax.dtypes.canonicalize_dtype(np.float64)
        lo = np.asarray([bounds[n][0] for n in names], dtype=dt)
        hi = np.asarray([bounds[n][1] for n in names], dtype=dt)
        lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
        sg = np.asarray([sigmas[n] for n in names], dtype=dt)
        return cls(names=tuple(names), lower=lo, upper=hi, sigmas=sg,
                   _scatter=packed)

    # apply/extract are inherited: the parent's one-hot contraction works on
    # any params pytree with .replace/.dtype, and the _scatter built above
    # uses the same (field -> (indices, theta positions)) layout

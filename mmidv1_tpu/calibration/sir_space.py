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
        lo = jnp.asarray([bounds[n][0] for n in names])
        hi = jnp.asarray([bounds[n][1] for n in names])
        lo, hi = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
        sg = jnp.asarray([sigmas[n] for n in names])
        return cls(names=tuple(names), lower=lo, upper=hi, sigmas=sg,
                   _scatter=packed)

    def apply(self, base: AgeSIRParams, theta: jnp.ndarray) -> AgeSIRParams:
        updates = {}
        for field, (fidx, tidx) in self._scatter.items():
            cur = getattr(base, field)
            if fidx[0] == -1:
                updates[field] = theta[tidx[0]].astype(cur.dtype)
            else:
                # one-hot contraction, not .at[].set — see ParameterSpace.apply
                n = cur.shape[-1]
                sel = np.zeros((n, self.dim), dtype=bool)
                sel[fidx, tidx] = True
                mask = np.zeros((n,), dtype=bool)
                mask[fidx] = True
                # select+sum, NOT a matmul: TPU f32 matmuls multiply in
                # bfloat16 by default, which would round the applied
                # parameter values to ~3 digits (see OPS_ANALYSIS.md)
                gathered = jnp.sum(jnp.where(jnp.asarray(sel),
                                             theta.astype(cur.dtype), 0),
                                   axis=-1)
                updates[field] = jnp.where(jnp.asarray(mask), gathered, cur)
        return base.replace(**updates)

    def extract(self, params: AgeSIRParams) -> jnp.ndarray:
        theta = jnp.zeros((self.dim,), dtype=params.N.dtype)
        for field, (fidx, tidx) in self._scatter.items():
            cur = getattr(params, field)
            if fidx[0] == -1:
                theta = theta.at[tidx[0]].set(cur)
            else:
                theta = theta.at[tidx].set(cur[..., fidx])
        return theta

"""Calibratable-parameter space: name -> pytree-slot mapping + constraints.

TPU-native re-design of ``SEPAIHRDParameterManager``
(reference: ``src/model/parameters/SEPAIHRDParameterManager.cpp``). The reference
mutates a shared model object under locks and clones; here the mapping is resolved
ONCE at configuration time into static scatter indices, and ``apply`` is a pure
jit/vmap-safe function ``(base_params, theta) -> params``. Name grammar (identical
to the reference dispatch, :91-158 / :197-267):

- scalars: ``beta``, ``theta``, ``sigma``, ``gamma_*``, ``*0_multiplier``,
  ``seed_exposed``, ``runup_days``
- age-indexed: ``a_i``, ``h_infec_i``, ``p_i``, ``h_i``, ``icu_i``, ``d_H_i``,
  ``d_ICU_i``, ``d_community_i``
- schedule-indexed (1-based): ``beta_i`` -> ``beta_values[i-1]``,
  ``kappa_i`` -> ``kappa_values[i-1]`` (``kappa_1`` is the fixed NPI baseline and
  is rejected, matching ``PiecewiseConstantNpiStrategy`` with a fixed baseline)

Constraint modes (reference ``applyConstraints``, :302-347):
- CLAMP (optimization): clip into [lo, hi]
- REFLECT (MCMC): reflect off the bounds, preserving detailed balance
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..params import SEPAIHRDParams
from ..utils.exceptions import InvalidParameterException

CLAMP = "clamp"
REFLECT = "reflect"

_SCALAR_NAMES = {
    "beta": "beta", "theta": "theta", "sigma": "sigma",
    "gamma_p": "gamma_p", "gamma_A": "gamma_A", "gamma_I": "gamma_I",
    "gamma_H": "gamma_H", "gamma_ICU": "gamma_ICU",
    "E0_multiplier": "E0_multiplier", "P0_multiplier": "P0_multiplier",
    "A0_multiplier": "A0_multiplier", "I0_multiplier": "I0_multiplier",
    "H0_multiplier": "H0_multiplier", "ICU0_multiplier": "ICU0_multiplier",
    "R0_multiplier": "R0_multiplier", "D0_multiplier": "D0_multiplier",
    "seed_exposed": "seed_exposed", "runup_days": "runup_days",
}

# Longest-prefix-first, mirroring the reference's dispatch order which checks
# e.g. h_infec_ before h_ (SEPAIHRDParameterManager.cpp:125-139).
_VECTOR_PREFIXES = [
    ("h_infec_", "h_infec"),
    ("d_community_", "d_community"),
    ("d_ICU_", "d_ICU"),
    ("d_H_", "d_H"),
    ("icu_", "icu"),
    ("a_", "a"),
    ("p_", "p"),
    ("h_", "h"),
]


def _resolve(name: str, n_ages: int, n_beta: int, n_kappa: int) -> Tuple[str, int]:
    """Return (field, index) for a calibratable name; index -1 for scalars."""
    if name in _SCALAR_NAMES:
        return _SCALAR_NAMES[name], -1
    if name.startswith("beta_"):
        try:
            idx = int(name[5:]) - 1
        except ValueError:
            raise InvalidParameterException("ParameterSpace",
                                            f"Could not parse index from: {name}")
        if not (0 <= idx < n_beta):
            raise InvalidParameterException("ParameterSpace",
                                            f"beta index out of range: {name}")
        return "beta_values", idx
    if name.startswith("kappa_"):
        try:
            idx = int(name[6:]) - 1
        except ValueError:
            raise InvalidParameterException("ParameterSpace",
                                            f"Could not parse index from: {name}")
        if idx == 0:
            raise InvalidParameterException(
                "ParameterSpace",
                f"'{name}' refers to the fixed baseline kappa and cannot be "
                "calibrated")
        if not (0 <= idx < n_kappa):
            raise InvalidParameterException("ParameterSpace",
                                            f"kappa index out of range: {name}")
        return "kappa_values", idx
    for prefix, field in _VECTOR_PREFIXES:
        if name.startswith(prefix):
            try:
                idx = int(name[len(prefix):])
            except ValueError:
                raise InvalidParameterException(
                    "ParameterSpace", f"Could not parse age index from: {name}")
            if not (0 <= idx < n_ages):
                raise InvalidParameterException(
                    "ParameterSpace", f"Invalid age index for parameter {name}")
            return field, idx
    raise InvalidParameterException("ParameterSpace", f"Unknown parameter name: {name}")


@dataclasses.dataclass(frozen=True)
class ParameterSpace:
    """Static description of the calibration space over :class:`SEPAIHRDParams`."""

    names: Tuple[str, ...]
    lower: jnp.ndarray      # (d,)
    upper: jnp.ndarray      # (d,)
    sigmas: jnp.ndarray     # (d,) proposal sigmas
    # field -> (positions_in_field, positions_in_theta); scalars use position -1
    _scatter: Dict[str, Tuple[np.ndarray, np.ndarray]] = dataclasses.field(repr=False,
                                                                           default=None)

    @property
    def dim(self) -> int:
        return len(self.names)

    @classmethod
    def create(cls, names: Sequence[str], bounds: Dict[str, Tuple[float, float]],
               sigmas: Dict[str, float], template: SEPAIHRDParams) -> "ParameterSpace":
        """Validated construction (reference ctor semantics: every name must have
        bounds and a proposal sigma, :47-53)."""
        if not names:
            raise InvalidParameterException("ParameterSpace",
                                            "Parameter names list cannot be empty.")
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if list(names).count(n) > 1})
            raise InvalidParameterException(
                "ParameterSpace",
                f"Duplicate parameter names: {dupes} (aliased theta entries "
                "would silently shadow each other)")
        n_ages = template.n_ages
        n_beta = int(template.beta_values.shape[-1])
        n_kappa = int(template.kappa_values.shape[-1])

        scatter: Dict[str, List[Tuple[int, int]]] = {}
        for ti, name in enumerate(names):
            if name not in sigmas:
                raise InvalidParameterException(
                    "ParameterSpace", f"Missing proposal sigma for parameter: {name}")
            if name not in bounds:
                raise InvalidParameterException(
                    "ParameterSpace", f"Missing bounds for parameter: {name}")
            field, idx = _resolve(name, n_ages, n_beta, n_kappa)
            scatter.setdefault(field, []).append((idx, ti))

        packed = {
            field: (np.array([i for i, _ in pairs], dtype=np.int32),
                    np.array([t for _, t in pairs], dtype=np.int32))
            for field, pairs in scatter.items()
        }
        # Host (NumPy) constants — embedded into jit programs by closure
        # capture without a device fetch at lowering (see params._as_f).
        import jax.dtypes
        dt = jax.dtypes.canonicalize_dtype(np.float64)
        lo = np.asarray([bounds[n][0] for n in names], dtype=dt)
        hi = np.asarray([bounds[n][1] for n in names], dtype=dt)
        # swap inverted bounds like the reference (:330)
        lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
        sg = np.asarray([sigmas[n] for n in names], dtype=dt)
        return cls(names=tuple(names), lower=lo, upper=hi, sigmas=sg,
                   _scatter=packed)

    # --- pure functions ---------------------------------------------------

    def apply(self, base: SEPAIHRDParams, theta: jnp.ndarray) -> SEPAIHRDParams:
        """Scatter a theta vector into a fresh params pytree (pure; vmap-safe).

        ``theta`` is a single (d,) vector; batch with ``jax.vmap``. Vector
        fields use a static one-hot contraction instead of ``.at[].set`` —
        vmapped scatters serialize on TPU (measured ~30 ms across an
        8192-chain batch vs ~0 for the selection matmul).
        """
        updates = {}
        for field, (fidx, tidx) in self._scatter.items():
            cur = getattr(base, field)
            if fidx[0] == -1:  # scalar field: exactly one theta entry
                updates[field] = theta[tidx[0]].astype(cur.dtype)
            else:
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

    def extract(self, params: SEPAIHRDParams) -> jnp.ndarray:
        """Gather the current theta from a params pytree
        (reference ``getCurrentParameters``)."""
        theta = jnp.zeros((self.dim,), dtype=params.dtype)
        for field, (fidx, tidx) in self._scatter.items():
            cur = getattr(params, field)
            if fidx[0] == -1:
                theta = theta.at[tidx[0]].set(cur)
            else:
                theta = theta.at[tidx].set(cur[..., fidx])
        return theta

    def clamp(self, theta: jnp.ndarray) -> jnp.ndarray:
        """OPTIMIZATION_CLAMP constraint mode."""
        return jnp.clip(theta, self.lower, self.upper)

    def reflect(self, theta: jnp.ndarray) -> jnp.ndarray:
        """MCMC_REFLECT constraint mode: reflect off bounds (reference
        ``reflectBound``, :302-313), preserving detailed balance."""
        lo, hi = self.lower, self.upper
        width = hi - lo
        degenerate = width <= 0
        w = jnp.where(degenerate, 1.0, width)
        y = jnp.mod(theta - lo, 2.0 * w)
        y = jnp.where(y < 0, y + 2.0 * w, y)
        refl = jnp.where(y <= w, lo + y, hi - (y - w))
        return jnp.where(degenerate, lo, refl)

    def constrain(self, theta: jnp.ndarray, mode: str) -> jnp.ndarray:
        if mode == CLAMP:
            return self.clamp(theta)
        if mode == REFLECT:
            return self.reflect(theta)
        raise ValueError(f"unknown constraint mode {mode!r}")

    def in_bounds(self, theta: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((theta >= self.lower) & (theta <= self.upper), axis=-1)

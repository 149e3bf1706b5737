"""Sampler checkpoint/resume + MCMC trace CSVs.

The reference writes trace checkpoints every ``report_interval``
(``MetropolisHastingsSampler.cpp:353-411``: ``posterior_trace_checkpoint.csv``
with the last 5000 samples, ``posterior_trace_final.csv`` / ``posterior_trace
.csv`` at the end) but has NO resume path — resume is manual re-feeding of the
dumped parameters (SURVEY.md section 5, checkpoint/resume). Here sampler state
is a pytree, so checkpointing is a structured save and resume is exact:
``run_mh(..., initial_state=load_mh_state(path))`` continues the run
bit-for-bit (tested in ``tests/test_checkpoint.py``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..calibration.mh import MHState


def _save_state_npz(path: str, state) -> None:
    """Atomic NamedTuple-of-arrays save: write a tmp npz, then rename. One
    shared routine so the atomicity/naming behavior cannot drift between the
    MH/PT/NUTS savers."""
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **{k: np.asarray(v)
                                for k, v in state._asdict().items()})
    os.replace(tmp, path)


def save_mh_state(path: str, state: MHState) -> None:
    """Save an MHState (atomically: write + rename) as an .npz archive."""
    _save_state_npz(path, state)


def _load_state_npz(path: str, cls):
    with np.load(path) as z:
        import jax.numpy as jnp
        return cls(**{k: jnp.asarray(z[k]) for k in cls._fields})


def load_mh_state(path: str) -> MHState:
    """Load an MHState written by :func:`save_mh_state` (host arrays; JAX
    re-devices them on first use)."""
    return _load_state_npz(path, MHState)


def save_pt_state(path: str, state) -> None:
    """Save a tempering :class:`~mmidv1_tpu.calibration.tempering.PTState`
    (same atomic npz pattern as :func:`save_mh_state`)."""
    _save_state_npz(path, state)


def load_pt_state(path: str):
    from ..calibration.tempering import PTState, _spacings_from_betas

    with np.load(path) as z:
        import jax.numpy as jnp
        fields = {k: jnp.asarray(z[k]) for k in PTState._fields if k in z}
        # pre-ladder-adaptation checkpoints: synthesize the ladder fields
        # (geometric beta_min=0.05 was the only ladder those runs had)
        if "betas" not in fields:
            K = int(fields["x"].shape[0])
            dtype = fields["x"].dtype
            expo = np.arange(K) / max(K - 1, 1)
            betas = np.asarray(0.05 ** expo)
            fields["betas"] = jnp.asarray(betas, dtype=dtype)
            fields["ladder_s"] = jnp.asarray(_spacings_from_betas(betas),
                                             dtype=dtype)
            fields["swap_prob"] = jnp.zeros((max(K - 1, 1),), dtype=dtype)
        return PTState(**fields)


def save_nuts_state(path: str, state) -> None:
    """Save a :class:`~mmidv1_tpu.calibration.nuts.NUTSState` (atomic npz).

    For :func:`~mmidv1_tpu.calibration.nuts.run_nuts_dense` runs the state is
    in whitened z-coordinates — valid to resume only with the same
    ``mu``/``scale`` factor.
    """
    _save_state_npz(path, state)


def load_nuts_state(path: str):
    from ..calibration.nuts import NUTSState

    return _load_state_npz(path, NUTSState)


def write_posterior_trace(path: str, samples: np.ndarray,
                          logps: Optional[np.ndarray] = None,
                          names: Optional[Sequence[str]] = None,
                          max_rows: Optional[int] = None) -> None:
    """Reference-format posterior trace CSV
    (``MetropolisHastingsSampler.cpp:440-469``): one row per stored sample,
    ``sample,logp,<param values...>``; ``max_rows`` keeps the last N rows
    (the checkpoint files keep 5000, :380-382)."""
    samples = np.asarray(samples)
    if samples.ndim == 3:                      # (n_stored, B, d) ensemble
        if logps is not None:
            logps = np.asarray(logps).reshape(-1)
        samples = samples.reshape(-1, samples.shape[-1])
    if max_rows is not None and len(samples) > max_rows:
        samples = samples[-max_rows:]
        if logps is not None:
            logps = logps[-max_rows:]
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    col_names = (list(names) if names is not None
                 else [f"p{j}" for j in range(samples.shape[1])])
    if logps is not None:
        data = np.concatenate([np.asarray(logps)[:, None], samples], axis=1)
        cols = ["logp"] + col_names
    else:
        data, cols = samples, col_names

    # Native C++ writer when available (~20x on production-size traces);
    # identical format either way. Written to a tmp file + atomic rename so
    # a kill mid-write (the autopilot watchdog SIGKILLs hung children) can
    # never truncate the previous complete trace (same discipline as
    # _save_state_npz).
    from . import native

    tmp = f"{path}.tmp.{os.getpid()}"
    if native.write_trace_csv(tmp, ",".join(cols), data):
        os.replace(tmp, path)
        return
    with open(tmp, "w") as f:
        f.write("sample," + ",".join(cols) + "\n")
        for i, row in enumerate(data):
            f.write(str(i) + "".join(f",{v:.8e}" for v in row) + "\n")
    os.replace(tmp, path)


def make_checkpoint_progress_fn(out_dir: str, names: Sequence[str],
                                every: int = 1):
    """A ``progress_fn`` for :func:`run_mh` that ALSO mirrors the reference's
    console progress line; pair with periodic :func:`save_mh_state` calls from
    the driver loop for on-disk checkpointing."""
    from .logging import get_logger

    log = get_logger("mh")
    count = [0]

    def progress(step, accept_rate, best_logp, mean_scale):
        count[0] += 1
        if count[0] % max(1, every) == 0:
            log.info(f"step {int(step)}: acceptance {float(accept_rate):.3f}, "
                     f"best logL {float(best_logp):.6e}, "
                     f"scale {float(mean_scale):.4f}")

    return progress

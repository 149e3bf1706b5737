"""Host-side construction of setup-time constants.

Why this exists: jit-closure constants are lowered to MLIR literals, and
lowering fetches each constant's value from wherever it lives. When setup
code runs eagerly on a remote/tunneled accelerator (this environment's
single TPU chip sits behind an RPC tunnel with ~30 ms round trips and
multi-second first-sync stalls), a single device-resident constant can
stall ``jit(...).lower()`` for minutes — measured 181-559 s for the
Spain-2020 objective program, the entire "compile" stall recorded in
BENCH_r01. The fix is architectural: setup-time values (parameters,
observation tables, initial states) stay on the HOST — either as NumPy
arrays (see ``params._as_f``) or as CPU-backend arrays created under
:func:`host_constants` — so the tunnel never enters the lowering path.
The traced computation still runs wherever its *arguments* live.
"""

from __future__ import annotations

import contextlib

import jax


def host_constants():
    """Context manager: run eager array construction on the host CPU backend.

    Use around setup-time model evaluations (e.g. ``runup_seeded_state``,
    ``infer_initial_state``) whose results will be closure-captured by jit
    programs. Falls back to a no-op when no CPU backend is available.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)

"""First-RPC wedge guard for tunneled TPU sessions.

The axon tunnel serves one client session at a time; a client whose
handshake races a previous session's teardown answers ``jax.devices()``
normally but blocks FOREVER on its first real device RPC (observed
repeatedly 2026-08-20, OPS_ANALYSIS.md "The tunnel's wedge mode").
``assert_first_rpc_responsive`` issues one trivial device op under a hard
timer so a wedged process dies fast with a distinctive exit code that
unattended drivers (scripts/tpu_autopilot.py) treat as retryable, instead
of tying the tunnel up until an external silence watchdog fires.

No reference analogue: the reference (adjo0043) runs on local hardware;
this failure mode is specific to the tunneled-TPU deployment.
"""

import os
import threading

WEDGE_EXIT_CODE = 7


def assert_first_rpc_responsive(timeout_s: float = 120.0) -> None:
    """Run one tiny device op; ``os._exit(7)`` if it hangs ``timeout_s``.

    Call once right after backend init (``jax.devices()``) and before the
    first real compile/execute. A no-op on non-TPU backends. Uses
    ``os._exit`` because the wedged RPC holds the main thread — no
    exception can interrupt it; only process death frees the tunnel.
    """
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        return
    ok = threading.Event()

    def _bail():
        if not ok.wait(timeout_s):
            print(f"first device RPC unresponsive for {timeout_s:.0f}s — "
                  f"wedged tunnel session, exiting rc={WEDGE_EXIT_CODE}",
                  flush=True)
            os._exit(WEDGE_EXIT_CODE)

    threading.Thread(target=_bail, daemon=True).start()
    jax.block_until_ready(jnp.zeros((8,), jnp.float32) + 1.0)
    ok.set()
    print("device responsive", flush=True)

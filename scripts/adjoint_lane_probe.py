#!/usr/bin/env python
"""Probe the Pallas adjoint engine's backward lane width on real TPU.

The R-compartment drop (ops/sepaihrd_adjoint.py: 80-row state) cut every
day-state buffer ~9%, which should let the BACKWARD kernel fit 512 lanes in
the 16 MB scoped-VMEM budget (it previously overflowed by ~0.6 MB at 512,
OPS_ANALYSIS.md item 4). This measures value_and_grad throughput at
bwd_block_b in {512, 1024} (-> 256 / 512 backward lanes) and checks the two
engines agree bitwise-ish, so the better default can be committed with
evidence.

Usage: python scripts/adjoint_lane_probe.py [--batch 2048] [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=20,
                   help="in-scan grad evals per timing call (amortizes the "
                        "~30 ms tunnel dispatch)")
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    p.add_argument("--bwd", type=int, nargs="+", default=[512, 1024, 2048],
                   help="bwd_block_b values to probe (lanes = value // 2); "
                        "widths past 512 need the raised scoped-VMEM cap "
                        "(ops/sepaihrd_adjoint.VMEM_LIMIT_BYTES)")
    p.add_argument("--vmem-mb", type=int, default=96,
                   help="scoped-VMEM cap (MiB) applied when probing widths "
                        "past bwd_block_b=512 (v5e has 128 MiB physical; "
                        "the Mosaic default budget is 16)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.ops import build_objective_pallas_grad

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    dtype = jnp.float32
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts

    B = args.batch
    key = jax.random.PRNGKey(0)
    mid = 0.5 * (space.lower + space.upper)
    thetas = (mid[None, :] + 0.05 * space.sigmas[None, :] *
              jax.random.normal(key, (B, space.dim), dtype))

    from mmidv1_tpu.ops import sepaihrd_adjoint

    results = {}
    outs = {}
    for bwd in args.bwd:
        # the knob is read at trace time; each bwd width traces fresh
        # (distinct block_lanes static arg), so flipping it per-width works
        sepaihrd_adjoint.VMEM_LIMIT_BYTES = (
            args.vmem_mb << 20 if bwd > 512 else None)
        vg = build_objective_pallas_grad(
            space, params, data, ts, substeps=args.substeps,
            tableau=args.tableau, constraint_mode=REFLECT, dtype=dtype,
            bwd_block_b=bwd)

        @jax.jit
        def scan_grads(key, vg=vg):
            def body(acc, k):
                t = thetas + 0.001 * jax.random.normal(k, thetas.shape, dtype)
                v, g = vg(t)
                return acc + v.sum() + g.sum(), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), dtype),
                jax.random.split(key, args.steps))
            return acc

        try:
            t0 = time.perf_counter()
            scan_grads(jax.random.PRNGKey(7)).block_until_ready()
            print(f"bwd_block_b={bwd}: compile+first {time.perf_counter()-t0:.1f}s")
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                scan_grads(jax.random.PRNGKey(8 + rep)).block_until_ready()
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) / args.steps
            rate = B / dt
            results[bwd] = rate
            v, g = jax.block_until_ready(vg(thetas))
            outs[bwd] = (np.asarray(v), np.asarray(g))
            print(f"bwd_block_b={bwd} ({bwd // 2} bwd lanes): "
                  f"{rate:.3e} value_and_grad/s")
        except Exception as e:
            print(f"bwd_block_b={bwd} FAILED: {type(e).__name__}: {e}")
            results[bwd] = None

    ok = [b for b in args.bwd if results.get(b)]
    if len(ok) >= 2:
        v0, g0 = outs[ok[0]]
        for b in ok[1:]:
            v1, g1 = outs[b]
            dv = float(np.max(np.abs(v1 - v0)))
            dg = float(np.max(np.abs(g1 - g0) / (np.abs(g0) + 1e-6)))
            print(f"parity {ok[0]} vs {b}: max |dLL| {dv:.3e}, "
                  f"max rel |dgrad| {dg:.3e}")
        best = max(ok, key=lambda b: results[b])
        print(f"winner: bwd_block_b={best} at {results[best]:.3e}/s "
              f"({results[best] / results[ok[0]]:.2f}x vs {ok[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Attribute the adjoint-kernel compile+first-run time (VERDICT r3 item 7).

BENCH history for ``compile_first_run_s.pallas_adjoint_scan`` at B=8192:
r1 29.1 s -> r2 54.3 s -> r3 *209.7 s* (warm cache) — but the r3 COLD-cache
run measured **50.8 s** for the identical program
(BENCH_DETAILS_COLD.json). A warm persistent cache cannot be 4x slower than
a cold one for the same compile, so the 209.7 s is suspected to be tunnel /
device contention at measurement time, not a Mosaic compile regression from
the r3 bwd_block_b 512 -> 2048 default.

This probe separates the three candidate costs, per backward width:
  - trace+lower time (host only, no device),
  - compile time (jit AOT ``.compile()``),
  - first-dispatch time (device warmup / cache load),
and repeats the measurement twice per width so a one-off tunnel stall is
visible. Writes results/adjoint_compile_probe.json.

Run on the real TPU:  python scripts/adjoint_compile_probe.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--widths", type=int, nargs="+", default=[512, 1024, 2048])
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--steps", type=int, default=20,
                   help="scan length for the throughput row")
    p.add_argument("--cold", action="store_true",
                   help="fresh temp compilation cache (honest compile cost)")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "adjoint_compile_probe.json"))
    args = p.parse_args(argv)

    import jax
    if args.cold:
        import atexit
        import shutil
        import tempfile
        cache = tempfile.mkdtemp(prefix="jax_probe_cache_")
        atexit.register(shutil.rmtree, cache, ignore_errors=True)
    else:
        cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.ops import build_objective_pallas_grad

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}  "
          f"cache: {'COLD ' + cache if args.cold else 'warm'}", flush=True)
    if dev.platform != "tpu":
        print("not a TPU — the Mosaic compile path is what's being measured;"
              " aborting")
        return 1

    dtype = jnp.float32
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    space = pipe.space
    B = args.batch
    theta0 = jnp.asarray(space.extract(pipe.params), dtype)
    thetas = jnp.tile(theta0[None], (B, 1)) * \
        (1.0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(0),
                                        (B, space.dim), dtype))

    out = {"batch": B, "cache_mode": "cold" if args.cold else "warm",
           "device": f"{dev.platform}/{dev.device_kind}", "widths": {}}
    for w in args.widths:
        rows = []
        for rep in range(args.repeats):
            vg = build_objective_pallas_grad(
                space, pipe.params, pipe.data, pipe.ts, substeps=4,
                tableau="dopri5", constraint_mode=REFLECT, dtype=dtype,
                block_b=min(2048, B), bwd_block_b=w)

            # vary a closure-invisible constant so each repeat is a fresh
            # jit cache entry of the SAME program shape
            shift = jnp.float32(rep * 1e-9)

            def one(t, vg=vg, shift=shift):
                v, g = vg(t + shift)
                return v.sum() + g.sum()

            f = jax.jit(one)
            t0 = time.perf_counter()
            lowered = f.lower(thetas)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            compiled = lowered.compile()
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            compiled(thetas).block_until_ready()
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            compiled(thetas).block_until_ready()
            t_steady = time.perf_counter() - t0
            rows.append({"lower_s": t_lower, "compile_s": t_compile,
                         "first_dispatch_s": t_first,
                         "steady_dispatch_s": t_steady,
                         "grads_per_s": B / t_steady})
            print(f"bwd={w:5d} rep{rep}: lower {t_lower:6.1f}s  "
                  f"compile {t_compile:6.1f}s  first {t_first:6.2f}s  "
                  f"steady {t_steady:6.3f}s  ({B / t_steady:.3e} grads/s)",
                  flush=True)
        out["widths"][str(w)] = rows

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Adjoint compile-time ladder: what does the 2048-lane backward cost?

Round-3 VERDICT item: ``bench.py``'s warm-cache ``pallas_adjoint_scan``
compile+first-run grew 29.1s (r1) -> 54.3s (r2) -> 209.7s (r3) at B=8192.
Round 3 changed exactly one thing on that path: commit a2b7a3d made
``build_objective_pallas_grad`` default to ``bwd_block_b=2048`` (backward
kernel lanes 256 -> 1024, scoped VMEM raised to 96 MiB) for a measured
1.18x gradient-throughput win. This probe isolates whether the Mosaic
compile of the wide backward block is the regression, and what each width
actually buys, by compiling the EXACT bench program (B=8192, 20-step
scan over value_and_grad) at bwd_block_b in {512, 1024, 2048} — each in a
fresh subprocess against a fresh compilation-cache dir, so every number is
a true cold compile of just that program (the forward kernel and the rest
of the pipeline compile identically in all three, so deltas are the
backward kernel alone).

Writes results/adjoint_compile_probe.json and prints a markdown table.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from mmidv1_tpu.calibration.param_space import REFLECT
from mmidv1_tpu.cli.common import load_spain_pipeline
from mmidv1_tpu.ops import build_objective_pallas_grad

dtype = jnp.float32
B, GSTEPS, BWD = {batch}, 20, {bwd}
pipe = load_spain_pipeline({repo!r}, dtype=dtype)
space, params, data, ts_cal = pipe.space, pipe.params, pipe.data, pipe.ts
theta0 = space.extract(params).astype(dtype)
thetas = theta0[None, :] + 0.01 * space.sigmas.astype(dtype) * \
    jax.random.normal(jax.random.PRNGKey(1), (B, space.dim), dtype=dtype)
vg = build_objective_pallas_grad(space, params, data, ts_cal,
                                 substeps=3, tableau="cash_karp",
                                 constraint_mode=REFLECT, dtype=dtype,
                                 bwd_block_b=BWD)

@jax.jit
def scan_grads(key):
    def body(acc, k):
        t = thetas + 0.001 * jax.random.normal(k, thetas.shape, dtype)
        v, g = vg(t)
        return acc + v.sum() + g.sum(), None
    acc, _ = jax.lax.scan(body, jnp.zeros((), dtype),
                          jax.random.split(key, GSTEPS))
    return acc

t0 = time.perf_counter()
scan_grads(jax.random.PRNGKey(7)).block_until_ready()
compile_s = time.perf_counter() - t0
times = []
for i in range(3):
    t0 = time.perf_counter()
    scan_grads(jax.random.PRNGKey(8 + i)).block_until_ready()
    times.append(time.perf_counter() - t0)
dt = float(np.median(times)) / GSTEPS
print("RESULT " + json.dumps({{"bwd_block_b": BWD,
                               "compile_first_run_s": compile_s,
                               "grad_evals_per_sec": B / dt}}))
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--widths", type=int, nargs="+",
                   default=[512, 1024, 2048])
    p.add_argument("--out", default=os.path.join(
        REPO, "results", "adjoint_compile_probe.json"))
    args = p.parse_args(argv)

    rows = []
    for bwd in args.widths:
        cache = tempfile.mkdtemp(prefix=f"adj_probe_{bwd}_")
        try:
            code = CHILD.format(repo=REPO, cache=cache,
                                batch=args.batch, bwd=bwd)
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=1800, cwd=REPO)
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("RESULT ")), None)
            if line is None:
                rows.append({"bwd_block_b": bwd, "error":
                             (r.stderr or "no output").strip()[-500:]})
            else:
                rows.append(json.loads(line[len("RESULT "):]))
        except subprocess.TimeoutExpired:
            rows.append({"bwd_block_b": bwd, "error": "timeout 1800s"})
        finally:
            shutil.rmtree(cache, ignore_errors=True)
        print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"batch": args.batch, "rows": rows}, f, indent=2)
    print("\n| bwd_block_b | cold compile+first run | grad evals/s |")
    print("|---|---|---|")
    for row in rows:
        if "error" in row:
            print(f"| {row['bwd_block_b']} | ERROR | {row['error'][:60]} |")
        else:
            print(f"| {row['bwd_block_b']} | {row['compile_first_run_s']:.1f}s "
                  f"| {row['grad_evals_per_sec']:.3e} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Chain-count x dispatch-budget utilization probe (round-4 verdict item 5).

The round-4 campaign ran 64 chains at 17.5-19k value-and-grads/s incl.
host against a benched engine peak of ~207k/s — a 12x utilization gap on
the production path — and the verdict found no committed measurement
justifying 64 chains over 128/256 under the tunnel's ~90 s dispatch
deadline (50 s budget). This probe runs the SAME production recipe
(logit-dense mass, power-logit auto, depth 10, warm start) at chains in
{64, 128, 256} for a fixed short iteration budget each, and records per
chain count:

  * value_and_grads/s incl host (campaign_metadata.json)
  * steady-state seconds/iteration (live segment-line timing)
  * burned-window worst split-R-hat excess decay per ITERATION and per
    WALL-SECOND (the decision metric: R-hat excess contraction per
    second of chip time, which folds chain-count ESS gains and
    iteration-rate losses into one number)
  * projected seconds to the 1.05 gate from this probe's trajectory

Writes results/chain_count_probe.json. Run on a QUIET chip (the probe
refuses when another campaign holds the TPU, same guard as bench.py).

Reference role being measured: the optimizer-comparison harness of
src/model/sepaihrd_objective_benchmark_main.cpp:420-557.
"""

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
SCRIPTS = os.path.join(REPO, "scripts")
sys.path.insert(0, SCRIPTS)
sys.path.insert(0, REPO)

from r4_supervisor import SEG_RE, log, run_timed  # noqa: E402

TRACE = os.path.join(REPO, "results", "r4_probe_d10", "samples.npz")
OUT_JSON = os.path.join(REPO, "results", "chain_count_probe.json")


def probe_cmd(chains, iters, out):
    return [PY, os.path.join(SCRIPTS, "nuts_campaign.py"),
            "--chains", str(chains), "--iterations", str(iters),
            "--warmup", "20", "--depth", "10", "--mass", "logit-dense",
            "--power", "auto", "--delta-target", "0.8",
            "--eps-floor", "1e-3", "--eps-ceil", "1.3e-3",
            "--trace", TRACE, "--warm", TRACE, "--seed", "47",
            "--out", out]


def parse(chains, out_dir, lines, rc):
    res = {"chains": chains, "rc": rc, "out": out_dir}
    try:
        with open(os.path.join(out_dir, "campaign_metadata.json")) as f:
            meta = json.load(f)
    except OSError as e:
        res["meta_error"] = repr(e)
        return res
    res["vag_per_sec_incl_host"] = meta.get("value_and_grads_per_sec_incl_host")
    res["wall_seconds"] = meta.get("wall_seconds")
    res["mean_accept"] = meta.get("mean_accept")
    res["mean_tree_depth"] = meta.get("mean_tree_depth")
    res["diagnostics"] = {k: meta.get("diagnostics", {}).get(k) for k in
                          ("max_rhat", "max_rank_rhat", "min_ess",
                           "min_ess_per_sec")}
    segs = [(t, int(m.group(1)), float(m.group(2)))
            for t, line in lines for m in [SEG_RE.search(line)] if m]
    res["n_seg_points"] = len(segs)
    if len(segs) >= 3:
        half = segs[len(segs) // 2:]
        dt, dit = half[-1][0] - half[0][0], half[-1][1] - half[0][1]
        if dit > 0 and dt > 0:
            res["s_per_iter"] = dt / dit
        r0, rl = segs[0][2], segs[-1][2]
        it0, itl = segs[0][1], segs[-1][1]
        if itl > it0 and r0 > 1.001 and rl > 1.001:
            rate_it = (math.log(r0 - 1) - math.log(rl - 1)) / (itl - it0)
            res["rhat_first"], res["rhat_last"] = r0, rl
            res["excess_decay_per_iter"] = rate_it
            if "s_per_iter" in res and rate_it > 0:
                res["excess_decay_per_wall_s"] = rate_it / res["s_per_iter"]
                res["proj_seconds_to_gate"] = (
                    math.log((rl - 1) / 0.04) / rate_it * res["s_per_iter"]
                    if rl > 1.04 else 0.0)
    return res


def main():
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=60,
                   help="post-warmup iterations per chain-count leg")
    p.add_argument("--chain-counts", type=int, nargs="+",
                   default=[64, 128, 256])
    args = p.parse_args()

    from bench import tpu_busy_processes
    hogs = tpu_busy_processes()
    if hogs:
        for pid, cmd in hogs:
            log(f"TPU busy: pid {pid}: {cmd}")
        log("refusing to probe under contention")
        return 1

    results = []
    for chains in args.chain_counts:
        out = os.path.join(REPO, "results", f"chain_probe_c{chains}")
        # stale metadata from an earlier attempt must not supply numbers
        # for a probe that crashed before writing its own
        stale = os.path.join(out, "campaign_metadata.json")
        if os.path.exists(stale):
            os.remove(stale)
        rc, lines = run_timed(probe_cmd(chains, args.iterations, out),
                              timeout=3600, tag=f"c{chains}")
        r = parse(chains, out, lines, rc)
        results.append(r)
        log(f"c{chains}: " + json.dumps(
            {k: v for k, v in r.items() if k not in ("out", "diagnostics")}))
        time.sleep(60)   # let the tunnel session expire between legs

    usable = [r for r in results if "excess_decay_per_wall_s" in r]
    decision = None
    if usable:
        best = max(usable, key=lambda r: r["excess_decay_per_wall_s"])
        decision = {"best_chains": best["chains"],
                    "metric": "excess_decay_per_wall_s",
                    "n_usable": len(usable)}
        if len(usable) < 2:
            decision["degraded"] = True
            log(f"DEGRADED: only {len(usable)} usable legs — "
                "do not treat this as a ladder")
    with open(OUT_JSON, "w") as f:
        json.dump({"iterations": args.iterations, "results": results,
                   "decision": decision}, f, indent=2)
    log(f"wrote {OUT_JSON}")
    return 0 if len(usable) >= 2 else 2


if __name__ == "__main__":
    sys.exit(main())

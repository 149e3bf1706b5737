#!/usr/bin/env python
"""Unattended driver for the Spain-2020 convergence campaign on TPU.

The tunneled TPU comes and goes; this script polls until a TPU backend is
reachable, then executes the staged plan from docs/CONVERGENCE.md without
supervision:

  1. ``adjoint_lane_probe.py`` — pick the backward-kernel block size
     (512 vs 1024 lanes x2) with a parity check; fall back to 512.
  2. A short depth probe (``--depth 10``) — read the achieved mean tree
     depth and size the production ``--depth`` (masked trees run full
     depth, so an oversized depth is pure waste).
  3. The production empirical-dense NUTS campaign (1024 chains), gated at
     ``--require-rhat 1.05``; on a tunnel drop it waits for the TPU and
     continues with ``--resume``; on a failed gate it extends the same run
     with ``--resume`` and a larger ``--iterations``.
  4. ``refresh_artifact.py`` — promote the converged campaign into
     ``results/spain2020`` and regenerate the analysis tree.

Progress goes to stdout (line-buffered; run under ``tee``) and a final
machine-readable summary lands in ``results/AUTOPILOT_DONE.json``.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
# default summary path; main() re-derives it per campaign dir so a second
# autopilot (e.g. the serovalid campaign) cannot clobber the committed
# converged_and_promoted record of the first (observed 2026-08-21)
DONE_PATH = os.path.join(REPO, "results", "AUTOPILOT_DONE.json")

def settle(tag):
    """Wait out the previous tunnel session's teardown before launching.

    The axon tunnel serves ONE client session at a time, and a client whose
    handshake races a previous session's teardown (clean exit OR kill)
    wedges forever on its first device RPC (observed repeatedly on
    2026-08-20). Every child launch therefore waits for the previous
    session — including the tpu_up() probe's own — to expire. The startup
    watchdog in run_logged plus the campaign's own first-RPC fast-fail
    catch the races this window still loses. Read at call time so tests
    (and operators) can set AXON_SETTLE_SECONDS=0.
    """
    secs = int(os.environ.get("AXON_SETTLE_SECONDS", "150"))
    if secs > 0:
        log(f"{tag}: settling {secs}s (axon single-session teardown)")
        time.sleep(secs)


def log(msg):
    print(f"[autopilot {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tpu_up(timeout=90):
    """True iff a fresh process can see a TPU backend within `timeout` s."""
    code = ("import jax; d = jax.devices(); "
            "print('PLATFORM=' + d[0].platform)")
    try:
        r = subprocess.run([PY, "-c", code], capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False
    return "PLATFORM=tpu" in (r.stdout or "")


def wait_for_tpu(poll_secs, deadline):
    n = 0
    while time.time() < deadline:
        if tpu_up():
            log("TPU is UP")
            return True
        n += 1
        log(f"TPU down (probe {n}); sleeping {poll_secs}s")
        time.sleep(poll_secs)
    return False


def run_logged(cmd, timeout, tag, silence_timeout=1800,
               startup_marker=None, startup_timeout=600):
    """Run cmd streaming output to stdout; return (rc, full_output).

    A reader THREAD drains stdout so the wall-clock watchdog fires even when
    the child is silently hung (a dead tunneled-TPU RPC blocks without
    printing — a blocking readline in the main loop would never see the
    timeout). The child is killed after `timeout` seconds total or
    `silence_timeout` seconds without a line of output.

    `startup_marker`: the axon tunnel has a wedge mode (observed 2026-08-20,
    three consecutive campaign processes) where a client that connects
    during session churn blocks FOREVER on its first real device RPC —
    before any compile begins — while fresh probe processes succeed, so
    `tpu_up()` cannot see it. Startup prints arrive within ~2-6 min on a
    free core; legitimate compiles are silent for 10-30 min but only START
    after the startup prints. Until `startup_marker` appears in the child's
    output the silence budget is therefore `startup_timeout` (default 600 s)
    instead of `silence_timeout` — a wedged child is killed in minutes and
    the caller's retry loop resumes from the checkpoint.
    """
    import queue
    import threading

    settle(tag)
    log(f"{tag}: {' '.join(cmd)}")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO)
    q = queue.Queue()

    def reader():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    threading.Thread(target=reader, daemon=True).start()
    lines = []
    start = last_line = time.time()
    started_up = startup_marker is None
    killed = None
    while True:
        try:
            item = q.get(timeout=10)
        except queue.Empty:
            item = ""
        if item is None:
            break
        if item:
            lines.append(item)
            last_line = time.time()
            if not started_up and startup_marker in item:
                started_up = True
            print(f"  |{tag}| {item}", end="", flush=True)
        now = time.time()
        quiet_budget = silence_timeout if started_up else startup_timeout
        if now - start > timeout:
            killed = f"TIMEOUT after {timeout}s"
        elif now - last_line > quiet_budget:
            killed = (f"SILENT for {quiet_budget}s"
                      + ("" if started_up else
                         f" before startup marker {startup_marker!r}"
                         " (wedged tunnel session)"))
        if killed:
            log(f"{tag}: {killed} — killing pid {proc.pid}")
            proc.kill()
            break
    try:
        rc = proc.wait(timeout=120)
    except subprocess.TimeoutExpired:
        rc = -9
    if killed:
        rc = -9
    return rc, "".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--poll-secs", type=int, default=180)
    p.add_argument("--deadline-hours", type=float, default=10.5,
                   help="stop starting new work this many hours from launch")
    p.add_argument("--chains", type=int, default=1024)
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--segments", type=int, default=100)
    p.add_argument("--max-iterations", type=int, default=12000,
                   help="stop extending past this many total iterations")
    p.add_argument("--extend-by", type=int, default=2000)
    p.add_argument("--trace", default=os.path.join(
        REPO, "results", "spain2020_nuts_r6", "samples.npz"))
    p.add_argument("--warm", default=None,
                   help="warm-start trace (defaults to --trace)")
    p.add_argument("--out", default=os.path.join(
        REPO, "results", "spain2020_nuts_r7"))
    p.add_argument("--skip-probes", action="store_true")
    p.add_argument("--mass", default="empirical-dense",
                   help="mass mode passed to nuts_campaign.py "
                        "(logit-dense is the converging recipe: walls "
                        "eliminated + step floored above the f32 noise "
                        "spiral — see scripts/energy_error_probe.py)")
    p.add_argument("--depth", type=int, default=0,
                   help="production tree depth (0 = depth-probe result)")
    p.add_argument("--mass-file", default=None)
    p.add_argument("--power", default=None,
                   help="power-logit selection passed to the campaign")
    p.add_argument("--delta-target", type=float, default=None)
    p.add_argument("--eps-floor", type=float, default=None)
    p.add_argument("--eps-ceil", type=float, default=None)
    p.add_argument("--stages", type=int, default=None,
                   help="mass-refinement ladder depth passed to the "
                        "campaign (pre-final stages re-estimate the dense "
                        "mass from their own mobile draws — the r15 recipe)")
    p.add_argument("--stage-iterations", type=int, default=None)
    p.add_argument("--stop-when-converged", type=int, default=None,
                   help="forwarded to the campaign: early-stop the final "
                        "stage after this many consecutive gate-clean "
                        "segments")
    p.add_argument("--posterior-burn-iters", type=int, default=None,
                   help="forwarded to the campaign: ABSOLUTE post-warmup "
                        "burn-in for the reported posterior/diagnostics "
                        "(see nuts_campaign.py --posterior-burn-iters)")
    p.add_argument("--artifact", default=None,
                   help="promotion target passed to refresh_artifact.py "
                        "(default: the committed results/spain2020; a "
                        "serovalid campaign must point at "
                        "results/spain2020_serovalid)")
    p.add_argument("--serovalid", action="store_true",
                   help="forwarded to the campaign: sample the ENE-COVID-"
                        "consistent posterior (variant-C relaxed bounds + "
                        "sero data term) instead of the reference-bounds one")
    p.add_argument("--init", default=None,
                   help="forwarded to the campaign: calibrated_parameters "
                        "file for theta0 (e.g. the serovalid MAP)")
    p.add_argument("--resume-existing", action="store_true",
                   help="start the production loop in --resume mode when "
                        "<out>/nuts_state.npz already exists (continue a "
                        "campaign another autopilot started, instead of "
                        "wiping its partials)")
    args = p.parse_args(argv)
    if args.serovalid and args.artifact is None:
        p.error("--serovalid requires --artifact (refresh_artifact.py "
                "refuses to promote a relaxed-bounds posterior into the "
                "reference-bounds results/spain2020; burning the retry "
                "loop on that refusal helps nobody)")

    deadline = time.time() + args.deadline_hours * 3600
    summary = {"status": "started", "stages": {}}

    def checkpoint_summary():
        # read the global at call time (tests monkeypatch it); a serovalid
        # autopilot records next to it under its own name so it cannot
        # clobber the main campaign's converged_and_promoted record
        root = globals()["DONE_PATH"]
        done_path = root if not args.serovalid else os.path.join(
            os.path.dirname(root), "AUTOPILOT_SEROVALID.json")
        os.makedirs(os.path.dirname(done_path), exist_ok=True)
        with open(done_path + ".tmp", "w") as f:
            json.dump(summary, f, indent=2)
        os.replace(done_path + ".tmp", done_path)

    if not wait_for_tpu(args.poll_secs, deadline):
        summary["status"] = "tpu_never_came_up"
        checkpoint_summary()
        return 1

    # ---- stage 1: lane probe --------------------------------------------
    bwd_block = 512
    if not args.skip_probes:
        rc, out = run_logged(
            [PY, os.path.join(REPO, "scripts", "adjoint_lane_probe.py"),
             "--batch", "2048", "--steps", "20"], timeout=1800, tag="lane")
        m = re.search(r"winner: bwd_block_b=(\d+)", out)
        par = re.search(r"max rel \|dgrad\| (\S+)", out)
        if rc == 0 and m and par and float(par.group(1)) < 1e-2:
            bwd_block = int(m.group(1))
        summary["stages"]["lane_probe"] = {
            "rc": rc, "bwd_block": bwd_block,
            "parity": par.group(1) if par else None}
        log(f"lane probe -> bwd_block_b={bwd_block}")
        checkpoint_summary()

    # ---- stage 2: depth probe -------------------------------------------
    depth = args.depth or 9
    if not args.skip_probes and not args.depth and time.time() < deadline:
        if not tpu_up():
            wait_for_tpu(args.poll_secs, deadline)
        probe_out = os.path.join(REPO, "results", "spain2020_nuts_rdepthprobe")
        probe_cmd = [PY, os.path.join(REPO, "scripts", "nuts_campaign.py"),
                     "--chains", "256", "--iterations", "30", "--warmup", "10",
                     "--depth", "10", "--segments", "6",
                     "--mass", args.mass, "--trace", args.trace,
                     "--warm", args.trace, "--out", probe_out,
                     "--bwd-block", str(bwd_block)]
        # probe in the production geometry: tree depth measured in theta
        # space does not transfer to the power-logit space the campaign
        # actually samples in
        if args.mass_file is not None:
            probe_cmd += ["--mass-file", args.mass_file]
        if args.power is not None:
            probe_cmd += ["--power", args.power]
        if args.delta_target is not None:
            probe_cmd += ["--delta-target", str(args.delta_target)]
        if args.eps_floor is not None:
            probe_cmd += ["--eps-floor", str(args.eps_floor)]
        if args.eps_ceil is not None:
            probe_cmd += ["--eps-ceil", str(args.eps_ceil)]
        # a stale metadata file from an earlier probe must not silently
        # supply the depth when this probe crashed before writing its own
        stale_meta = os.path.join(probe_out, "campaign_metadata.json")
        if os.path.exists(stale_meta):
            os.remove(stale_meta)
        rc, out = run_logged(probe_cmd, timeout=3600, tag="depth",
                             startup_marker="gradient engine:")
        mean_depth = None
        try:
            with open(stale_meta) as f:
                mean_depth = json.load(f).get("mean_tree_depth")
        except Exception:
            pass
        if mean_depth is None:
            m = re.search(r"mean tree depth ([\d.]+)/", out)
            mean_depth = float(m.group(1)) if m else None
        if mean_depth is not None:
            # trees that U-turn below the cap don't need the cap; +0.6
            # headroom then round up, clamped to [8, 10]
            depth = max(8, min(10, int(mean_depth + 0.6) + 1))
        summary["stages"]["depth_probe"] = {
            "rc": rc, "mean_tree_depth": mean_depth, "depth": depth}
        log(f"depth probe -> mean {mean_depth} -> production depth {depth}")
        checkpoint_summary()

    # ---- stage 3: production campaign (resume on drop, extend on gate) ---
    iterations = args.iterations
    attempt = 0
    resume = args.resume_existing and os.path.exists(
        os.path.join(args.out, "nuts_state.npz"))
    if resume:
        log("resume-existing: continuing the checkpointed campaign in "
            f"{args.out}")
    gate_ok = False
    while time.time() < deadline and iterations <= args.max_iterations:
        if not tpu_up():
            if not wait_for_tpu(args.poll_secs, deadline):
                break
        attempt += 1
        cmd = [PY, os.path.join(REPO, "scripts", "nuts_campaign.py"),
               "--chains", str(args.chains),
               "--iterations", str(iterations),
               "--warmup", str(args.warmup),
               "--depth", str(depth),
               "--segments", str(args.segments),
               "--mass", args.mass,
               "--trace", args.trace, "--warm", args.warm or args.trace,
               "--require-rhat", "1.05",
               "--out", args.out, "--bwd-block", str(bwd_block)]
        if args.mass_file is not None:
            cmd += ["--mass-file", args.mass_file]
        if args.power is not None:
            cmd += ["--power", args.power]
        if args.delta_target is not None:
            cmd += ["--delta-target", str(args.delta_target)]
        if args.eps_floor is not None:
            cmd += ["--eps-floor", str(args.eps_floor)]
        if args.eps_ceil is not None:
            cmd += ["--eps-ceil", str(args.eps_ceil)]
        if args.stop_when_converged is not None:
            cmd += ["--stop-when-converged", str(args.stop_when_converged)]
        if args.serovalid:
            cmd.append("--serovalid")
        if args.init is not None:
            cmd += ["--init", args.init]
        if args.posterior_burn_iters is not None:
            cmd += ["--posterior-burn-iters",
                    str(args.posterior_burn_iters)]
        if args.stages is not None and not resume:
            # the ladder only applies to a fresh run: a checkpointed resume
            # continues the FINAL stage (the checkpoint holds its mass)
            cmd += ["--stages", str(args.stages)]
            if args.stage_iterations is not None:
                cmd += ["--stage-iterations", str(args.stage_iterations)]
        # no --report here: failed-gate attempts would each pay the full
        # analysis-tree cost, and the converged run's report is produced
        # once by refresh_artifact --report at promotion
        if resume:
            cmd.append("--resume")
        rc, out = run_logged(cmd, timeout=7 * 3600, tag=f"prod{attempt}",
                             startup_marker="gradient engine:")
        diag = {}
        try:
            with open(os.path.join(args.out, "campaign_metadata.json")) as f:
                diag = json.load(f).get("diagnostics", {})
        except Exception:
            pass
        summary["stages"][f"production_attempt_{attempt}"] = {
            "rc": rc, "iterations": iterations, "resume": resume,
            "max_rhat": diag.get("max_rhat"),
            "max_rank_rhat": diag.get("max_rank_rhat"),
            "min_ess": diag.get("min_ess")}
        checkpoint_summary()
        if rc == 0:
            # the campaign's own gate is R-hat only; the committed-artifact
            # test additionally asserts min ESS > 400, so the promotion
            # path must enforce the same bar — otherwise the two promotion
            # routes (finisher vs autopilot) gate differently and a low-ESS
            # pass here would promote an artifact that fails the test
            if diag.get("min_ess", 0) <= 400:
                log(f"R-hat gate passed but min ESS "
                    f"{diag.get('min_ess')} <= 400; extending for ESS")
                resume = os.path.exists(
                    os.path.join(args.out, "nuts_state.npz"))
                iterations += args.extend_by
                continue
            gate_ok = True
            break
        if rc == 3:
            # completed but not converged: extend the same run
            resume = os.path.exists(os.path.join(args.out, "nuts_state.npz"))
            iterations += args.extend_by
            log(f"gate failed (max_rhat={diag.get('max_rhat')}); extending "
                f"to {iterations} iterations")
            continue
        if rc == 2:
            # argparse p.error: a bad invocation will fail identically on
            # every retry — stop instead of looping until the deadline
            log(f"campaign rejected the invocation (rc=2); aborting")
            break
        # crash / timeout / tunnel drop: resume if a checkpoint exists
        resume = os.path.exists(os.path.join(args.out, "nuts_state.npz"))
        log(f"campaign attempt {attempt} died rc={rc}; "
            f"{'resuming' if resume else 'restarting'} when TPU is back")
        # a killed client's tunnel session lingers server-side for a while
        # and wedges the NEXT client's first RPC (the 2026-08-20 wedge mode);
        # give it time to expire before reconnecting
        time.sleep(90)

    # ---- stage 4: promotion (retry — a converged campaign must not be
    # lost to one wedged/dropped tunnel session during the report) ---------
    if gate_ok:
        rc = -1
        for p_try in range(1, 5):
            if not tpu_up():
                wait_for_tpu(args.poll_secs, deadline + 3600)
            promote_cmd = [PY, os.path.join(REPO, "scripts",
                                            "refresh_artifact.py"),
                           args.out]
            if not args.serovalid:
                # the serovalid posterior lives in the RELAXED space; the
                # full analysis tree (generate_full_report) replays under
                # the reference-bounds pipeline and would silently clamp —
                # its report is the summary + comparison table instead
                promote_cmd.append("--report")
            if args.artifact is not None:
                promote_cmd += ["--artifact", args.artifact]
            rc, out = run_logged(promote_cmd, timeout=3600,
                                 tag=f"promote{p_try}")
            if rc == 0 and args.serovalid:
                rc, out = run_logged(
                    [PY, os.path.join(REPO, "scripts",
                                      "serovalid_posterior_summary.py"),
                     "--artifact", args.artifact], timeout=1800,
                    tag=f"svsummary{p_try}")
                if rc == 0:
                    # re-render the MAIN report: its comparison table is
                    # where the serovalid credible intervals appear
                    rc, out = run_logged(
                        [PY, os.path.join(REPO, "scripts",
                                          "post_calibration_analysis.py"),
                         "--input", os.path.join(REPO, "results",
                                                 "spain2020", "analysis")],
                        timeout=1800, tag=f"svrender{p_try}")
            summary["stages"][f"promotion_attempt_{p_try}"] = {"rc": rc}
            checkpoint_summary()
            if rc == 0:
                break
            log(f"promotion attempt {p_try} failed rc={rc}; "
                f"{'retrying' if p_try < 4 else 'giving up'}")
        summary["status"] = "converged_and_promoted" if rc == 0 \
            else "converged_promotion_failed"
    else:
        summary["status"] = "not_converged"
    checkpoint_summary()
    log(f"autopilot finished: {summary['status']}")
    return 0 if summary["status"] == "converged_and_promoted" else 1


if __name__ == "__main__":
    sys.exit(main())

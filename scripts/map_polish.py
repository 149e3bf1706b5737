#!/usr/bin/env python
"""Second-order MAP polish + Laplace mass matrix for the Spain-2020 posterior.

The reference's final calibration stage is a zeroth-order hill climb
(``HillClimbingOptimizer.cpp``) whose step cloud stalls when the likelihood
surface is razor-sharp: the committed round-1 artifact sat at a point with
whitened gradient norm ~124 (measured) — not a stationary point. This script
finishes the job with curvature information the reference never had:

  1. exact float64 ``jax.value_and_grad`` through the fixed-grid RK solve
     (reverse-mode adjoint; the reference's only gradient is O(eps) forward
     finite differences, ``SEPAIHRDGradientObjectiveFunction.cpp:15-171``),
  2. a central-difference Hessian OF THE EXACT GRADIENT (2 x n_free gradient
     dispatches), eigen-floored to a Laplace covariance,
  3. box-constrained L-BFGS-B in Laplace-whitened coordinates, iterated
     Hessian -> whiten -> polish until the gain stalls.

Outputs (to --out):
  - ``calibrated_parameters.txt``  the polished float64 MAP (re-loadable)
  - ``laplace_mass.npz``           names, theta_map, marginal stds, free mask,
                                   free-block covariance, ll_map, grad_map —
                                   the diagonal-mass input consumed by
                                   ``nuts_campaign.py --mass laplace`` and
                                   ``production_campaign.py --laplace``
  - ``polish_metadata.json``       per-round LL/gradient record

Bound-pinned parameters (gradient pushing out of the box) are excluded from
the Hessian; their mass-matrix scale is the exponential decay length 1/|g|
of the profile likelihood against the bound, capped at 5% of the box width.
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
    p.add_argument("--init",
                   default=os.path.join(REPO, "results", "spain2020",
                                        "calibrated_parameters.txt"),
                   help="calibrated_parameters.txt (or .npy theta) to polish")
    p.add_argument("--out",
                   default=os.path.join(REPO, "results", "spain2020_polish"))
    p.add_argument("--rounds", type=int, default=6,
                   help="max Hessian->whiten->L-BFGS-B rounds")
    p.add_argument("--maxiter", type=int, default=300,
                   help="L-BFGS-B iterations per round")
    p.add_argument("--gain-tol", type=float, default=0.01,
                   help="stop when a round's LL gain falls below this")
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline
    from mmidv1_tpu.data import read_sepaihrd_parameters
    from mmidv1_tpu.data.config_io import save_calibration_results

    # grid semantics: FIXED from the initial guess's runup_days
    # (reference main.cpp:241; PARITY.md reproducibility note 1)
    pipe = load_spain_pipeline(REPO, dtype=jnp.float64)
    data, base, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    M = base.M_baseline
    ll64 = build_objective(space, base, data, ts, substeps=args.substeps,
                           tableau=args.tableau, constraint_mode=REFLECT,
                           dtype=jnp.float64)
    vg = jax.jit(jax.value_and_grad(ll64))
    names = list(space.names)
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)
    rng = hi - lo
    d = len(lo)

    if args.init.endswith(".npy"):
        theta = np.load(args.init).astype(np.float64)
    else:
        calib = read_sepaihrd_parameters(args.init, 4,
                                         N=data.population_by_age,
                                         M_baseline=M, dtype=jnp.float64)
        theta = np.asarray(space.extract(calib), np.float64)

    v, g = vg(jnp.asarray(theta))
    v, g = float(v), np.asarray(g)
    print(f"start: LL {v:.8f}  |g| {np.linalg.norm(g):.3e}", flush=True)
    record = [{"round": -1, "ll": v, "grad_norm": float(np.linalg.norm(g))}]

    def hessian_products(theta, g0):
        at_lo = theta - lo <= 1e-8 * rng
        at_hi = hi - theta <= 1e-8 * rng
        pinned = (at_lo & (g0 < 0)) | (at_hi & (g0 > 0))
        free = ~pinned
        sig = np.asarray(space.sigmas, np.float64)
        room_lo = theta - lo
        room_hi = hi - theta
        h = np.maximum(1e-4 * sig, 1e-9)
        # cap by the LARGER one-sided room: a free coordinate can sit
        # exactly on a bound (inward gradient within gtol), and shrinking h
        # toward 0 there would difference REFLECT-folded out-of-box points
        # into a garbage Hessian row — use a one-sided stencil instead
        h = np.minimum(h, np.maximum(np.maximum(room_lo, room_hi) * 0.5,
                                     1e-12))
        H = np.zeros((d, d))
        t0 = time.perf_counter()
        for i in range(d):
            if not free[i]:
                continue
            e = np.zeros(d)
            e[i] = h[i]
            up_ok = room_hi[i] >= h[i]
            dn_ok = room_lo[i] >= h[i]
            if up_ok and dn_ok:
                _, gp = vg(jnp.asarray(theta + e))
                _, gm = vg(jnp.asarray(theta - e))
                H[i] = (np.asarray(gp) - np.asarray(gm)) / (2 * h[i])
            elif up_ok:
                _, gp = vg(jnp.asarray(theta + e))
                H[i] = (np.asarray(gp) - g0) / h[i]
            elif dn_ok:
                _, gm = vg(jnp.asarray(theta - e))
                H[i] = (g0 - np.asarray(gm)) / h[i]
            # else: degenerate-width coordinate — row stays 0 and the
            # eigenvalue floor below supplies a conservative variance
        Hf = 0.5 * (H[np.ix_(free, free)] + H[np.ix_(free, free)].T)
        w, V = np.linalg.eigh(-Hf)
        print(f"  Hessian: {2 * int(free.sum())} grad evals in "
              f"{time.perf_counter() - t0:.0f}s; eig(-H) {w.min():.3e}.."
              f"{w.max():.3e} (n_nonpos={(w <= 0).sum()})", flush=True)
        w_floor = np.maximum(w, 1e-8 * np.abs(w).max())
        cov_f = (V / w_floor) @ V.T
        std = np.zeros(d)
        std[free] = np.sqrt(np.diag(cov_f))
        std[~free] = np.minimum(1.0 / np.maximum(np.abs(g0[~free]), 1e-12),
                                0.05 * rng[~free])
        return np.maximum(std, 1e-15), free, cov_f

    for rnd in range(args.rounds):
        std, free, cov_f = hessian_products(theta, g)
        nev = [0]

        def fun(xw):
            v_, g_ = vg(jnp.asarray(xw * std))
            nev[0] += 1
            return -float(v_), -np.asarray(g_) * std

        t0 = time.perf_counter()
        res = minimize(fun, theta / std, jac=True, method="L-BFGS-B",
                       bounds=list(zip(lo / std, hi / std)),
                       options=dict(maxiter=args.maxiter, maxcor=40,
                                    ftol=1e-16, gtol=1e-10))
        v1 = -res.fun
        theta1 = res.x * std
        gw = np.asarray(res.jac)
        gain = v1 - v
        print(f"round {rnd}: {nev[0]} evals {time.perf_counter() - t0:.0f}s "
              f"-> LL {v1:.8f} (gain {gain:+.4f})  |g_w| free "
              f"{np.linalg.norm(gw[free]):.3e}", flush=True)
        record.append({"round": rnd, "ll": v1, "gain": gain,
                       "whitened_grad_norm_free":
                       float(np.linalg.norm(gw[free])), "evals": nev[0]})
        theta, v = theta1, v1
        g = np.asarray(vg(jnp.asarray(theta))[1])
        if gain < args.gain_tol:
            break

    std, free, cov_f = hessian_products(theta, g)
    print(f"final: LL {v:.8f}  free {int(free.sum())}/{d}")
    print("  at bounds:", [n for n, f in zip(names, free) if not f])

    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "laplace_mass.npz"),
             names=np.array(names), theta_map=theta, std=std, free=free,
             cov_free=cov_f, ll_map=v, grad_map=g)
    map_params = space.apply(base, jnp.asarray(theta, jnp.float64))
    save_calibration_results(
        os.path.join(args.out, "calibrated_parameters.txt"), map_params,
        names, v)
    with open(os.path.join(args.out, "polish_metadata.json"), "w") as f:
        json.dump({"algorithm": "lbfgsb_laplace_whitened",
                   "substeps": args.substeps, "tableau": args.tableau,
                   "rounds": record, "final_ll_float64": v,
                   "n_free": int(free.sum()),
                   "pinned": [n for n, fr in zip(names, free) if not fr]},
                  f, indent=2)
    print(f"artifacts -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

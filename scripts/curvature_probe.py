#!/usr/bin/env python
"""Measure the Spain-2020 posterior's exact curvature in logit space and
score mass-matrix candidates against it — HOST-SIDE, before burning TPU time.

Why this exists: the r9/logit-probe campaigns adapted to step ~2e-4 in
whitened units no matter which trace-derived dense mass was used, freezing
ridge mixing (split-R-hat stuck ~5.5). The leapfrog stability bound is
eps < ~2/sqrt(lambda_max(S^T H S)) for mass factor S and target Hessian H,
so a crushed step means the mass OVERESTIMATES the posterior's width along
some stiff direction by orders of magnitude. The suspected mechanism:
pooled trace covariance inflates stiff directions with FROZEN between-chain
offsets (chains stuck at different spots of a direction the posterior pins
tightly), while the within-chain covariance measures the true local width.

This script computes the exact float64 Hessian of the logit-space log
posterior (jax.hessian through the ODE solve — exact, no finite
differences) at several ensemble positions, then for each mass candidate
prints the predicted stable step and the predicted whitened posterior
width (which sets the tree depth needed to traverse). Pick the candidate
with step O(0.1) and width O(10): that combination converges; step 2e-4
does not, regardless of depth.

Reference for the quality bar this chases:
``MetropolisHastingsSampler.cpp:283-384`` (the posterior is the product).
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", default=os.path.join(
        REPO, "results", "spain2020_nuts_r9", "samples.npz"))
    p.add_argument("--points", type=int, default=3,
                   help="ensemble positions to evaluate the Hessian at")
    p.add_argument("--floor", type=float, default=0.25,
                   help="y-marginal-std floor for trace-derived masses")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "curvature_probe.json"))
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--tableau", default="dopri5")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp

    from mmidv1_tpu.calibration.nuts import logit_transform
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline

    pipe = load_spain_pipeline(REPO, dtype=jnp.float64)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    d = space.dim
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)
    width = np.maximum(hi - lo, 1e-30)

    loglik = build_objective(space, params, data, ts, substeps=args.substeps,
                             tableau=args.tableau, constraint_mode=REFLECT,
                             dtype=jnp.float64)

    lo_j = jnp.asarray(lo)
    w_j = jnp.asarray(width)

    def logp_y(y):
        sig = jax.nn.sigmoid(y)
        th = lo_j + w_j * sig
        jac = jnp.sum(jnp.log(w_j) + jax.nn.log_sigmoid(y) +
                      jax.nn.log_sigmoid(-y))
        return loglik(th) + jac

    hess = jax.jit(jax.hessian(logp_y))

    tr = np.load(args.trace)
    X = tr["samples"].astype(np.float64)           # (T, C, d)
    T, C = X.shape[:2]
    Xl = X[T // 2:]
    pool = Xl.reshape(-1, d)
    y_pool = logit_transform(pool, lo, hi)
    y_chains = logit_transform(Xl, lo, hi)          # (T2, C, d)

    # --- mass candidates (y-space covariance factors) ------------------
    def floored_chol(cov, tag):
        cov = 0.9 * cov + 0.1 * np.diag(np.maximum(np.diag(cov), 1e-24))
        add = np.maximum(args.floor ** 2 - np.diag(cov), 0.0)
        cov = cov + np.diag(add)
        print(f"{tag}: y-marginal-std {np.sqrt(np.diag(cov)).min():.2e}"
              f"..{np.sqrt(np.diag(cov)).max():.2e}, "
              f"{int((add > 0).sum())} floored")
        return np.linalg.cholesky(cov)

    cov_pool = np.cov(y_pool, rowvar=False)
    # within-chain: average per-chain covariance (no frozen-offset inflation)
    cen = y_chains - y_chains.mean(axis=0, keepdims=True)
    cov_within = np.einsum("tcd,tce->de", cen, cen) / (C * (len(cen) - 1))
    masses = {
        "pooled": floored_chol(cov_pool, "pooled"),
        "within": floored_chol(cov_within, "within"),
    }

    # --- Hessians at ensemble positions --------------------------------
    lp_last = tr["logps"][-1]
    order = np.argsort(-lp_last)
    picks = [order[0]] + list(order[np.linspace(
        0, C - 1, args.points - 1, dtype=int)])[1:] if args.points > 1 \
        else [order[0]]
    report = {"floor": args.floor, "points": [], "masses": {}}
    H_list = []
    for ci in picks[:args.points]:
        y0 = logit_transform(X[-1, ci], lo, hi)
        H = np.asarray(hess(jnp.asarray(y0)))
        H = 0.5 * (H + H.T)
        H_list.append(H)
        lam = np.linalg.eigvalsh(-H)
        print(f"chain {ci}: logp {lp_last[ci]:.1f}; -H eig range "
              f"[{lam.min():.3e}, {lam.max():.3e}]")
        report["points"].append({"chain": int(ci),
                                 "eig_min": float(lam.min()),
                                 "eig_max": float(lam.max())})

    names = list(space.names)
    for tag, S in masses.items():
        eps_pred, width_pred = [], []
        for H in H_list:
            A = S.T @ (-H) @ S
            lam, V = np.linalg.eigh(0.5 * (A + A.T))
            lam_max = float(lam[-1])
            eps_pred.append(2.0 / np.sqrt(max(lam_max, 1e-30)))
            # stiffest whitened direction: which params load?
            v = S @ V[:, -1]
            top = np.argsort(-np.abs(v))[:5]
            print(f"  [{tag}] lambda_max {lam_max:.3e} -> eps_stable "
                  f"{eps_pred[-1]:.2e}; stiff dir: "
                  + ", ".join(f"{names[i]}:{v[i]:+.3f}" for i in top))
        # whitened posterior width: eig of S^-1 cov_pool S^-T
        Si = np.linalg.inv(S)
        W = Si @ cov_pool @ Si.T
        wl = np.linalg.eigvalsh(0.5 * (W + W.T))
        width_pred = float(np.sqrt(max(wl[-1], 0.0)))
        print(f"  [{tag}] predicted eps {min(eps_pred):.2e}, max whitened "
              f"posterior width {width_pred:.1f} -> leapfrogs/traverse "
              f"~{width_pred / min(eps_pred):.0f}")
        report["masses"][tag] = {"eps_stable": float(min(eps_pred)),
                                 "whitened_width": width_pred}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

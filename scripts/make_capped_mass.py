#!/usr/bin/env python
"""Build a curvature-capped logit-space dense mass for the NUTS campaign.

Why: a dense mass from the pooled covariance of a NOT-yet-converged trace
is the right scale for the posterior's soft directions (that is what the
trace explores) but can badly OVERESTIMATE the width of stiff directions —
frozen between-chain offsets and soft-stiff correlations inflate them, and
whitening by an inflated width amplifies the direction's curvature, which
collapses the leapfrog stability edge (measured: the r12-trace mass cut
the stable step from ~6e-3 to <2e-3, scripts/energy_error_probe.py).

The fix is a Gaussian-optimal blend of trace and curvature:

  1. S = chol(Sigma_emp)  (logit-space pooled covariance, std-floored),
  2. A = S^T (-H) S       (exact float64 Hessian of the logit posterior,
                           jax.hessian through the ODE solve, evaluated at
                           the top ensemble positions; per-direction max),
  3. eigendecompose A = V diag(lambda) V^T and shrink every direction whose
     whitened curvature exceeds cap^2:   S' = S V diag(min(1, cap/sqrt(lambda))).

Then S'^T (-H) S' has eigenvalues min(lambda, cap^2) <= cap^2 everywhere —
the stable step is ~2/cap regardless of how wrong the trace was in the
stiff subspace — while soft directions (lambda < cap^2) keep their
empirical width, which is what sets NUTS trajectory lengths. Writes
``mu`` (y-space center) + ``scale`` (the capped factor) for
``nuts_campaign.py --mass logit-file``.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", required=True,
                   help="samples.npz of the widest-coverage campaign so far")
    p.add_argument("--out", required=True, help="output mass .npz")
    p.add_argument("--points", type=int, default=3,
                   help="ensemble positions to evaluate the Hessian at "
                        "(per-direction max curvature is used)")
    p.add_argument("--cap", type=float, default=0.5,
                   help="whitened-curvature cap c: stiff directions are "
                        "shrunk until S^T(-H)S <= c^2, so the leapfrog "
                        "stability bound is ~2/c with margin")
    p.add_argument("--floor", type=float, default=0.25,
                   help="y-marginal-std floor before capping (wall-pinned "
                        "columns)")
    p.add_argument("--power", default="1",
                   help="'auto' or a number: power-logit exponent (see "
                        "nuts_campaign.py --power). With straightened "
                        "valleys (power auto) the local Hessian's stiff "
                        "directions are globally consistent, which is what "
                        "makes curvature capping sound — under plain logit "
                        "the banana's local transverse IS the global "
                        "tangent elsewhere, and capping froze it (r13)")
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
    w = np.maximum(hi - lo, 1e-30)

    loglik = build_objective(space, params, data, ts, substeps=args.substeps,
                             tableau=args.tableau, constraint_mode=REFLECT,
                             dtype=jnp.float64)
    lo_j, w_j = jnp.asarray(lo), jnp.asarray(w)

    tr = np.load(args.trace)
    X = tr["samples"].astype(np.float64)
    flat = X.reshape(-1, d)
    if args.power == "auto":
        u_hi = np.quantile((flat - lo) / w, 0.995, axis=0)
        power_k = np.where(u_hi < 0.8, 8.0, 1.0)
        print(f"power-logit: k=8 for {int((power_k > 1).sum())}/{d} params")
    else:
        power_k = np.full(d, float(args.power))
    k_j = jnp.asarray(power_k)

    def logp_y(y):
        u = jnp.exp(jax.nn.log_sigmoid(k_j * y) / k_j)
        jac = jnp.sum(jnp.log(w_j) + jax.nn.log_sigmoid(k_j * y) / k_j +
                      jax.nn.log_sigmoid(-k_j * y))
        return loglik(lo_j + w_j * u) + jac

    hess = jax.jit(jax.hessian(logp_y))

    T, C = X.shape[:2]
    y_pool = logit_transform(X[T // 2:].reshape(-1, d), lo, hi,
                             power=power_k)
    mu_y = y_pool.mean(axis=0)
    cov = np.cov(y_pool, rowvar=False)
    cov = 0.9 * cov + 0.1 * np.diag(np.maximum(np.diag(cov), 1e-24))
    cov += np.diag(np.maximum(args.floor ** 2 - np.diag(cov), 0.0))
    S = np.linalg.cholesky(cov)

    lp_last = tr["logps"][-1]
    picks = np.argsort(-lp_last)[:args.points]
    H_list = []
    for ci in picks:
        y0 = logit_transform(X[-1, ci], lo, hi, power=power_k)
        H = np.asarray(hess(jnp.asarray(y0)))
        H_list.append(0.5 * (H + H.T))

    # Iteratively cap against each Hessian: every pass only SHRINKS
    # directions, so the final factor satisfies the cap exactly for the
    # last point and (with the cap's 4x margin to the stability edge 2)
    # effectively for all of them. Two sweeps tighten the cross-basis
    # leakage of the one-pass approximation.
    S_capped = S.copy()
    total_capped = 0
    for sweep in range(2):
        for H in H_list:
            A = S_capped.T @ (-H) @ S_capped
            lam, V = np.linalg.eigh(0.5 * (A + A.T))
            dshrink = np.minimum(
                1.0, args.cap / np.sqrt(np.maximum(lam, 1e-30)))
            total_capped += int((dshrink < 1.0 - 1e-12).sum())
            S_capped = S_capped @ (V * dshrink[None, :])
    worst = max(np.linalg.eigvalsh(
        S_capped.T @ (-H) @ S_capped).max() for H in H_list)
    print(f"capped directions (cumulative over sweeps): {total_capped}; "
          f"post-cap whitened curvature max {worst:.3f} "
          f"(target <= {args.cap ** 2:.3f})")
    np.savez(args.out, mu=mu_y, scale=S_capped, power=power_k,
             names=np.array([str(n) for n in tr["names"]]))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Measure leapfrog energy error vs step size on the production TPU engine.

Ground truth for the NUTS step-size question: the dual-averaged step on the
Spain-2020 posterior lands ~30x below the f64 quadratic-stability bound
(2e-4 vs 6e-3, scripts/curvature_probe.py), and the suspected driver is
accumulated float32 gradient noise over the 2^depth leapfrogs of a tree —
an error source that is INVISIBLE to curvature analysis. This probe runs
fixed-step leapfrog trajectories (no U-turn logic) on the exact production
path — logit transform + dense mass + Pallas forward/adjoint kernels — and
prints the distribution of the Hamiltonian error dH = (logp - |r|^2/2)_end
- (...)_start per step size, which maps directly to expected Metropolis
acceptance E[min(1, exp(dH))]. Pick the largest eps whose acceptance still
clears ~0.6: that is the productive operating point for --eps-floor /
--delta-target in scripts/nuts_campaign.py.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", default=os.path.join(
        REPO, "results", "spain2020_nuts_r9", "samples.npz"))
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--eps", type=float, nargs="+",
                   default=[2e-4, 1e-3, 3e-3, 6e-3, 1.2e-2])
    p.add_argument("--floor", type=float, default=0.25)
    p.add_argument("--power", default="1",
                   help="'auto' or a number: power-logit exponent (see "
                        "nuts_campaign.py --power)")
    p.add_argument("--mass-file", default=None,
                   help="precomputed logit-space mass .npz (mu/scale) — "
                        "overrides the trace-derived mass")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    dtype = jnp.float32

    from mmidv1_tpu.calibration.nuts import logit_transform
    from mmidv1_tpu.calibration.objective import build_objective
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.cli.common import load_spain_pipeline

    pipe = load_spain_pipeline(REPO, dtype=dtype)
    data, params, space, ts = pipe.data, pipe.params, pipe.space, pipe.ts
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    if dev.platform == "tpu":
        from mmidv1_tpu.ops import build_objective_pallas_grad
        vag = build_objective_pallas_grad(
            space, params, data, ts, substeps=4, tableau="dopri5",
            constraint_mode=REFLECT, dtype=dtype,
            block_b=max(64, args.chains), bwd_block_b=512)
    else:
        loglik = build_objective(space, params, data, ts, substeps=4,
                                 tableau="dopri5", constraint_mode=REFLECT,
                                 dtype=dtype)
        vag = jax.vmap(jax.value_and_grad(loglik))

    d = space.dim
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)
    width = hi - lo

    tr = np.load(args.trace)
    X = tr["samples"].astype(np.float64)
    flat = X.reshape(-1, d)
    if args.power == "auto":
        u_hi = np.quantile((flat - lo) / width, 0.995, axis=0)
        power_k = np.where(u_hi < 0.8, 8.0, 1.0)
        print(f"power-logit: k=8 for {int((power_k > 1).sum())}/{d} params")
    else:
        power_k = np.full(d, float(args.power))
    if args.mass_file:
        mf = np.load(args.mass_file)
        mu_y = mf["mu"].astype(np.float64)
        S = mf["scale"].astype(np.float64)
        if "power" in mf.files:
            power_k = mf["power"].astype(np.float64)
    else:
        y_pool = logit_transform(X[X.shape[0] // 2:].reshape(-1, d), lo, hi,
                                 power=power_k)
        mu_y = y_pool.mean(axis=0)
        cov = np.cov(y_pool, rowvar=False)
        cov = 0.9 * cov + 0.1 * np.diag(np.maximum(np.diag(cov), 1e-24))
        cov += np.diag(np.maximum(args.floor ** 2 - np.diag(cov), 0.0))
        S = np.linalg.cholesky(cov)

    lo_j = jnp.asarray(lo, dtype)
    w_j = jnp.asarray(width, dtype)
    mu_j = jnp.asarray(mu_y, dtype)
    S_j = jnp.asarray(S, dtype)
    log_w_sum = jnp.sum(jnp.log(w_j))

    from mmidv1_tpu.calibration.nuts import _mm
    k_j = jnp.asarray(power_k, dtype)

    def vag_z(zs):
        ys = mu_j[None, :] + _mm(zs, S_j.T)
        u = jnp.exp(jax.nn.log_sigmoid(k_j * ys) / k_j)
        sig_m = jax.nn.sigmoid(-k_j * ys)
        th = lo_j[None, :] + w_j[None, :] * u
        lp, g = vag(th)
        jac = log_w_sum + jnp.sum(jax.nn.log_sigmoid(k_j * ys) / k_j +
                                  jax.nn.log_sigmoid(-k_j * ys), axis=-1)
        gy = g * (w_j[None, :] * u * sig_m) +             (sig_m - k_j * jax.nn.sigmoid(k_j * ys))
        return lp + jac, _mm(gy, S_j)

    # start positions: final r9 ensemble (theta) -> z
    th0 = X[-1, :args.chains]
    y0 = logit_transform(th0, lo, hi, power=power_k)
    z0 = np.linalg.solve(S, (y0 - mu_y).T).T.astype(np.float32)

    @jax.jit
    def trajectory(z, eps, key):
        r0 = jax.random.normal(key, z.shape, dtype)
        lp0, g = vag_z(z)
        h0 = lp0 - 0.5 * jnp.sum(r0 * r0, axis=-1)

        def step(carry, _):
            z, r, g = carry
            r_half = r + 0.5 * eps * g
            z1 = z + eps * r_half
            lp1, g1 = vag_z(z1)
            r1 = r_half + 0.5 * eps * g1
            return (z1, r1, g1), lp1

        (z_end, r_end, _), _ = jax.lax.scan(step, (z, r0, g), None,
                                            length=args.steps)
        lp_end, _ = vag_z(z_end)
        h_end = lp_end - 0.5 * jnp.sum(r_end * r_end, axis=-1)
        return h_end - h0

    key = jax.random.PRNGKey(args.seed)
    for eps in args.eps:
        dh = np.asarray(trajectory(jnp.asarray(z0), jnp.float32(eps),
                                   jax.random.fold_in(key, hash(eps) % 2**31)))
        dh = dh[np.isfinite(dh)]
        acc = np.minimum(1.0, np.exp(np.clip(dh, -60, 0))).mean() if len(dh) \
            else 0.0
        print(f"eps {eps:8.1e}: dH mean {dh.mean():8.3f} std {dh.std():8.3f} "
              f"median {np.median(dh):8.3f} -> E[accept] {acc:.3f} "
              f"({len(dh)}/{args.chains} finite)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

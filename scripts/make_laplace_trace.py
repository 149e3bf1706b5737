#!/usr/bin/env python
"""Synthesize a samples.npz trace from a Laplace approximation.

The serovalid NUTS campaign (round-4 verdict item 3) needs a --trace for
its logit-dense mass and a --warm ensemble for its starting positions,
but no serovalid campaign has ever run — the only committed serovalid
artifact is a MAP + Laplace (results/spain2020_serovalid/). Drawing the
trace from that Laplace N(theta_map, cov) puts the mass estimate and the
start ensemble in the right geometry for the serovalid posterior near
its own mode, instead of warm-starting from the reference-bounds
posterior that the ENE-COVID sero term pushes ~20 sigma away.

Draws are clipped to a small interior margin of the (relaxed) bounds so
the logit transform of every sample is finite. Writes samples.npz with
the same layout the campaigns produce: samples (iters, chains, dim) +
names.

Reference role: the posterior-uncertainty input of
src/model/PostCalibrationAnalyser.cpp:289-299.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def laplace_cov(lap):
    """Full covariance: diag(std^2) with the free block replaced."""
    std = np.maximum(lap["std"].astype(np.float64), 1e-12)
    cov = np.diag(std ** 2)
    free = lap["free"]
    cov[np.ix_(free, free)] = lap["cov_free"]
    return cov


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--laplace", default=os.path.join(
        REPO, "results", "spain2020_serovalid", "laplace_serovalid.npz"))
    p.add_argument("--out", default=os.path.join(
        REPO, "results", "spain2020_serovalid", "laplace_trace.npz"))
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--seed", type=int, default=53)
    p.add_argument("--margin", type=float, default=1e-4,
                   help="interior clip margin as a fraction of each "
                        "parameter's bound width")
    p.add_argument("--serovalid", action="store_true", default=True,
                   help="clip against the variant-C relaxed bounds "
                        "(calibration/serovalid.py)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from mmidv1_tpu.calibration.serovalid import relax_bounds
    from mmidv1_tpu.cli.common import load_spain_pipeline

    pipe = load_spain_pipeline(REPO, dtype=np.float32)
    space = pipe.space
    if args.serovalid:
        space, _ = relax_bounds(space)

    lap = np.load(args.laplace)
    assert list(lap["names"]) == list(space.names), \
        "Laplace parameter names do not match the space"
    cov = laplace_cov(lap)
    mean = lap["theta_map"].astype(np.float64)

    rng = np.random.default_rng(args.seed)
    n = args.iters * args.chains
    draws = rng.multivariate_normal(mean, cov, size=n,
                                    method="cholesky")
    lo = np.asarray(space.lower, np.float64)
    hi = np.asarray(space.upper, np.float64)
    width = hi - lo
    draws = np.clip(draws, lo + args.margin * width,
                    hi - args.margin * width)
    samples = draws.reshape(args.iters, args.chains, space.dim)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        np.savez(f, samples=samples.astype(np.float64),
                 names=np.asarray(space.names))
    frac_edge = float(np.mean(
        (samples <= (lo + 1.5 * args.margin * width)) |
        (samples >= (hi - 1.5 * args.margin * width))))
    print(f"wrote {args.out}: samples {samples.shape}, "
          f"{frac_edge:.1%} of coordinates at the clip margin "
          f"(MAP ll {float(lap['ll_map']):.6e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

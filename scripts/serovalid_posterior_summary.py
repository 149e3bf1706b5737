#!/usr/bin/env python
"""Posterior summary for the serovalid (ENE-COVID-consistent) artifact.

After a serovalid NUTS campaign is promoted into
``results/spain2020_serovalid/`` (refresh_artifact.py --artifact ...),
this script computes the numbers the committed comparison report renders
as credible intervals (round-4 verdict item 3):

* day-64 seroprevalence quantiles (2.5/50/97.5%) by replaying a seeded
  posterior subsample through the same ``sero_of`` the sampler's data
  term used (calibration/serovalid.py),
* Poisson log-likelihood quantiles from the stored per-draw logls,
* the fraction of posterior draws whose sero lands inside the ENE-COVID
  95% CI (the survey-validation coverage statement),

and merges them into ``run_metadata.json`` as ``posterior_summary``.

Reference role: the posterior-uncertainty side of the validation in
src/model/PostCalibrationAnalyser.cpp:289-299.
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
    p.add_argument("--artifact", default=os.path.join(
        REPO, "results", "spain2020_serovalid"))
    p.add_argument("--replay-draws", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"])
    args = p.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp

    from mmidv1_tpu.analysis.aggregate import ENE_COVID_MEAN
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.calibration.serovalid import (make_sero_penalty,
                                                  relax_bounds)
    from mmidv1_tpu.cli.common import load_spain_pipeline

    post_path = os.path.join(args.artifact, "posterior_samples.npz")
    meta_path = os.path.join(args.artifact, "run_metadata.json")
    post = np.load(post_path)
    samples, logls = post["samples"], post["logls"]
    with open(meta_path) as f:
        meta = json.load(f)

    dtype = jnp.float32
    pipe = load_spain_pipeline(REPO, dtype=dtype)
    space, _ = relax_bounds(pipe.space)
    assert [str(n) for n in post["names"]] == list(space.names)
    camp = meta.get("campaign", {})
    pen = make_sero_penalty(space, pipe.params, pipe.data, pipe.ts,
                            substeps=int(camp.get("substeps", 4)),
                            tableau=str(camp.get("tableau", "dopri5")),
                            constraint_mode=REFLECT, dtype=dtype)

    rng = np.random.default_rng(args.seed)
    n = min(args.replay_draws, samples.shape[0])
    idx = rng.choice(samples.shape[0], size=n, replace=False)
    thetas = jnp.asarray(samples[idx], dtype)
    sero_batch = jax.jit(jax.vmap(pen.sero_of))
    seros = []
    for i in range(0, n, args.batch):
        seros.append(np.asarray(sero_batch(thetas[i:i + args.batch])))
    seros = np.concatenate(seros).astype(np.float64)

    with open(os.path.join(args.artifact,
                           "serovalid_metadata.json")) as f:
        ci = json.load(f)["sero_target"]["ci"]
    q = lambda a, qs=(2.5, 50.0, 97.5): {
        f"q{s:g}": float(v) for s, v in zip(qs, np.percentile(a, qs))}
    meta["posterior_summary"] = {
        "n_replayed": int(n),
        "sero_day64": q(seros),
        "sero_inside_ci_frac": float(np.mean(
            (seros >= ci[0]) & (seros <= ci[1]))),
        "ene_covid_mean": float(ENE_COVID_MEAN),
        "logl": q(logls.astype(np.float64)),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    s = meta["posterior_summary"]["sero_day64"]
    print(f"sero day-64 posterior: {100*s['q50']:.2f}% "
          f"[{100*s['q2.5']:.2f}, {100*s['q97.5']:.2f}] "
          f"(inside ENE-COVID CI: "
          f"{100*meta['posterior_summary']['sero_inside_ci_frac']:.0f}% "
          f"of draws); run_metadata.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())

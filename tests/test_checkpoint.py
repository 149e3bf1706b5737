"""Checkpoint/resume + trace CSV + progress reporting (VERDICT item 9)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.mh import MHConfig, run_mh
from mmidv1_tpu.calibration.param_space import ParameterSpace
from mmidv1_tpu.params import make_params
from mmidv1_tpu.utils.checkpoint import (load_mh_state, save_mh_state,
                                         write_posterior_trace)


@pytest.fixture(scope="module")
def problem():
    mu = jnp.asarray([0.5, -0.5])

    def loglik(theta):
        return -0.5 * jnp.sum((theta - mu) ** 2)

    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta"]
    space = ParameterSpace.create(names, {n: (-5.0, 5.0) for n in names},
                                  {n: 0.3 for n in names}, template)
    return loglik, space


def test_killed_and_resumed_run_reproduces_uninterrupted(tmp_path, problem):
    """Split run (checkpoint to DISK at the midpoint, reload, continue) equals
    the uninterrupted run exactly — the capability the reference lacks
    (its checkpoints are write-only, SURVEY.md section 5)."""
    loglik, space = problem
    theta0 = jnp.zeros(2)
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)

    cfg_full = MHConfig(iterations=80, burn_in=10, adaptation_period=20,
                        thinning=4)
    cfg_half = MHConfig(iterations=40, burn_in=10, adaptation_period=20,
                        thinning=4)

    # two 40-step halves with the same block-key sequence.

    r_half1 = run_mh(loglik, space, theta0, k1, cfg_half, n_chains=8)
    ckpt = tmp_path / "mh_state.npz"
    save_mh_state(str(ckpt), r_half1.final_state)

    resumed_state = load_mh_state(str(ckpt))
    # exact round-trip through disk
    for a, b in zip(resumed_state, r_half1.final_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    r_half2 = run_mh(loglik, space, theta0, k2, cfg_half, n_chains=8,
                     initial_state=resumed_state)
    # continuous reference run: same two key segments
    r_ref1 = run_mh(loglik, space, theta0, k1, cfg_half, n_chains=8)
    r_ref2 = run_mh(loglik, space, theta0, k2, cfg_half, n_chains=8,
                    initial_state=r_ref1.final_state)
    np.testing.assert_array_equal(np.asarray(r_half2.samples),
                                  np.asarray(r_ref2.samples))
    assert int(r_half2.final_state.step) == 80
    assert np.isfinite(np.asarray(r_half2.samples)).all()


def test_posterior_trace_csv(tmp_path, problem):
    loglik, space = problem
    cfg = MHConfig(iterations=24, burn_in=4, thinning=4)
    res = run_mh(loglik, space, jnp.zeros(2), jax.random.PRNGKey(0), cfg,
                 n_chains=4)
    path = tmp_path / "posterior_trace.csv"
    write_posterior_trace(str(path), np.asarray(res.samples),
                          np.asarray(res.sample_logps), list(space.names))
    rows = path.read_text().strip().splitlines()
    assert rows[0] == "sample,logp,beta,theta"
    assert len(rows) == 1 + 6 * 4     # 6 stored blocks x 4 chains

    # checkpoint-style truncation (last N rows, reference :380-382)
    write_posterior_trace(str(path), np.asarray(res.samples),
                          np.asarray(res.sample_logps), list(space.names),
                          max_rows=5)
    assert len(path.read_text().strip().splitlines()) == 6


def test_progress_callback_fires(problem):
    loglik, space = problem
    seen = []

    def progress(step, acc, best, scale):
        seen.append((int(step), float(acc)))

    cfg = MHConfig(iterations=20, burn_in=0, thinning=5, report_interval=2)
    run_mh(loglik, space, jnp.zeros(2), jax.random.PRNGKey(1), cfg,
           n_chains=4, progress_fn=progress)
    jax.effects_barrier()
    assert len(seen) == 2            # 4 blocks, every 2nd reports
    assert seen[-1][0] == 20
    assert 0.0 <= seen[-1][1] <= 1.0


def test_checkpointed_campaign_resume_matches_uninterrupted(tmp_path, problem):
    """A campaign killed between segments and resumed from its disk checkpoint
    produces exactly the uninterrupted campaign's remaining segments."""
    from mmidv1_tpu.calibration.mh import run_mh_checkpointed

    loglik, space = problem
    cfg = MHConfig(iterations=60, burn_in=10, adaptation_period=20, thinning=4)
    key = jax.random.PRNGKey(77)
    theta0 = jnp.zeros(2)

    # uninterrupted campaign
    full = run_mh_checkpointed(loglik, space, theta0, key, cfg, n_chains=8,
                               segments=3,
                               checkpoint_path=str(tmp_path / "full.npz"))
    assert int(full.final_state.step) == 60
    assert full.samples.shape[0] == 15     # 3 segments x 5 stored blocks

    # interrupted: run only the first 20-step segment of the 60-step campaign
    part = run_mh_checkpointed(loglik, space, theta0, key,
                               MHConfig(iterations=20, burn_in=10,
                                        adaptation_period=20, thinning=4),
                               n_chains=8, segments=1,
                               checkpoint_path=str(tmp_path / "ckpt.npz"))
    assert int(part.final_state.step) == 20
    # patch: re-run with segments=3 resuming from the 1-segment checkpoint;
    # per-segment keys are fold_in(key, s), so the continuation matches
    import numpy as _np
    resumed = run_mh_checkpointed(loglik, space, theta0, key,
                                  MHConfig(iterations=60, burn_in=10,
                                           adaptation_period=20, thinning=4),
                                  n_chains=8, segments=3,
                                  checkpoint_path=str(tmp_path / "ckpt.npz"))
    # resumed run covers segments 1..2 only
    assert resumed.samples.shape[0] == 10
    _np.testing.assert_array_equal(_np.asarray(resumed.samples),
                                   _np.asarray(full.samples[5:]))
    _np.testing.assert_array_equal(_np.asarray(resumed.final_state.x),
                                   _np.asarray(full.final_state.x))

    # fully-covered checkpoint refuses to run zero segments
    with pytest.raises(ValueError):
        run_mh_checkpointed(loglik, space, theta0, key,
                            MHConfig(iterations=20, burn_in=5, thinning=4),
                            n_chains=8, segments=1,
                            checkpoint_path=str(tmp_path / "full.npz"))


def test_nuts_checkpoint_resume_is_exact(tmp_path, problem):
    """A NUTS run interrupted mid-campaign and resumed from the on-disk
    NUTSState reproduces the uninterrupted run bit-for-bit: the
    per-iteration key table is a pure function of the master key, sliced
    at ``state.it`` (run_nuts ``initial_state`` semantics)."""
    from mmidv1_tpu.calibration.nuts import NUTSConfig, run_nuts
    from mmidv1_tpu.utils.checkpoint import load_nuts_state, save_nuts_state

    loglik, space = problem
    theta0 = jnp.zeros(2)
    key = jax.random.PRNGKey(7)
    cfg = NUTSConfig(iterations=12, adaptation_window=4, max_tree_depth=3)

    full = run_nuts(loglik, space, theta0, key, cfg, n_chains=4, segments=4)

    # interrupted run: only the first 2 of 4 segments execute, then the
    # state round-trips through disk and a fresh call finishes the rest
    saved = {}

    def grab(state, xs, lps):
        if int(state.it) == 6:
            saved["state"] = state
            saved["xs"] = np.asarray(xs)

    part1 = run_nuts(loglik, space, theta0, key, cfg, n_chains=4, segments=4,
                     on_segment=grab)
    assert "state" in saved
    ckpt = tmp_path / "nuts_state.npz"
    save_nuts_state(str(ckpt), saved["state"])
    resumed = load_nuts_state(str(ckpt))
    for a, b in zip(resumed, saved["state"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    part2 = run_nuts(loglik, space, theta0, key, cfg, n_chains=4, segments=4,
                     initial_state=resumed)
    assert part2.samples.shape[0] == cfg.iterations - 6
    glued = np.concatenate([np.asarray(full.samples[:6]),
                            np.asarray(part2.samples)], axis=0)
    np.testing.assert_array_equal(glued, np.asarray(full.samples))
    np.testing.assert_array_equal(np.asarray(part1.samples),
                                  np.asarray(full.samples))


def test_checkpointed_resume_when_thinning_not_dividing_segment(tmp_path,
                                                                problem):
    """Each segment actually runs ceil(per_segment/thinning)*thinning steps;
    the resume index must divide by the steps ACTUALLY run. With
    per_segment=10 and thinning=4 every segment runs 12 steps, so after 5
    completed segments the checkpoint is at step 60 — the old
    step // per_segment index computed 6 and falsely declared a 6-segment
    campaign complete (and silently skipped segments at smaller drifts)."""
    import numpy as _np

    from mmidv1_tpu.calibration.mh import run_mh_checkpointed

    loglik, space = problem
    key = jax.random.PRNGKey(5)
    theta0 = jnp.zeros(2)
    cfg = MHConfig(iterations=60, burn_in=4, adaptation_period=20, thinning=4)

    full = run_mh_checkpointed(loglik, space, theta0, key, cfg, n_chains=8,
                               segments=6,
                               checkpoint_path=str(tmp_path / "full.npz"))
    assert int(full.final_state.step) == 72      # 6 x ceil(10/4)*4

    part = run_mh_checkpointed(loglik, space, theta0, key,
                               MHConfig(iterations=50, burn_in=4,
                                        adaptation_period=20, thinning=4),
                               n_chains=8, segments=5,
                               checkpoint_path=str(tmp_path / "ckpt.npz"))
    assert int(part.final_state.step) == 60
    resumed = run_mh_checkpointed(loglik, space, theta0, key, cfg, n_chains=8,
                                  segments=6,
                                  checkpoint_path=str(tmp_path / "ckpt.npz"))
    # must run EXACTLY segment 5 (3 stored blocks), not raise
    # "checkpoint already covers all 6 segments" (step 60 // 10 = 6)
    assert resumed.samples.shape[0] == 3
    _np.testing.assert_array_equal(_np.asarray(resumed.samples),
                                   _np.asarray(full.samples[15:]))
    _np.testing.assert_array_equal(_np.asarray(resumed.final_state.x),
                                   _np.asarray(full.final_state.x))

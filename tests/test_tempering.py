"""Replica-exchange (parallel tempering) sampler: mixing + invariants.

The capability test is the one that motivated the sampler: on a well-separated
bimodal target, the plain ensemble AM sampler started in one mode never finds
the other (this is exactly the split-R-hat >> 1 pathology of the Spain-2020
campaign diagnostics), while the tempered ladder crosses between modes and
recovers both weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.mh import MHConfig, run_mh
from mmidv1_tpu.calibration.param_space import ParameterSpace
from mmidv1_tpu.calibration.tempering import (PTConfig, init_pt_state,
                                              pt_swap_step, run_pt)
from mmidv1_tpu.params import make_params


@pytest.fixture(scope="module")
def bimodal_problem():
    """Two equal-weight Gaussian modes at +/-2 in the first coordinate,
    sigma 0.25 — a ~8-sigma gap that single-temperature random-walk MH
    cannot cross in any realistic run length."""
    sep, sd = 2.0, 0.25

    def loglik(theta):
        a = -0.5 * jnp.sum(((theta - sep) / sd) ** 2)
        b = -0.5 * jnp.sum(((theta + sep) / sd) ** 2)
        return jnp.logaddexp(a, b)

    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta"]
    space = ParameterSpace.create(
        names, {n: (-8.0, 8.0) for n in names}, {n: 0.25 for n in names},
        template)
    return loglik, space, sep


def _mode_weight(samples):
    """Fraction of (draws, chains) in the positive mode of coordinate 0."""
    burn = samples.shape[0] // 2
    return float(np.mean(np.asarray(samples)[burn:, :, 0] > 0))


@pytest.mark.slow
def test_pt_mixes_where_plain_mh_cannot(bimodal_problem):
    loglik, space, sep = bimodal_problem
    theta0 = jnp.asarray([sep, sep])          # start in the positive mode
    key = jax.random.PRNGKey(0)

    mh = run_mh(loglik, space, theta0, key,
                MHConfig(iterations=2000, burn_in=200, thinning=4,
                         adaptation_period=2000),   # freeze cov: no cheating
                n_chains=32, jitter=0.5)
    w_mh = _mode_weight(mh.samples)
    assert w_mh > 0.95, (
        f"plain MH unexpectedly escaped the starting mode (w={w_mh}); "
        "the bimodal fixture is no longer a valid hardness test")

    pt = run_pt(loglik, space, theta0, key,
                PTConfig(iterations=2000, burn_in=200, thinning=4,
                         adaptation_period=2000, n_rungs=8, beta_min=0.01),
                n_chains=32, jitter=0.5)
    w_pt = _mode_weight(pt.samples)
    assert 0.25 < w_pt < 0.75, f"cold rung mode weight {w_pt} not ~0.5"
    # the ladder must actually be exchanging
    assert float(np.min(np.asarray(pt.swap_rate))) > 0.05


def test_pt_single_rung_is_plain_mh_shape(bimodal_problem):
    """K=1 degenerates to an untempered sampler with the right shapes."""
    loglik, space, sep = bimodal_problem
    theta0 = jnp.zeros(2)
    cfg = PTConfig(iterations=12, burn_in=2, thinning=3, n_rungs=1)
    r = run_pt(loglik, space, theta0, jax.random.PRNGKey(1), n_chains=4,
               cfg=cfg)
    assert r.samples.shape == (4, 4, 2)
    assert np.isfinite(np.asarray(r.sample_logps)).all()
    assert np.isfinite(float(r.best_logp))


def test_pt_swap_preserves_states_and_pairs_logp(bimodal_problem):
    """A swap sweep permutes (x, logp) pairs within chain columns: the
    multiset of rows per column is invariant and x stays paired with ITS
    logp."""
    loglik, space, _ = bimodal_problem
    cfg = PTConfig(n_rungs=6, beta_min=0.05)
    betas = cfg.ladder(jnp.float64)
    key = jax.random.PRNGKey(3)
    state = init_pt_state(space, jnp.zeros(2), jax.vmap(loglik), key,
                          n_rungs=6, n_chains=5, jitter=2.0)
    for parity in (0, 1):
        new = pt_swap_step(state, jax.random.fold_in(key, parity), betas,
                           jnp.asarray(parity))
        x_old, x_new = np.asarray(state.x), np.asarray(new.x)
        lp_old, lp_new = np.asarray(state.logp), np.asarray(new.logp)
        for i in range(5):   # per chain column
            old_rows = sorted(map(tuple, x_old[:, i, :]))
            new_rows = sorted(map(tuple, x_new[:, i, :]))
            assert old_rows == new_rows
        # logp rows moved WITH their x rows
        relift = np.asarray(jax.vmap(jax.vmap(loglik))(new.x))
        np.testing.assert_allclose(lp_new, relift, rtol=1e-12)
        assert int(np.sum(np.asarray(new.swap_tries))) > 0


def test_pt_ladder_validation():
    cfg = PTConfig(n_rungs=4, beta_min=0.1)
    lad = np.asarray(cfg.ladder(jnp.float64))
    assert lad[0] == 1.0 and np.isclose(lad[-1], 0.1)
    assert (np.diff(lad) < 0).all()
    with pytest.raises(ValueError):
        PTConfig(beta_min=0.0).ladder(jnp.float64)
    with pytest.raises(ValueError):
        PTConfig(n_rungs=0).ladder(jnp.float64)


def test_pt_accepts_batch_native_objective(bimodal_problem):
    """loglik_batch (e.g. the Pallas kernel) sees (K*N, d) batches."""
    loglik, space, _ = bimodal_problem
    seen = []

    def ll_batch(T):
        seen.append(T.shape)
        return jax.vmap(loglik)(T)

    cfg = PTConfig(iterations=4, burn_in=0, thinning=2, n_rungs=3)
    r = run_pt(loglik, space, jnp.zeros(2), jax.random.PRNGKey(5),
               cfg=cfg, n_chains=4, loglik_batch=ll_batch)
    assert all(s == (12, 2) for s in seen)
    assert np.isfinite(np.asarray(r.sample_logps)).all()


def test_pt_ladder_adaptation_equalizes_swap_rates(bimodal_problem):
    """With adapt_ladder on, a deliberately terrible initial ladder (all the
    spacing at the hot end) converges toward uniform adjacent swap rates and
    fixed endpoints (Vousden et al. 2016 scheme)."""
    loglik, space, _ = bimodal_problem
    cfg = PTConfig(iterations=1500, burn_in=1200, adaptation_period=300,
                   thinning=5, n_rungs=6, beta_min=0.02,
                   adapt_ladder=True, ladder_kappa=0.5, ladder_t0=200.0)
    # terrible seed ladder: nearly flat near beta=1, one huge hot-end gap
    bad = jnp.asarray([1.0, 0.98, 0.96, 0.94, 0.92, 0.02], jnp.float64)
    state0 = init_pt_state(space, jnp.zeros(2), jax.vmap(loglik),
                           jax.random.PRNGKey(0), n_rungs=6, n_chains=16,
                           jitter=2.0, betas=bad)
    res = run_pt(loglik, space, jnp.zeros(2), jax.random.PRNGKey(1), cfg,
                 n_chains=16, initial_state=state0)
    betas = np.asarray(res.final_state.betas)
    # endpoints pinned, ladder monotone
    assert betas[0] == 1.0
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-5)
    assert (np.diff(betas) < 0).all()
    # the hot-end gap must have closed: the adapted ladder's swap-prob EMA
    # is far more uniform than the seed ladder's (which pins the last pair
    # near zero)
    probs = np.asarray(res.final_state.swap_prob)
    assert probs.min() > 0.05, probs
    assert probs.min() / probs.max() > 0.2, probs


def test_pt_ladder_adaptation_off_keeps_ladder_fixed(bimodal_problem):
    loglik, space, _ = bimodal_problem
    cfg = PTConfig(iterations=60, burn_in=40, thinning=4, n_rungs=4,
                   beta_min=0.1, adapt_ladder=False)
    res = run_pt(loglik, space, jnp.zeros(2), jax.random.PRNGKey(2), cfg,
                 n_chains=8)
    np.testing.assert_allclose(np.asarray(res.final_state.betas),
                               np.asarray(cfg.ladder(jnp.float64)),
                               rtol=1e-12)

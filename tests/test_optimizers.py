"""Optimizer tests: PSO (all variants/topologies), hill climbing, NUTS, and the
two-phase calibrator — on analytic objectives (fast, no ODE).

The reference ships zero optimizer tests (SURVEY.md section 4); these cover the
whole menu.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration import (HillClimbConfig, MHConfig, NUTSConfig,
                                    ParameterSpace, PSOConfig, PSOVariant,
                                    Topology, calibrate, condition_covariance,
                                    run_hill_climb, run_nuts, run_pso)


def _space(d, lo=-5.0, hi=5.0, sigma=0.3):
    return ParameterSpace(
        names=tuple(f"x{i}" for i in range(d)),
        lower=jnp.full((d,), lo), upper=jnp.full((d,), hi),
        sigmas=jnp.full((d,), sigma), _scatter={})


def _quadratic(mu):
    mu = jnp.asarray(mu)
    return lambda x: -jnp.sum((x - mu) ** 2)


def _rosenbrock(x):
    return -jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


# ------------------------------------------------------------------- PSO

@pytest.mark.parametrize("variant", list(PSOVariant))
def test_pso_variants_converge(variant):
    d = 4
    space = _space(d)
    mu = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    cfg = PSOConfig(iterations=60, swarm_size=48, variant=variant,
                    topology=Topology.GLOBAL_BEST)
    res = run_pso(_quadratic(mu), space, jax.random.PRNGKey(0), cfg)
    assert float(res.best_f) > -0.05, (variant, float(res.best_f))
    np.testing.assert_allclose(np.asarray(res.best_x), np.asarray(mu), atol=0.25)


@pytest.mark.parametrize("topology", list(Topology))
def test_pso_topologies_converge(topology):
    d = 3
    space = _space(d)
    mu = jnp.asarray([0.5, -1.0, 2.0])
    cfg = PSOConfig(iterations=60, swarm_size=49, variant=PSOVariant.STANDARD,
                    topology=topology)
    res = run_pso(_quadratic(mu), space, jax.random.PRNGKey(1), cfg)
    assert float(res.best_f) > -0.05, (topology, float(res.best_f))


def test_pso_respects_bounds_and_improves_monotonically():
    d = 3
    space = _space(d, lo=0.0, hi=1.0)
    cfg = PSOConfig(iterations=40, swarm_size=32)
    res = run_pso(_quadratic(jnp.full((d,), 2.0)), space, jax.random.PRNGKey(2),
                  cfg)
    # optimum outside bounds -> best must sit at the upper bound
    np.testing.assert_allclose(np.asarray(res.best_x), 1.0, atol=1e-3)
    hist = np.asarray(res.history_best_f)
    assert (np.diff(hist) >= -1e-12).all()  # gbest is monotone
    # final covariance is symmetric PSD-ish
    c = np.asarray(res.final_cov)
    np.testing.assert_allclose(c, c.T, atol=1e-12)


def test_pso_history_and_cov_shapes():
    d = 2
    space = _space(d)
    cfg = PSOConfig(iterations=10, swarm_size=8)
    res = run_pso(_quadratic(jnp.zeros(d)), space, jax.random.PRNGKey(3), cfg)
    assert res.history_best_f.shape == (10,)
    assert res.final_cov.shape == (2, 2)


# ------------------------------------------------------------- hill climbing

def test_hill_climb_quadratic():
    d = 5
    space = _space(d)
    mu = jnp.asarray([1.0, -2.0, 0.5, 3.0, -4.0])
    cfg = HillClimbConfig(iterations=80, cloud_size=24)
    res = run_hill_climb(_quadratic(mu), space, jnp.zeros(d),
                         jax.random.PRNGKey(0), cfg)
    assert float(res.best_logl) > -0.01, float(res.best_logl)
    np.testing.assert_allclose(np.asarray(res.best_x), np.asarray(mu), atol=0.15)
    hist = np.asarray(res.history_best)
    assert (np.diff(hist) >= -1e-12).all()


def test_hill_climb_rosenbrock_progress():
    d = 4
    space = _space(d, lo=-2.0, hi=2.0, sigma=0.1)
    cfg = HillClimbConfig(iterations=150, cloud_size=32)
    res = run_hill_climb(_rosenbrock, space, jnp.full((d,), -1.0),
                         jax.random.PRNGKey(1), cfg)
    # Rosenbrock is hard; require substantial improvement over the start
    start = float(_rosenbrock(jnp.full((d,), -1.0)))
    assert float(res.best_logl) > start * 0.01, (start, float(res.best_logl))


def test_hill_climb_line_search_exploits_direction():
    """On a smooth 1-d slope the expansion ladder should travel far in one
    iteration (the crawler strategy)."""
    space = _space(1, lo=-100.0, hi=100.0, sigma=0.5)
    f = lambda x: -jnp.sum((x - 50.0) ** 2)
    cfg = HillClimbConfig(iterations=10, cloud_size=8)
    res = run_hill_climb(f, space, jnp.zeros(1), jax.random.PRNGKey(2), cfg)
    assert float(res.best_x[0]) > 30.0  # covered most of the distance quickly


# -------------------------------------------------------------------- NUTS

def test_nuts_samples_gaussian():
    d = 2
    space = _space(d, lo=-10.0, hi=10.0, sigma=0.5)
    cov = np.array([[1.0, 0.5], [0.5, 1.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    loglik = lambda x: -0.5 * x @ prec @ x
    cfg = NUTSConfig(iterations=300, adaptation_window=100, max_tree_depth=4)
    res = run_nuts(loglik, space, jnp.zeros(d), jax.random.PRNGKey(0), cfg,
                   n_chains=8)
    s = np.asarray(res.samples[100:]).reshape(-1, d)
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.6)
    assert np.isfinite(np.asarray(res.step_sizes)).all()
    acc = float(np.mean(np.asarray(res.mean_accept)))
    assert 0.3 < acc <= 1.0, acc


def test_nuts_uses_gradients():
    """NUTS on a narrow valley must move along it (gradient-guided), where a
    random walk of this few iterations would not."""
    d = 2
    space = _space(d, lo=-50.0, hi=50.0, sigma=0.1)
    # narrow valley toward (20, 20)
    loglik = lambda x: -0.5 * ((x[0] - x[1]) ** 2 / 0.01 +
                               ((x[0] + x[1]) / 2 - 20.0) ** 2 / 100.0)
    cfg = NUTSConfig(iterations=150, adaptation_window=50, max_tree_depth=5)
    res = run_nuts(loglik, space, jnp.zeros(d), jax.random.PRNGKey(1), cfg,
                   n_chains=4)
    assert float(res.best_logp) > -30.0


def test_nuts_segmented_matches_monolithic():
    """segments=k slices one host-side key split, so the chains are bitwise
    the draws of the single-dispatch run (incl. a ragged last segment)."""
    d = 2
    space = _space(d, lo=-10.0, hi=10.0, sigma=0.5)
    loglik = lambda x: -0.5 * jnp.sum(x * x)
    cfg = NUTSConfig(iterations=31, adaptation_window=10, max_tree_depth=3)
    key = jax.random.PRNGKey(7)
    a = run_nuts(loglik, space, jnp.zeros(d), key, cfg, n_chains=4)
    b = run_nuts(loglik, space, jnp.zeros(d), key, cfg, n_chains=4,
                 segments=4)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    np.testing.assert_array_equal(np.asarray(a.step_sizes),
                                  np.asarray(b.step_sizes))
    # mean_accept: sum-per-segment-then-divide reorders the float reduction
    np.testing.assert_allclose(np.asarray(a.mean_accept),
                               np.asarray(b.mean_accept), rtol=1e-12)


def test_nuts_whitened_matches_plain_at_unit_sigmas():
    """With sigmas == 1 the whitening is the identity: same PRNG path, same
    draws, bitwise-equal samples."""
    from mmidv1_tpu.calibration.nuts import run_nuts_whitened
    d = 2
    space = _space(d, lo=-10.0, hi=10.0, sigma=1.0)
    cov = np.array([[1.0, 0.3], [0.3, 1.2]])
    prec = jnp.asarray(np.linalg.inv(cov))
    loglik = lambda x: -0.5 * x @ prec @ x
    cfg = NUTSConfig(iterations=30, adaptation_window=10, max_tree_depth=3)
    key = jax.random.PRNGKey(3)
    a = run_nuts(loglik, space, jnp.zeros(d), key, cfg, n_chains=4)
    b = run_nuts_whitened(loglik, space, jnp.zeros(d), key, cfg, n_chains=4)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    np.testing.assert_array_equal(np.asarray(a.best_x), np.asarray(b.best_x))


def test_nuts_whitened_samples_anisotropic_gaussian():
    """Scales spanning 100x: the whitened sampler recovers both variances at a
    shallow tree depth (the unit-mass step size would be pinned by the stiff
    coordinate)."""
    from mmidv1_tpu.calibration.nuts import run_nuts_whitened
    d = 2
    scales = np.array([0.01, 1.0])
    space = ParameterSpace(
        names=("a", "b"),
        lower=jnp.asarray([-0.5, -10.0]), upper=jnp.asarray([0.5, 10.0]),
        sigmas=jnp.asarray(scales), _scatter={})
    prec = jnp.asarray(np.diag(1.0 / scales ** 2))
    loglik = lambda x: -0.5 * x @ prec @ x
    cfg = NUTSConfig(iterations=300, adaptation_window=100, max_tree_depth=4)
    res = run_nuts_whitened(loglik, space, jnp.zeros(d), jax.random.PRNGKey(5),
                            cfg, n_chains=8)
    s = np.asarray(res.samples[100:]).reshape(-1, d)
    np.testing.assert_allclose(s.std(axis=0), scales, rtol=0.35)
    np.testing.assert_allclose(s.mean(axis=0) / scales, 0.0, atol=0.3)
    acc = float(np.mean(np.asarray(res.mean_accept)))
    assert 0.3 < acc <= 1.0, acc


def test_nuts_dense_samples_correlated_stiff_gaussian():
    """A 3-d Gaussian with correlation 0.999 between two stiff coordinates:
    diagonal whitening leaves the conditioned direction ~500x stiffer than
    the marginals suggest, pinning the step size; dense whitening by the
    true Cholesky factor makes the target isotropic and recovers the full
    covariance at shallow depth (the Spain-2020 failure mode in miniature)."""
    from mmidv1_tpu.calibration.nuts import run_nuts_dense
    d = 3
    space = _space(d, lo=-50.0, hi=50.0, sigma=1.0)
    cov = np.array([[1.0, 0.999, 0.0],
                    [0.999, 1.0, 0.0],
                    [0.0, 0.0, 4.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -1.0, 2.0])
    loglik = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)
    cfg = NUTSConfig(iterations=300, adaptation_window=100, max_tree_depth=4)
    res = run_nuts_dense(loglik, space, jax.random.PRNGKey(9), cfg,
                         mu=mu, scale=jnp.asarray(np.linalg.cholesky(cov)),
                         n_chains=8)
    s = np.asarray(res.samples[100:]).reshape(-1, d)
    np.testing.assert_allclose(s.mean(axis=0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.8)
    # dense whitening must keep the adapted step O(1), not collapsed
    assert float(np.median(np.asarray(res.step_sizes))) > 0.05
    acc = float(np.mean(np.asarray(res.mean_accept)))
    assert 0.3 < acc <= 1.0, acc


def test_nuts_dense_warm_ensemble_init():
    """init=(B, d) theta positions continues chains from there (mass
    re-adaptation rounds); z-mapping round-trips through the Cholesky."""
    from mmidv1_tpu.calibration.nuts import run_nuts_dense
    d = 2
    space = _space(d, lo=-10.0, hi=10.0, sigma=1.0)
    cov = np.array([[1.0, 0.6], [0.6, 1.0]])
    mu = jnp.asarray([0.5, -0.5])
    prec = jnp.asarray(np.linalg.inv(cov))
    loglik = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)
    rng = np.random.default_rng(3)
    init = np.asarray(mu) + rng.normal(size=(8, d)) @ np.linalg.cholesky(cov).T
    cfg = NUTSConfig(iterations=200, adaptation_window=60, max_tree_depth=4)
    res = run_nuts_dense(loglik, space, jax.random.PRNGKey(4), cfg,
                         mu=mu, scale=jnp.asarray(np.linalg.cholesky(cov)),
                         n_chains=8, init=jnp.asarray(init))
    s = np.asarray(res.samples[60:]).reshape(-1, d)
    np.testing.assert_allclose(s.mean(axis=0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.8)


def test_nuts_dense_reflects_samples_into_bounds():
    """Dense-mass z-space is unbounded; returned theta samples must be
    reflected into the box (MCMC_REFLECT semantics)."""
    from mmidv1_tpu.calibration.nuts import run_nuts_dense
    d = 2
    space = _space(d, lo=0.0, hi=1.0, sigma=1.0)
    # mode AT the lower bound: half of z-space maps outside the box
    refl = lambda x: space.reflect(x)
    loglik = lambda x: -0.5 * jnp.sum((refl(x) / 0.1) ** 2)
    cfg = NUTSConfig(iterations=100, adaptation_window=30, max_tree_depth=3)
    res = run_nuts_dense(loglik, space, jax.random.PRNGKey(2), cfg,
                         mu=jnp.zeros(d),
                         scale=jnp.asarray(0.1 * np.eye(d)), n_chains=4)
    s = np.asarray(res.samples)
    assert (s >= 0.0).all() and (s <= 1.0).all()
    # the folded half-normal has mean ~0.08
    assert 0.02 < s.reshape(-1, d).mean() < 0.2


def test_nuts_logit_wall_pinned_target_law():
    """Truncated exponential on [0, 1] with the mode AT the wall — the
    Spain-2020 failure mode (nine wall-pinned parameters, r9) in miniature.
    The logit sampler must (a) recover the analytic truncated moments, which
    exercises the change-of-variables Jacobian (without it the y-marginal
    law is visibly wrong: mean off by ~2x), and (b) keep an O(1) adapted
    step where clamp/reflect handling collapses it."""
    from mmidv1_tpu.calibration.nuts import run_nuts_logit
    d = 2
    space = _space(d, lo=0.0, hi=1.0, sigma=1.0)
    tau = 0.1
    loglik = lambda x: -jnp.sum(x) / tau
    # analytic mean of Exp(tau) truncated to [0,1]
    m = tau - np.exp(-1 / tau) / (1 - np.exp(-1 / tau))
    cfg = NUTSConfig(iterations=600, adaptation_window=200, max_tree_depth=5)
    # y-space mass: the transformed density's bulk sits near y ~ log(tau),
    # scale O(1) — a unit mass centred there is the honest "previous trace"
    res = run_nuts_logit(loglik, space, jax.random.PRNGKey(11), cfg,
                         mu=jnp.full((d,), float(np.log(tau))),
                         scale=jnp.eye(d), n_chains=8)
    s = np.asarray(res.samples[200:]).reshape(-1, d)
    assert (s >= 0.0).all() and (s <= 1.0).all()
    np.testing.assert_allclose(s.mean(axis=0), m, rtol=0.15)
    np.testing.assert_allclose(s.std(axis=0), tau, rtol=0.25)
    assert float(np.median(np.asarray(res.step_sizes))) > 0.05
    acc = float(np.mean(np.asarray(res.mean_accept)))
    assert 0.3 < acc <= 1.0, acc


def test_nuts_logit_pure_loglik_and_warm_init():
    """sample_logps must be the PURE log-likelihood (Jacobian stripped), so
    diagnostics and f64 MAP re-selection compare like-for-like with other
    samplers; warm ensemble init in theta units round-trips through the
    logit + dense-mass composition."""
    from mmidv1_tpu.calibration.nuts import run_nuts_logit
    d = 3
    space = _space(d, lo=0.0, hi=2.0, sigma=1.0)
    mu_th = jnp.asarray([0.5, 1.0, 1.5])
    loglik = lambda x: -0.5 * jnp.sum(((x - mu_th) / 0.2) ** 2)
    rng = np.random.default_rng(0)
    init = np.clip(np.asarray(mu_th) + 0.2 * rng.normal(size=(6, d)),
                   1e-3, 2.0 - 1e-3)
    cfg = NUTSConfig(iterations=300, adaptation_window=100, max_tree_depth=4)
    res = run_nuts_logit(loglik, space, jax.random.PRNGKey(8), cfg,
                         mu=jnp.zeros(d), scale=jnp.eye(d),
                         n_chains=6, init=jnp.asarray(init))
    s = np.asarray(res.samples[100:])
    lps = np.asarray(res.sample_logps[100:])
    direct = np.asarray(jax.vmap(jax.vmap(loglik))(jnp.asarray(s)))
    np.testing.assert_allclose(lps, direct, atol=1e-3)
    flat = s.reshape(-1, d)
    np.testing.assert_allclose(flat.mean(axis=0), np.asarray(mu_th), atol=0.1)
    np.testing.assert_allclose(flat.std(axis=0), 0.2, rtol=0.3)
    # best_logp is also jacobian-stripped
    assert abs(float(res.best_logp) -
               float(loglik(jnp.asarray(res.best_x)))) < 1e-3


# --------------------------------------------------------------- calibrator

def test_condition_covariance_semantics():
    d = 4
    sig = jnp.full((d,), 0.5)
    cov = jnp.diag(jnp.asarray([1e-8, 0.1, 0.2, 0.3]))  # one collapsed direction
    out = np.asarray(condition_covariance(cov, sig))
    np.testing.assert_allclose(out, out.T, atol=1e-12)
    evals = np.linalg.eigvalsh(out)
    # eigenvalue floor: (0.1*0.5)^2 * 4 inflation = 0.01
    assert evals.min() >= 0.0099
    # inflation: the large directions are ~4x
    assert abs(out[3, 3] - 4 * 0.3) < 0.01


@pytest.mark.parametrize("algorithm", ["psomcmc", "hillmcmc", "nuts"])
def test_calibrate_end_to_end(algorithm):
    d = 3
    space = _space(d)
    mu = jnp.asarray([1.0, -1.0, 0.5])
    loglik = _quadratic(mu)
    res = calibrate(
        loglik, loglik, space, jnp.zeros(d), jax.random.PRNGKey(0),
        algorithm=algorithm,
        phase1_config=PSOConfig(iterations=30, swarm_size=24)
        if algorithm == "psomcmc" else HillClimbConfig(iterations=40, cloud_size=16),
        mh_config=MHConfig(iterations=400, burn_in=100, thinning=4),
        nuts_config=NUTSConfig(iterations=200, adaptation_window=50,
                               max_tree_depth=4),
        n_chains=8)
    np.testing.assert_allclose(np.asarray(res.best_theta), np.asarray(mu),
                               atol=0.3)
    assert float(res.best_logl) > -0.1
    if algorithm != "nuts":
        assert res.samples is not None
        assert res.phase1_cov is not None
        # posterior of -|x-mu|^2 is N(mu, I/2): check sample mean
        pooled = np.asarray(res.samples[50:]).reshape(-1, d)
        np.testing.assert_allclose(pooled.mean(axis=0), np.asarray(mu), atol=0.25)


def test_nuts_dense_converges_to_rhat_bar():
    """End-to-end convergence pipeline of the production NUTS campaign in
    miniature (scripts/nuts_campaign.py): chains warm-started OVERDISPERSED
    (2x the target width), dense-empirical mass, then the campaign's own
    summarize() diagnostics must certify convergence — split-R-hat AND
    rank-normalized R-hat < 1.05, with real ESS. Validates that the
    sampler+diagnostics chain can actually reach the bar it reports."""
    from mmidv1_tpu.analysis.diagnostics import summarize
    from mmidv1_tpu.calibration.nuts import run_nuts_dense

    d = 4
    space = _space(d, lo=-50.0, hi=50.0, sigma=1.0)
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d))
    cov = A @ A.T + 0.1 * np.eye(d)
    mu = jnp.asarray(rng.normal(size=d))
    prec = jnp.asarray(np.linalg.inv(cov))
    loglik = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)
    L = np.linalg.cholesky(cov)
    init = np.asarray(mu) + 2.0 * rng.normal(size=(16, d)) @ L.T
    cfg = NUTSConfig(iterations=400, adaptation_window=100, max_tree_depth=4)
    res = run_nuts_dense(loglik, space, jax.random.PRNGKey(11), cfg,
                         mu=mu, scale=jnp.asarray(L), n_chains=16,
                         init=jnp.asarray(init))
    post = np.asarray(res.samples[100:])          # (300, 16, d)
    diag = summarize(post, [f"x{i}" for i in range(d)])
    worst = max(v["rhat"] for v in diag.values())
    worst_rank = max(v["rank_rhat"] for v in diag.values())
    assert worst < 1.05, worst
    assert worst_rank < 1.05, worst_rank
    assert min(v["ess"] for v in diag.values()) > 100


def test_iterative_tree_matches_recursive_reference():
    """The iterative O(depth) _build_tree must reproduce the recursive
    Hoffman & Gelman Alg. 6 subtree EXACTLY on its deterministic outputs:
    endpoints (theta/r/grad plus and minus), the stop flag s', the
    valid-leaf count n', and the dual-averaging statistics (alpha, n_alpha).
    (The in-subtree proposal is reservoir-sampled leaf-by-leaf, which has the
    same uniform-over-valid-leaves LAW as the recursive join but a different
    RNG stream, so theta_prime is compared distributionally elsewhere —
    test_nuts_samples_gaussian.) A single chain, both directions, depths
    1-4, several momentum draws."""
    from mmidv1_tpu.calibration.nuts import (DELTA_MAX, _build_tree,
                                             _clip_grad)

    d = 2
    space = _space(d, lo=-100.0, hi=100.0, sigma=1.0)
    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    prec = np.linalg.inv(cov)
    logp = lambda x: -0.5 * x @ prec @ x

    def vag_np(x):
        return logp(x), -prec @ x

    def clip_np(g):
        n = np.linalg.norm(g)
        return g * min(1.0, 1000.0 / n) if np.isfinite(n) and n > 0 else g * 0

    def leapfrog_np(th, r, g, ve):
        r_half = r + 0.5 * ve * clip_np(g)
        th1 = np.clip(th + ve * r_half, -100.0, 100.0)
        lp1, g1 = vag_np(th1)
        r1 = r_half + 0.5 * ve * clip_np(g1)
        return th1, r1, g1, lp1

    def build_tree_np(th, r, g, log_u, v, j, eps, joint0):
        """Recursive H&G Alg 6 (deterministic parts only)."""
        if j == 0:
            th1, r1, g1, lp1 = leapfrog_np(th, r, g, v * eps)
            joint = lp1 - 0.5 * r1 @ r1
            finite = np.isfinite(joint)
            n1 = int(finite and log_u <= joint)
            s1 = int(finite and log_u < joint + DELTA_MAX)
            a1 = min(1.0, np.exp(joint - joint0)) if finite else 0.0
            return (th1, r1, g1, th1, r1, g1, s1, n1, a1, 1.0)
        (tm, rm, gm, tp, rp, gp, s1, n1, a1, na1) = build_tree_np(
            th, r, g, log_u, v, j - 1, eps, joint0)
        if s1 == 1:
            edge = (tp, rp, gp) if v > 0 else (tm, rm, gm)
            (tm2, rm2, gm2, tp2, rp2, gp2, s2, n2, a2, na2) = build_tree_np(
                *edge, log_u, v, j - 1, eps, joint0)
            if v > 0:
                tp, rp, gp = tp2, rp2, gp2
            else:
                tm, rm, gm = tm2, rm2, gm2
            dth = tp - tm
            s1 = s2 * int(dth @ rm >= 0) * int(dth @ rp >= 0)
            n1, a1, na1 = n1 + n2, a1 + a2, na1 + na2
        return (tm, rm, gm, tp, rp, gp, s1, n1, a1, na1)

    vag_batch = jax.vmap(
        jax.value_and_grad(lambda x: -0.5 * x @ jnp.asarray(prec) @ x))
    rng = np.random.default_rng(7)
    checked_stops = 0
    for trial in range(6):
        th0 = rng.normal(size=d) * 2.0
        r0 = rng.normal(size=d)
        lp0, g0 = vag_np(th0)
        joint0 = lp0 - 0.5 * r0 @ r0
        # mix of slice levels: some tight (early divergence), some loose
        log_u = joint0 - abs(rng.normal()) * (10.0 if trial % 2 else 0.5)
        for v in (-1.0, 1.0):
            for j in range(1, 5):
                eps = 0.3 if trial % 3 else 1.5   # large eps provokes stops
                ref = build_tree_np(th0, r0, g0, log_u, v, j, eps, joint0)
                out = _build_tree(
                    vag_batch, space,
                    jnp.asarray(th0)[None], jnp.asarray(r0)[None],
                    jnp.asarray(g0)[None], jnp.asarray([log_u]),
                    jnp.asarray([v]), j, jnp.asarray([eps]),
                    jnp.asarray([joint0]), jax.random.PRNGKey(trial))
                (tm, rm, gm, tp, rp, gp, s_ref, n_ref, a_ref, na_ref) = ref
                np.testing.assert_allclose(np.asarray(out.theta_minus[0]), tm,
                                           rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(np.asarray(out.theta_plus[0]), tp,
                                           rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(np.asarray(out.r_minus[0]), rm,
                                           rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(np.asarray(out.r_plus[0]), rp,
                                           rtol=1e-5, atol=1e-6)
                assert int(out.s_prime[0]) == s_ref, (trial, v, j)
                assert int(out.n_prime[0]) == n_ref, (trial, v, j)
                np.testing.assert_allclose(float(out.alpha[0]), a_ref,
                                           rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(float(out.n_alpha[0]), na_ref,
                                           rtol=1e-5)
                checked_stops += 1 - s_ref
    assert checked_stops > 0, "no early-stop case exercised"


def test_nuts_eps_floor_bounds_adaptation():
    """eps_floor/eps_ceil clamp the dual-averaged step: with an unreachable
    acceptance target (delta_target=1.0 — every trajectory has some energy
    error) the adaptation would spiral the step toward zero (the f32
    noise-floor pathology, OPS_ANALYSIS.md); the floor must hold it."""
    d = 2
    space = _space(d, lo=-10.0, hi=10.0, sigma=1.0)
    loglik = lambda x: -0.5 * jnp.sum(x ** 2)
    floor = 0.05
    cfg = NUTSConfig(iterations=150, adaptation_window=120, max_tree_depth=3,
                     delta_target=1.0, eps_floor=floor)
    res = run_nuts(loglik, space, jnp.zeros(d), jax.random.PRNGKey(1), cfg,
                   n_chains=4)
    eps = np.asarray(res.step_sizes)
    assert (eps >= floor - 1e-7).all(), eps
    # and the ceiling binds symmetrically (target 0.0 pushes eps upward)
    cfg2 = NUTSConfig(iterations=80, adaptation_window=60, max_tree_depth=3,
                      delta_target=0.0, eps_ceil=0.5)
    res2 = run_nuts(loglik, space, jnp.zeros(d), jax.random.PRNGKey(2), cfg2,
                    n_chains=4)
    eps2 = np.asarray(res2.step_sizes)
    assert (eps2 <= 0.5 + 1e-7).all(), eps2


def test_nuts_power_logit_law_and_k1_compat():
    """power=k vector: k=1 must reproduce the plain logit path bitwise;
    k=8 (log-like bulk) must still sample the exact bounded law — the
    Jacobian of u = sigmoid(k y)^(1/k) is the part under test."""
    from mmidv1_tpu.calibration.nuts import run_nuts_logit
    d = 2
    space = _space(d, lo=0.0, hi=1.0, sigma=1.0)
    tau = 0.1
    loglik = lambda x: -jnp.sum(x) / tau
    m = tau - np.exp(-1 / tau) / (1 - np.exp(-1 / tau))
    cfg = NUTSConfig(iterations=400, adaptation_window=150, max_tree_depth=5)
    key = jax.random.PRNGKey(13)
    mu = jnp.full((d,), float(np.log(tau)))
    a = run_nuts_logit(loglik, space, key, cfg, mu=mu, scale=jnp.eye(d),
                       n_chains=8)
    b = run_nuts_logit(loglik, space, key, cfg, mu=mu, scale=jnp.eye(d),
                       n_chains=8, power=jnp.ones(d))
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    c = run_nuts_logit(loglik, space, key, cfg, mu=mu, scale=jnp.eye(d),
                       n_chains=8, power=jnp.full((d,), 8.0))
    s = np.asarray(c.samples[150:]).reshape(-1, d)
    assert (s >= 0.0).all() and (s <= 1.0).all()
    np.testing.assert_allclose(s.mean(axis=0), m, rtol=0.15)
    np.testing.assert_allclose(s.std(axis=0), tau, rtol=0.25)
    # pure-loglik invariant holds for k=8 too
    lps = np.asarray(c.sample_logps[150:])
    direct = np.asarray(jax.vmap(jax.vmap(loglik))(jnp.asarray(
        np.asarray(c.samples[150:]))))
    np.testing.assert_allclose(lps, direct, atol=2e-3)

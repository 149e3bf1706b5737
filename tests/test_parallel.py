"""Mesh-sharded ensemble parity tests (8 virtual CPU devices).

The TPU-native replacement for the reference's ``ParallelConsistencyTest``
(``tests/model/SEPAIHRDObjectivefunctionTest.cpp:492``): the same ensemble run
must produce the same results whether it executes on one device or sharded
across a ``chains`` mesh. Per-chain RNG is fold_in(step_key, global_chain_id),
so parity is exact up to collective reduction order (tolerance ~1e-10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.mh import MHConfig, run_mh
from mmidv1_tpu.calibration.param_space import ParameterSpace
from mmidv1_tpu.calibration.pso import PSOConfig, run_pso
from mmidv1_tpu.parallel import (ensemble_mesh, run_mh_gspmd, run_mh_sharded,
                                 run_pso_sharded, shard_ensemble_pytree)


@pytest.fixture(scope="module")
def gaussian_problem():
    """3-d Gaussian log-density target + parameter space."""
    mu = jnp.asarray([0.3, -0.2, 0.5])
    sd = jnp.asarray([0.5, 0.3, 0.8])

    def loglik(theta):
        return -0.5 * jnp.sum(((theta - mu) / sd) ** 2)

    from mmidv1_tpu.params import make_params
    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta", "sigma"]
    bounds = {n: (-5.0, 5.0) for n in names}
    sigmas = {n: 0.3 for n in names}
    space = ParameterSpace.create(names, bounds, sigmas, template)
    return loglik, space, mu, sd


def test_mesh_construction():
    mesh = ensemble_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("chains",)
    with pytest.raises(ValueError):
        ensemble_mesh(n_devices=99)


def test_shard_ensemble_pytree(gaussian_problem):
    _, space, _, _ = gaussian_problem
    mesh = ensemble_mesh()
    tree = {"x": jnp.zeros((16, 3)), "cov": jnp.eye(3), "n": jnp.zeros(())}
    sharded = shard_ensemble_pytree(tree, mesh, 16)
    assert not sharded["x"].sharding.is_fully_replicated
    assert sharded["cov"].sharding.is_fully_replicated


def test_mh_sharded_matches_unsharded(gaussian_problem):
    loglik, space, mu, sd = gaussian_problem
    cfg = MHConfig(iterations=120, burn_in=20, adaptation_period=20, thinning=4,
                   regularization_epsilon=1e-8)
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(7)
    mesh = ensemble_mesh()

    ref = run_mh(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_mh_sharded(loglik, space, theta0, key, cfg, n_chains=16, mesh=mesh)

    np.testing.assert_allclose(np.asarray(shd.samples), np.asarray(ref.samples),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.best_logp),
                               np.asarray(ref.best_logp), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.final_cov),
                               np.asarray(ref.final_cov), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(shd.acceptance_rate),
                               np.asarray(ref.acceptance_rate), rtol=1e-12)


def test_mh_gspmd_matches_unsharded(gaussian_problem):
    loglik, space, mu, sd = gaussian_problem
    cfg = MHConfig(iterations=80, burn_in=20, adaptation_period=20, thinning=4,
                   regularization_epsilon=1e-8)
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(3)
    mesh = ensemble_mesh()

    ref = run_mh(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_mh_gspmd(loglik, space, theta0, key, cfg, n_chains=16, mesh=mesh)

    np.testing.assert_allclose(np.asarray(shd.samples), np.asarray(ref.samples),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.best_logp),
                               np.asarray(ref.best_logp), rtol=1e-9)


def test_mh_sharded_posterior_quality(gaussian_problem):
    """Sharded ensemble actually samples the target (moments check)."""
    loglik, space, mu, sd = gaussian_problem
    cfg = MHConfig(iterations=1500, burn_in=300, adaptation_period=100,
                   thinning=5, regularization_epsilon=1e-8)
    shd = run_mh_sharded(loglik, space, jnp.zeros(3), jax.random.PRNGKey(11),
                         cfg, n_chains=64, mesh=ensemble_mesh())
    post = np.asarray(shd.samples[60:]).reshape(-1, 3)  # drop warmup blocks
    np.testing.assert_allclose(post.mean(axis=0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(post.std(axis=0), np.asarray(sd), rtol=0.35)


def test_mh_sharded_resume(gaussian_problem):
    """A sharded run resumed from its final state continues where it left off."""
    loglik, space, _, _ = gaussian_problem
    cfg = MHConfig(iterations=40, burn_in=10, adaptation_period=20, thinning=4)
    key = jax.random.PRNGKey(5)
    mesh = ensemble_mesh()
    r1 = run_mh_sharded(loglik, space, jnp.zeros(3), key, cfg, n_chains=16,
                        mesh=mesh)
    r2 = run_mh_sharded(loglik, space, jnp.zeros(3), jax.random.fold_in(key, 9),
                        cfg, n_chains=16, mesh=mesh,
                        initial_state=r1.final_state)
    assert int(r2.final_state.step) == 80
    assert np.isfinite(np.asarray(r2.samples)).all()


def test_pso_sharded_matches_unsharded(gaussian_problem):
    loglik, space, mu, _ = gaussian_problem
    cfg = PSOConfig(swarm_size=32, iterations=30)
    key = jax.random.PRNGKey(13)
    ref = run_pso(loglik, space, key, cfg)
    shd = run_pso_sharded(loglik, space, key, cfg, mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.best_x), np.asarray(ref.best_x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(shd.best_f), np.asarray(ref.best_f),
                               rtol=1e-8)
    # and it actually optimizes
    np.testing.assert_allclose(np.asarray(shd.best_x), np.asarray(mu), atol=0.05)


def test_pt_gspmd_matches_unsharded(gaussian_problem):
    """Replica-exchange with the chain axis GSPMD-sharded over the mesh:
    identical results to the unsharded run (swaps are chain-local; the
    per-rung covariance contraction psums across shards)."""
    from mmidv1_tpu.calibration.tempering import PTConfig, run_pt
    from mmidv1_tpu.parallel import run_pt_gspmd

    loglik, space, mu, sd = gaussian_problem
    cfg = PTConfig(iterations=60, burn_in=10, adaptation_period=20, thinning=4,
                   n_rungs=4, beta_min=0.1)
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(9)
    ref = run_pt(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_pt_gspmd(loglik, space, theta0, key, cfg, n_chains=16,
                       mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples), np.asarray(ref.samples),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.swap_rate),
                               np.asarray(ref.swap_rate), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(shd.best_logp),
                               np.asarray(ref.best_logp), rtol=1e-9)


def test_mh_sharded_on_sepaihrd_objective(spain_params):
    """Sharded MCMC on the real (shortened) Spain-2020 SEPAIHRD objective."""
    from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
    from mmidv1_tpu.calibration.param_space import REFLECT
    from mmidv1_tpu.data import CalibrationData

    prm, params = spain_params
    n_days = 40
    rng = np.random.default_rng(23)
    obs = rng.poisson(5.0, size=(n_days, 4)).astype(float)
    data = CalibrationData.from_arrays(
        new_confirmed=obs, new_hospitalizations=obs, new_icu=obs * 0.2,
        new_deaths=obs * 0.1, population_by_age=prm["N"],
        initial_cumulative_confirmed=[1200.0, 2500.0, 900.0, 300.0],
        initial_cumulative_deaths=[2.0, 10.0, 40.0, 60.0],
        initial_cumulative_hospitalizations=[30.0, 120.0, 180.0, 90.0],
        initial_cumulative_icu=[4.0, 18.0, 25.0, 6.0])
    ts = make_time_grid(prm["runup_days"], n_days)
    names = ["beta_1", "theta", "seed_exposed"]
    bounds = {"beta_1": (0.1, 2.0), "theta": (0.01, 1.0),
              "seed_exposed": (1.0, 500.0)}
    sigmas = {"beta_1": 0.05, "theta": 0.05, "seed_exposed": 10.0}
    space = ParameterSpace.create(names, bounds, sigmas, params)
    loglik = build_objective(space, params, data, ts, substeps=2,
                             constraint_mode=REFLECT)
    theta0 = space.extract(params)

    cfg = MHConfig(iterations=8, burn_in=2, adaptation_period=4, thinning=2)
    key = jax.random.PRNGKey(17)
    ref = run_mh(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_mh_sharded(loglik, space, theta0, key, cfg, n_chains=16,
                         mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples), np.asarray(ref.samples),
                               rtol=1e-7, atol=1e-9)
    assert np.isfinite(np.asarray(shd.best_logp))

    # Same run with the batch-native Pallas objective evaluated per shard
    # (interpret mode on CPU): the production multi-chip configuration.
    from mmidv1_tpu.ops import build_objective_pallas
    ll_p = build_objective_pallas(space, params, data, ts, substeps=2,
                                  constraint_mode=REFLECT, interpret=True,
                                  block_b=2)
    shd_p = run_mh_sharded(loglik, space, theta0, key, cfg, n_chains=16,
                           mesh=ensemble_mesh(), loglik_batch=ll_p)
    np.testing.assert_allclose(np.asarray(shd_p.samples),
                               np.asarray(ref.samples), rtol=1e-7, atol=1e-9)


@pytest.fixture(scope="module")
def gaussian_problem_8d():
    """8-d target whose dimension EQUALS the chain count used below — the
    shape-collision case where a (d, d) covariance must stay replicated."""
    mu = jnp.linspace(-0.4, 0.4, 8)

    def loglik(theta):
        return -0.5 * jnp.sum((theta - mu) ** 2)

    from mmidv1_tpu.params import make_params
    template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
    names = ["beta", "theta", "sigma", "gamma_p", "gamma_A", "gamma_I",
             "gamma_H", "gamma_ICU"]
    bounds = {n: (-5.0, 5.0) for n in names}
    sigmas = {n: 0.3 for n in names}
    space = ParameterSpace.create(names, bounds, sigmas, template)
    return loglik, space, mu


def test_mala_gspmd_dim_equals_chains(gaussian_problem_8d):
    """d == n_chains: the (d, d) preconditioner must be replicated, not
    mistaken for a chain-batched leaf (field-name sharding regression)."""
    from mmidv1_tpu.calibration.mala import MALAConfig, run_mala
    from mmidv1_tpu.parallel import run_mala_gspmd

    loglik, space, mu = gaussian_problem_8d
    cfg = MALAConfig(iterations=40, burn_in=10, adaptation_period=20,
                     thinning=4, initial_step_size=0.3)
    theta0 = jnp.zeros(8)
    key = jax.random.PRNGKey(29)
    ref = run_mala(loglik, space, theta0, key, cfg, n_chains=8)
    shd = run_mala_gspmd(loglik, space, theta0, key, cfg, n_chains=8,
                         mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)


def test_pt_gspmd_dim_equals_chains(gaussian_problem_8d):
    """d == n_chains for PT: (K, d, d) covariance leaves must be replicated."""
    from mmidv1_tpu.calibration.tempering import PTConfig, run_pt
    from mmidv1_tpu.parallel import run_pt_gspmd

    loglik, space, mu = gaussian_problem_8d
    cfg = PTConfig(iterations=30, burn_in=10, adaptation_period=10, thinning=4,
                   n_rungs=2, beta_min=0.2)
    theta0 = jnp.zeros(8)
    key = jax.random.PRNGKey(31)
    ref = run_pt(loglik, space, theta0, key, cfg, n_chains=8)
    shd = run_pt_gspmd(loglik, space, theta0, key, cfg, n_chains=8,
                       mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)


def test_nuts_gspmd_matches_unsharded(gaussian_problem):
    """NUTS with the chain axis GSPMD-sharded: identical samples to the
    unsharded run (tree building is chain-local; only the final best-chain
    argmax reduces across shards)."""
    from mmidv1_tpu.calibration.nuts import NUTSConfig, run_nuts
    from mmidv1_tpu.parallel import run_nuts_gspmd

    loglik, space, mu, sd = gaussian_problem
    cfg = NUTSConfig(iterations=20, adaptation_window=8, max_tree_depth=3)
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(27)
    ref = run_nuts(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_nuts_gspmd(loglik, space, theta0, key, cfg, n_chains=16,
                         mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.best_logp),
                               np.asarray(ref.best_logp), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.step_sizes),
                               np.asarray(ref.step_sizes), rtol=1e-9)


def test_mala_gspmd_matches_unsharded(gaussian_problem):
    """MALA with the chain axis GSPMD-sharded: identical samples to the
    unsharded run (drift/accept are chain-local; the preconditioner
    contraction psums across shards)."""
    from mmidv1_tpu.calibration.mala import MALAConfig, run_mala
    from mmidv1_tpu.parallel import run_mala_gspmd

    loglik, space, mu, sd = gaussian_problem
    cfg = MALAConfig(iterations=60, burn_in=10, adaptation_period=20,
                     thinning=4, initial_step_size=0.3)
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(21)
    ref = run_mala(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_mala_gspmd(loglik, space, theta0, key, cfg, n_chains=16,
                         mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.best_logp),
                               np.asarray(ref.best_logp), rtol=1e-9)


def test_mh_sharded_de_matches_unsharded(gaussian_problem):
    """Red-black DE-MC under shard_map: partner indices come from GLOBAL
    tables and the walker gather crosses shards (lax.all_gather), and the
    active-half parity is computed from global chain ids — the sharded run
    must reproduce the single-device ensemble bit-for-bit."""
    loglik, space, mu, sd = gaussian_problem
    cfg = MHConfig(iterations=120, burn_in=20, adaptation_period=20,
                   thinning=4, regularization_epsilon=1e-8, proposal="de")
    theta0 = jnp.zeros(3)
    key = jax.random.PRNGKey(13)
    mesh = ensemble_mesh()

    ref = run_mh(loglik, space, theta0, key, cfg, n_chains=16)
    shd = run_mh_sharded(loglik, space, theta0, key, cfg, n_chains=16,
                         mesh=mesh)

    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.acceptance_rate),
                               np.asarray(ref.acceptance_rate), rtol=1e-12)
    # red-black: nothing may move on the frozen half — per-proposal
    # acceptance is still a meaningful rate in (0, 1]
    acc = np.asarray(ref.acceptance_rate)
    assert (acc > 0).all() and (acc <= 1.0).all()


def test_nuts_logit_gspmd_matches_unsharded():
    """Logit-space dense-mass NUTS (the production sampler) with the chain
    axis GSPMD-sharded: identical samples to the unsharded run — the logit
    transform/Jacobian are chain-elementwise and the mass matmuls contract
    only the replicated parameter axis."""
    from mmidv1_tpu.calibration.nuts import NUTSConfig, run_nuts_logit
    from mmidv1_tpu.calibration.param_space import ParameterSpace
    from mmidv1_tpu.parallel import run_nuts_logit_gspmd

    d = 2
    space = ParameterSpace(names=("a", "b"),
                           lower=jnp.zeros(d), upper=jnp.ones(d),
                           sigmas=jnp.full((d,), 0.1), _scatter={})
    loglik = lambda x: -jnp.sum(x) / 0.1      # mode AT the wall
    cfg = NUTSConfig(iterations=20, adaptation_window=8, max_tree_depth=3)
    key = jax.random.PRNGKey(5)
    mu = jnp.full((d,), float(np.log(0.1)))
    S = jnp.eye(d)
    ref = run_nuts_logit(loglik, space, key, cfg, mu=mu, scale=S,
                         n_chains=16)
    shd = run_nuts_logit_gspmd(loglik, space, key, cfg, mu=mu, scale=S,
                               n_chains=16, mesh=ensemble_mesh())
    np.testing.assert_allclose(np.asarray(shd.samples),
                               np.asarray(ref.samples), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shd.sample_logps),
                               np.asarray(ref.sample_logps),
                               rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(np.asarray(shd.step_sizes),
                               np.asarray(ref.step_sizes), rtol=1e-9)

"""Pallas adjoint-kernel engine: exactness vs jax.grad through the XLA fold.

Runs the kernels in interpret mode on the CPU backend (float64); the same
code path compiles via Mosaic on TPU (measured: 1.74e5 grad-evals/s/chip at
8192 chains — 3.2x the XLA adjoint — with grad parity 7e-5 relative vs the
XLA float32 adjoint; OPS_ANALYSIS.md "Pallas adjoint").
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidv1_tpu.calibration.objective import build_objective, make_time_grid
from mmidv1_tpu.calibration.param_space import REFLECT, ParameterSpace
from mmidv1_tpu.data import (CalibrationData, read_param_bounds,
                             read_params_to_calibrate, read_proposal_sigmas,
                             read_sepaihrd_parameters)
from mmidv1_tpu.data.contact_matrix import read_matrix_from_csv
from mmidv1_tpu.ops import build_objective_pallas_grad
from mmidv1_tpu.utils.fileutils import get_project_root


@pytest.fixture(scope="module")
def short_spain():
    """Real config, shortened horizon (45 observed days, crosses the run-up
    boundary and two schedule breaks)."""
    root = get_project_root()
    cfg = os.path.join(root, "data", "configuration")
    data = CalibrationData.from_csv(
        os.path.join(root, "data", "processed", "processed_data.csv"),
        "2020-03-01", "2020-04-14")
    M = read_matrix_from_csv(os.path.join(root, "data", "contacts.csv"), 4, 4)
    params = read_sepaihrd_parameters(
        os.path.join(cfg, "initial_guess.txt"), 4,
        N=data.population_by_age, M_baseline=M, dtype=jnp.float64)
    space = ParameterSpace.create(
        read_params_to_calibrate(os.path.join(cfg, "params_to_calibrate.txt")),
        read_param_bounds(os.path.join(cfg, "param_bounds.txt")),
        read_proposal_sigmas(os.path.join(cfg, "proposal_sigmas.txt")),
        params)
    ts = make_time_grid(float(np.asarray(params.runup_days)),
                        data.n_data_points)
    theta0 = space.extract(params)
    thetas = theta0[None] + 0.02 * space.sigmas * jax.random.normal(
        jax.random.PRNGKey(0), (4, space.dim))
    return space, params, data, ts, thetas


@pytest.mark.parametrize("tab,ss", [
    ("cash_karp", 3),
    pytest.param("dopri5", 4, marks=pytest.mark.slow),
])
def test_adjoint_matches_jax_grad(short_spain, tab, ss):
    """Kernel value_and_grad == jax.value_and_grad of the XLA objective."""
    space, params, data, ts, thetas = short_spain
    loglik = build_objective(space, params, data, ts, substeps=ss,
                             tableau=tab, constraint_mode=REFLECT,
                             dtype=jnp.float64)
    ll_ref, g_ref = jax.jit(jax.vmap(jax.value_and_grad(loglik)))(thetas)
    vg = build_objective_pallas_grad(space, params, data, ts, substeps=ss,
                                     tableau=tab, constraint_mode=REFLECT,
                                     dtype=jnp.float64, block_b=4,
                                     interpret=True)
    ll_p, g_p = vg(thetas)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-9)


def test_adjoint_value_batch_and_padding(short_spain):
    """The .value_batch view matches, including an odd (padded) batch."""
    space, params, data, ts, thetas = short_spain
    loglik = build_objective(space, params, data, ts, substeps=3,
                             tableau="cash_karp", constraint_mode=REFLECT,
                             dtype=jnp.float64)
    ll_ref = jax.jit(jax.vmap(loglik))(thetas[:3])
    vg = build_objective_pallas_grad(space, params, data, ts, substeps=3,
                                     tableau="cash_karp",
                                     constraint_mode=REFLECT,
                                     dtype=jnp.float64, block_b=4,
                                     interpret=True)
    ll_p = vg.value_batch(thetas[:3])      # B=3: padded to an even batch
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_ref),
                               rtol=1e-12)


@pytest.mark.slow
def test_adjoint_drives_mala(short_spain):
    """MALA accepts the kernel engine as value_and_grad_batch and advances."""
    from mmidv1_tpu.calibration.mala import MALAConfig, run_mala

    space, params, data, ts, thetas = short_spain
    vg = build_objective_pallas_grad(space, params, data, ts, substeps=3,
                                     tableau="cash_karp",
                                     constraint_mode=REFLECT,
                                     dtype=jnp.float64, block_b=4,
                                     interpret=True)
    cfg = MALAConfig(iterations=6, burn_in=2, thinning=2,
                     initial_step_size=0.02)
    res = run_mala(lambda th: vg.value_batch(th[None])[0], space,
                   space.extract(params), jax.random.PRNGKey(1), cfg,
                   n_chains=4, value_and_grad_batch=vg)
    assert np.isfinite(np.asarray(res.best_logp))
    assert np.isfinite(np.asarray(res.samples)).all()


@pytest.mark.slow
@pytest.mark.campaign
def test_adjoint_drives_nuts(short_spain):
    """Batch-native NUTS accepts the kernel engine as value_and_grad_batch."""
    from mmidv1_tpu.calibration.nuts import NUTSConfig, run_nuts

    space, params, data, ts, thetas = short_spain
    vg = build_objective_pallas_grad(space, params, data, ts, substeps=3,
                                     tableau="cash_karp",
                                     constraint_mode=REFLECT,
                                     dtype=jnp.float64, block_b=4,
                                     interpret=True)
    cfg = NUTSConfig(iterations=3, adaptation_window=2, max_tree_depth=2)
    res = run_nuts(lambda th: vg.value_batch(th[None])[0], space,
                   space.extract(params), jax.random.PRNGKey(2), cfg,
                   n_chains=4, value_and_grad_batch=vg)
    assert np.isfinite(float(res.best_logp))
    assert np.isfinite(np.asarray(res.samples)).all()

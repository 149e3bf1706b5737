"""Pallas TPU kernel: the fused SEPAIHRD objective (solve + Poisson fold).

Why a kernel (measured on TPU v5e, see OPS_ANALYSIS.md at the repo root): the
XLA scan keeps the ensemble state in HBM between the ~25 RHS/axpy kernels of
each daily interval — tens of GB of HBM round-trips per 8192-chain 365-day
solve, which bounds the measured wall time (~53 ms) while the VPU compute
itself needs ~15 ms. This kernel runs the ENTIRE fixed-grid Dopri5 integration
and Poisson log-likelihood fold inside one ``pallas_call``: the per-chain
state stays in VMEM across all 365 x substeps x 7 stages; HBM traffic drops to
one read of the inputs.

Layout notes (they ARE the performance):
- chains ride the lane dimension (trailing axis), compartments are ELEVEN
  SEPARATE (4, B_tile) blocks carried as a tuple through the time loop — a
  single (44, B) array would put compartment boundaries at non-8-aligned
  sublane offsets and every stage slice/concat would lower to cross-tile
  shuffles (measured 11x SLOWER than XLA; the tuple layout never slices).
- observations are per-stream (T_obs, 4) tables (deaths / hosp / icu,
  premultiplied by their validity mask); the per-day Poisson pairing
  sum_age obs * log(inc) is a (1,4)@(4,Bt) contraction per stream.

Semantics are identical to
:func:`mmidv1_tpu.calibration.objective.build_objective` (the hot path of the
reference's ``SEPAIHRDObjectiveFunction::calculate``,
``src/model/objectives/SEPAIHRDObjectiveFunction.cpp:62-279``): per-interval
frozen beta(t)*kappa(t)*scaling, daily incidence = clamped diff of
D/CumH/CumICU anchored at row 0, 3-stream Poisson LL over post-run-up rows
with NaN/negative-observation skipping. Parity-tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ode.tableaus import get_tableau

# per-chain parameter block rows: 8 age vectors then 7 scalars
_AGE_VEC_ROWS = 8 * 4
N_PARAM_ROWS = _AGE_VEC_ROWS + 7   # 39

_EPS = C.POISSON_EPSILON

# state tuple index map
_S, _E, _P, _A, _I, _H, _ICU, _R, _D, _CUMH, _CUMICU = range(11)


def _rhs(y, prm, M):
    """dy/dt; ``y`` is a tuple of 11 (4, Bt) blocks, ``prm`` a dict of
    parameter blocks, ``M`` the (4, 4) contact matrix."""
    S, E, Pc, A, I, H, ICU = (y[_S], y[_E], y[_P], y[_A], y[_I], y[_H],
                              y[_ICU])
    ip = (Pc + A + prm["theta"] * I) * prm["hinfN"]          # (4, Bt)
    # exact f32 contraction (TPU MXU f32 matmuls multiply in bf16 by default)
    lam = jnp.dot(M, ip, preferred_element_type=ip.dtype,
                  precision=jax.lax.Precision.HIGHEST)       # (4, Bt)
    lam = jnp.maximum(prm["beta"] * (prm["a"] * lam), 0.0)

    fSE = lam * S
    fEP = prm["sigma"] * E
    fPo = prm["gamma_p"] * Pc
    fPA = prm["p"] * fPo
    fPI = fPo - fPA
    fIH = prm["h"] * I
    fIR = prm["gamma_I"] * I
    fIDc = prm["d_community"] * I
    fHICU = prm["icu"] * H
    dHrow = prm["d_H"] * H
    dICUrow = prm["d_ICU"] * ICU

    return (
        -fSE,                                        # dS
        fSE - fEP,                                   # dE
        fEP - fPo,                                   # dP
        fPA - prm["gamma_A"] * A,                    # dA
        fPI - (fIR + fIH + fIDc),                    # dI
        fIH - (prm["gamma_H"] * H + dHrow + fHICU),  # dH
        fHICU - (prm["gamma_ICU"] * ICU + dICUrow),  # dICU
        prm["gamma_A"] * A + fIR + prm["gamma_H"] * H
        + prm["gamma_ICU"] * ICU,                    # dR
        dHrow + dICUrow + fIDc,                      # dD
        fIH,                                         # dCumH
        fHICU,                                       # dCumICU
    )


def _axpy(y, coef, k):
    return tuple(yc + coef * kc for yc, kc in zip(y, k))


def _make_kernel(T: int, T_obs: int, runup_offset: int, substeps: int,
                 tableau: str, period_runs):
    tab = get_tableau(tableau)
    h = 1.0 / substeps
    a_tab, b_tab, fsal = tab.a, tab.b, tab.fsal
    stages = tab.stages

    def dopri_interval(y, prm, M):
        k = _rhs(y, prm, M)
        for _ in range(substeps):
            ks = [k]
            for i in range(1, stages):
                yi = y
                for j in range(i):
                    if a_tab[i, j] != 0.0:
                        # Python float: a NumPy f64 scalar would promote the
                        # f32 state to f64 under jax_enable_x64
                        yi = _axpy(yi, float(h * a_tab[i, j]), ks[j])
                ks.append(_rhs(yi, prm, M))
            y_new = y
            for i in range(stages):
                if b_tab[i] != 0.0:
                    y_new = _axpy(y_new, float(h * b_tab[i]), ks[i])
            y = y_new
            k = ks[-1] if fsal else _rhs(y, prm, M)
        return y

    def kernel(y0_ref, params_ref, bv_ref, kv_ref, M_ref,
               obs_d_ref, obs_h_ref, obs_i_ref,
               val_d_ref, val_h_ref, val_i_ref, ll_ref):
        from jax.experimental import pallas as pl

        M = M_ref[0:4, 0:4]
        Pblk = params_ref[:]                                 # (39, Bt)
        prm = {
            "a": Pblk[0:4], "hinfN": Pblk[4:8], "p": Pblk[8:12],
            "h": Pblk[12:16], "icu": Pblk[16:20], "d_H": Pblk[20:24],
            "d_ICU": Pblk[24:28], "d_community": Pblk[28:32],
            "theta": Pblk[32:33], "sigma": Pblk[33:34],
            "gamma_p": Pblk[34:35], "gamma_A": Pblk[35:36],
            "gamma_I": Pblk[36:37], "gamma_H": Pblk[37:38],
            "gamma_ICU": Pblk[38:39],
        }
        # one-time unpack of the (4, Bt) compartment blocks: y0_ref is
        # (88, Bt) with each compartment 8-row aligned (rows 8c..8c+3)
        y = tuple(y0_ref[8 * c: 8 * c + 4] for c in range(11))
        prev = (y[_D], y[_CUMH], y[_CUMICU])
        ll0 = jnp.zeros_like(y[0][0:1])                      # (1, Bt)
        dt_ = y[0].dtype

        def poisson(ov_ref, v_ref, jc, inc):
            ov = ov_ref[pl.ds(jc, 1), :]                     # (1, 4)
            v = v_ref[pl.ds(jc, 1), :]
            hi = jax.lax.Precision.HIGHEST   # bf16 multiplies would inject
            return (jnp.dot(ov, jnp.log(inc),                # O(10) LL noise
                            preferred_element_type=dt_, precision=hi)
                    - jnp.dot(v, inc, preferred_element_type=dt_,
                              precision=hi))

        def interval(t, carry, beta):
            y, prev, ll, comp = carry
            y = dopri_interval(y, dict(prm, beta=beta), M)
            cur = (y[_D], y[_CUMH], y[_CUMICU])
            j = t + 1 - runup_offset
            in_obs = jnp.logical_and(j >= 0, j < T_obs)
            jc = jnp.clip(j, 0, T_obs - 1)
            term = ll * 0.0
            for refs, pv, cv in ((0, prev[0], cur[0]), (1, prev[1], cur[1]),
                                 (2, prev[2], cur[2])):
                inc = jnp.maximum(cv - pv, 0.0) + _EPS       # (4, Bt)
                ov_ref, v_ref = ((obs_d_ref, val_d_ref),
                                 (obs_h_ref, val_h_ref),
                                 (obs_i_ref, val_i_ref))[refs]
                term = term + poisson(ov_ref, v_ref, jc, inc)
            # Kahan-compensated accumulation (see build_objective's fold)
            contrib = jnp.where(in_obs, term, 0.0) - comp
            ll_new = ll + contrib
            comp = (ll_new - ll) - contrib
            return y, cur, ll_new, comp

        if runup_offset == 0:
            inc0 = jnp.full_like(prev[0], _EPS)
            for ov_ref, v_ref in ((obs_d_ref, val_d_ref),
                                  (obs_h_ref, val_h_ref),
                                  (obs_i_ref, val_i_ref)):
                ov = ov_ref[0:1, :]
                v = v_ref[0:1, :]
                hi = jax.lax.Precision.HIGHEST
                ll0 = ll0 + (jnp.dot(ov, jnp.log(inc0),
                                     preferred_element_type=dt_, precision=hi)
                             - jnp.dot(v, inc0, preferred_element_type=dt_,
                                       precision=hi))

        # The daily intervals are grouped into STATIC runs of constant
        # (beta period, kappa period) — schedule breakpoints are fixed file
        # constants, so beta(t)*kappa(t) is one (1, Bt) multiply per run
        # instead of a per-chain (T-1, B) table materialized in HBM (that
        # table's construction + relayout dominated the objective's cost).
        carry = (y, prev, ll0, jnp.zeros_like(ll0))
        for pb, pk, start, count in period_runs:
            beta = bv_ref[pb:pb + 1, :] * kv_ref[pk:pk + 1, :]
            carry = jax.lax.fori_loop(
                start, start + count,
                lambda t, c, beta=beta: interval(t, c, beta), carry)
        _, _, ll, _comp = carry
        ll_ref[:] = ll

    return kernel


def period_runs_for_grid(ts, beta_end_times, kappa_end_times):
    """Static per-interval schedule runs: consecutive daily intervals sharing
    the same (beta period, kappa period), evaluated at interval midpoints
    (matching ``interval_beta_eff``). Returns a tuple of
    ``(beta_row, kappa_row, start_interval, count)``."""
    ts = np.asarray(ts, dtype=np.float64)
    mids = 0.5 * (ts[:-1] + ts[1:])
    bet = np.asarray(beta_end_times, dtype=np.float64)
    ket = np.asarray(kappa_end_times, dtype=np.float64)

    def idx(end_times, n_values):
        if n_values == 0:
            return np.zeros(len(mids), dtype=int)
        i = np.searchsorted(end_times, mids, side="left")
        return np.clip(i, 0, n_values - 1)

    pb = idx(bet, len(bet))
    pk = idx(ket, len(ket))
    runs = []
    start = 0
    for t in range(1, len(mids) + 1):
        if t == len(mids) or pb[t] != pb[start] or pk[t] != pk[start]:
            runs.append((int(pb[start]), int(pk[start]), start, t - start))
            start = t
    return tuple(runs)


SCHED_ROWS = 8   # beta/kappa value rows padded to one sublane tile


@functools.partial(jax.jit, static_argnames=("runup_offset", "period_runs",
                                             "substeps", "tableau", "block_b",
                                             "interpret"))
def fused_objective(y0_pad, param_rows, bvals, kvals, M, obs_streams,
                    valid_streams, *, runup_offset: int, period_runs,
                    substeps: int = 4, tableau: str = "dopri5",
                    block_b: int = 512, interpret: bool = False):
    """Run the fused solve+fold kernel.

    Args (B = global batch; trailing-batch layout):
      y0_pad:        (88, B) initial states, compartment c at rows 8c..8c+3
                     (8-row alignment so in-kernel unpacking is tile-aligned)
      param_rows:    (39, B) per-chain parameter block
      bvals:         (8, B) per-chain beta period values * scaling (row p =
                     period p; unused rows arbitrary)
      kvals:         (8, B) per-chain kappa period values (ones when no NPI)
      M:             (4, 4) contact matrix (shared)
      obs_streams:   3 x (T_obs, 4) observations*valid: (deaths, hosp, icu)
      valid_streams: 3 x (T_obs, 4) validity masks
      period_runs:   static tuple from :func:`period_runs_for_grid`

    Returns (B,) log-likelihoods (caller applies infeasibility masking).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = y0_pad.dtype
    B = y0_pad.shape[1]
    T = 1 + sum(r[3] for r in period_runs)
    T_obs = obs_streams[0].shape[0]
    if B % block_b != 0:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")

    kernel = _make_kernel(T, T_obs, runup_offset, substeps, tableau,
                          period_runs)
    grid = (B // block_b,)
    tile = lambda rows: pl.BlockSpec((rows, block_b), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

    ll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(88), tile(N_PARAM_ROWS), tile(SCHED_ROWS),
                  tile(SCHED_ROWS), rep(4, 4),
                  rep(T_obs, 4), rep(T_obs, 4), rep(T_obs, 4),
                  rep(T_obs, 4), rep(T_obs, 4), rep(T_obs, 4)],
        out_specs=tile(1),
        out_shape=jax.ShapeDtypeStruct((1, B), dtype),
        interpret=interpret,
    )(y0_pad, param_rows, bvals, kvals, M, *obs_streams, *valid_streams)
    return ll[0]


def build_objective_pallas(space, base_params, data, ts, *,
                           base_initial_state=None, substeps: int = 4,
                           tableau: str = "dopri5", constraint_mode="reflect",
                           dtype=None, block_b: int = 512,
                           interpret: bool = False):
    """Batched objective ``loglik_batch(thetas (B, d)) -> (B,)`` backed by the
    Pallas kernel; drop-in for ``jax.vmap(build_objective(...))`` (parity
    tested). The theta -> params scatter, constraint, initial-state, and
    schedule evaluation stay in XLA (negligible); the solve+fold runs in the
    kernel.
    """
    from ..calibration.objective import lowest
    from ..models import sepaihrd

    if dtype is None:
        dtype = base_params.dtype
    ts = np.asarray(ts, dtype=np.float64)
    runup_offset = int(np.searchsorted(ts, 0.0, side="left"))
    num_obs = len(ts) - runup_offset
    if num_obs != data.n_data_points:
        raise ValueError(f"time grid has {num_obs} observation points but "
                         f"data has {data.n_data_points}")

    if base_initial_state is None:
        base_initial_state = data.initial_sepaihrd_state(
            sigma=base_params.sigma, gamma_p=base_params.gamma_p,
            gamma_A=base_params.gamma_A, gamma_I=base_params.gamma_I,
            p=base_params.p, h=base_params.h)
    base_y0 = jnp.asarray(base_initial_state, dtype=dtype)
    period_runs = period_runs_for_grid(ts, np.asarray(base_params.beta_end_times),
                                       np.asarray(base_params.kappa_end_times))

    def stream(x):
        x = np.asarray(x, dtype=np.float64)
        valid = (np.isfinite(x) & (x >= 0)).astype(np.float64)
        return (jnp.asarray(np.where(valid > 0, x, 0.0) * valid, dtype=dtype),
                jnp.asarray(valid, dtype=dtype))

    obs_d, val_d = stream(data.new_deaths)
    obs_h, val_h = stream(data.new_hospitalizations)
    obs_i, val_i = stream(data.new_icu)
    M = jnp.asarray(base_params.M_baseline, dtype=dtype)

    invN = np.where(np.asarray(base_params.N) > C.MIN_POPULATION_FOR_DIVISION,
                    1.0 / np.asarray(base_params.N), 0.0)
    invN = jnp.asarray(invN, dtype=dtype)

    def prep_one(theta):
        theta = space.constrain(theta.astype(dtype), constraint_mode)
        params = space.apply(base_params, theta)
        y0, infeasible = sepaihrd.initial_state_for_params(params, base_y0)
        # rows 8c..8c+3 hold compartment c's 4 ages (8-row alignment)
        y0_pad = jnp.zeros((11, 8), dtype=dtype).at[:, 0:4].set(y0)
        y0_pad = y0_pad.reshape(88)
        # per-period schedule value rows (scaling folded into beta)
        bsrc = (params.beta_values if params.beta_values.shape[-1]
                else params.beta[None])
        bvals = jnp.zeros((SCHED_ROWS,), dtype=dtype).at[
            :bsrc.shape[-1]].set(bsrc * params.contact_matrix_scaling_factor)
        ksrc = (params.kappa_values if params.kappa_values.shape[-1]
                else jnp.ones((1,), dtype=dtype))
        kvals = jnp.ones((SCHED_ROWS,), dtype=dtype).at[
            :ksrc.shape[-1]].set(ksrc)
        rows = jnp.concatenate([
            params.a, params.h_infec * invN, params.p, params.h, params.icu,
            params.d_H, params.d_ICU, params.d_community,
            jnp.stack([params.theta, params.sigma, params.gamma_p,
                       params.gamma_A, params.gamma_I, params.gamma_H,
                       params.gamma_ICU]),
        ])
        return y0_pad, rows, bvals, kvals, infeasible

    @jax.jit
    def loglik_batch(thetas):
        # out_axes=-1 emits the kernel's trailing-batch layout directly
        # (an explicit .T costs ~ms at 8192 chains)
        y0, rows, bvals, kvals, infeasible = jax.vmap(
            prep_one, out_axes=(-1, -1, -1, -1, 0))(thetas)
        ll = fused_objective(y0, rows, bvals, kvals, M,
                             (obs_d, obs_h, obs_i), (val_d, val_h, val_i),
                             runup_offset=runup_offset,
                             period_runs=period_runs, substeps=substeps,
                             tableau=tableau,
                             block_b=min(block_b, thetas.shape[0]),
                             interpret=interpret)
        bad = infeasible | jnp.isnan(ll) | jnp.isinf(ll)
        return jnp.where(bad, lowest(dtype), ll)

    return loglik_batch

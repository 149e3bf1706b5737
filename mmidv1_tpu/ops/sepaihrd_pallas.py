"""Pallas TPU kernel: the fused SEPAIHRD objective (solve + Poisson fold).

Why a kernel (measured on TPU, see OPS_ANALYSIS.md at the repo root): the
XLA scan keeps the ensemble state in HBM between the ~25 RHS/axpy kernels of
each daily interval — tens of GB of HBM round-trips per 8192-chain 365-day
solve. This kernel runs the ENTIRE fixed-grid Dopri5 integration and Poisson
log-likelihood fold inside one ``pallas_call``: the per-chain state stays in
VMEM across all 365 x substeps x 7 stages; HBM traffic drops to one read of
the inputs.

Layout notes (they ARE the performance):

- chains ride the lane dimension (trailing axis); the state is ONE fused
  (88, B/2) array whose eleven compartment blocks sit at TILE-ALIGNED
  8-row offsets, so RHS slices are free views and every RK stage axpy is a
  single whole-state op (~8% faster than a tuple of 11 blocks). The
  original sin to avoid is the unpacked (44, B) layout: 4-row compartments
  straddle sublane tiles and every slice/concat lowers to cross-tile
  shuffles (measured 11x SLOWER than XLA).
- **sublane packing**: an f32 vreg is (8 sublanes, 128 lanes) but the model
  has only 4 age groups, so a naive (4, B) block leaves half of every vector
  register empty. The batch is therefore split in two halves and packed into
  the 8 sublanes: rows 0-3 = ages of chain-half A, rows 4-7 = ages of
  chain-half B, giving (8, B/2) fully-occupied blocks. Measured ~1.9x on the
  in-scan kernel time vs the unpacked (4, B) layout (OPS_ANALYSIS.md).
  Per-chain scalars are duplicated across their half's 4 sublanes at prep
  time; the contact matvec becomes a blockdiag(M, M) (8,8)x(8,B/2) dot; the
  per-day Poisson pairing uses (2,8)@(8,B/2) contractions whose two output
  rows are the two chain halves.
- observations+validity masks live in ONE pair of fused (T_obs, 48)
  top/bottom tables ([O_d | O_h | O_i | V_d | V_h | V_i] 8-col groups;
  ``top`` rows [obs | 0] for chain-half A, ``bottom`` rows [0 | obs] for
  half B), so a day's whole 3-stream Poisson pairing is two (1, 48)
  dynamic-row slices, one concat, and ONE (2, 48) x (48, B/2) contraction
  against [log incs; -incs] — never a sublane shuffle of the state, and one
  tiny dot per day instead of six (the per-day fold machinery, not the RK
  arithmetic, owned ~60% of the kernel step when it was 6 dots + 12 reads).
  Runs that end before the observation window statically skip the fold.
- beta(t)*kappa(t)*scaling is folded per STATIC schedule run at prep time
  (schedule breakpoints are fixed file constants): one (2*n_runs, B/2) table,
  expanded to an (8, B/2) broadcast once per run inside the kernel instead of
  a per-chain (T-1, B) table materialized in HBM.

Semantics are identical to
:func:`mmidv1_tpu.calibration.objective.build_objective` (the hot path of the
reference's ``SEPAIHRDObjectiveFunction::calculate``,
``src/model/objectives/SEPAIHRDObjectiveFunction.cpp:62-279``): per-interval
frozen beta(t)*kappa(t)*scaling, clamped daily incidence of D/CumH/CumICU
anchored at row 0 (computed by resetting those pure-accumulator rows at each
interval start — exact-arithmetic-equal to the reference's cumulative diffs
but ~an order of magnitude less f32 roundoff; see ``calibration.objective``),
3-stream Poisson LL over post-run-up rows with NaN/negative-observation
skipping. Parity-tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ode.tableaus import get_tableau

# packed per-chain parameter block rows: 8 age-vector groups + 7 scalar
# groups, each an (8, B/2) row-group (rows 0-3 half-A, 4-7 half-B)
N_PARAM_GROUPS = 15
N_PARAM_ROWS = 8 * N_PARAM_GROUPS          # 120

_PARAM_ORDER = ("a", "hinfN", "p", "h", "icu", "d_H", "d_ICU", "d_community",
                "theta", "sigma", "gamma_p", "gamma_A", "gamma_I", "gamma_H",
                "gamma_ICU")

_EPS = C.POISSON_EPSILON

# state tuple index map
_S, _E, _P, _A, _I, _H, _ICU, _R, _D, _CUMH, _CUMICU = range(11)


def _rhs(y, prm, M):
    """dy/dt; ``y`` is a tuple of 11 (8, Bt) packed blocks, ``prm`` a dict of
    (8, Bt) parameter blocks, ``M`` the (8, 8) blockdiag contact matrix."""
    S, E, Pc, A, I, H, ICU = (y[_S], y[_E], y[_P], y[_A], y[_I], y[_H],
                              y[_ICU])
    ip = (Pc + A + prm["theta"] * I) * prm["hinfN"]          # (8, Bt)
    # exact f32 contraction (TPU MXU f32 matmuls multiply in bf16 by default)
    lam = jnp.dot(M, ip, preferred_element_type=ip.dtype,
                  precision=jax.lax.Precision.HIGHEST)       # (8, Bt)
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


def _rhs88(y88, prm, M):
    # every compartment row-block of the fused (88, Bt) state is
    # tile-aligned (8 rows), so these slices are free views — the rule-1
    # ban on a single state array was about the UNPACKED (44, B) layout
    # whose 4-row compartments straddle sublane tiles
    y = tuple(y88[8 * c: 8 * c + 8] for c in range(11))
    return jnp.concatenate(_rhs(y, prm, M), axis=0)


def _rhs80(y80, prm, M):
    """RHS of the R-DROPPED fused state: 10 compartment blocks (80, Bt) —
    S,E,P,A,I,H,ICU at blocks 0-6, D/CumH/CumICU at 7/8/9. R is an absorbing
    compartment nothing depends on and nothing observes, so the adjoint
    kernels integrate without it (VMEM: 80-row day states instead of 88 —
    the savings that buy the backward kernel 512 lanes). Physics stays
    shared with :func:`_rhs` (which never reads ``y[_R]``)."""
    y11 = (tuple(y80[8 * c: 8 * c + 8] for c in range(7))
           + (y80[0:8],)   # placeholder R block; _rhs never reads it
           + tuple(y80[8 * c: 8 * c + 8] for c in range(7, 10)))
    d = _rhs(y11, prm, M)
    return jnp.concatenate(d[:7] + d[8:], axis=0)


def make_interval_fn(substeps: int, tableau: str, remat: bool = False,
                     rhs=None):
    """One daily interval of fused-state fixed-grid RK:
    ``(y88, prm, M) -> y88'``. Shared by the forward kernel and the adjoint
    kernel (:mod:`mmidv1_tpu.ops.sepaihrd_adjoint`), which differentiates it
    with ``jax.vjp`` at trace time.

    ``remat=True`` wraps each substep in ``jax.checkpoint`` so the vjp holds
    only one substep's stage states at a time (the peak-VMEM knob of the
    adjoint kernel) — bitwise-identical forward states: the first stage of a
    substep is exactly ``rhs(y)`` whether carried (FSAL) or recomputed.

    ``rhs`` defaults to the full 88-row :func:`_rhs88`; pass :func:`_rhs80`
    for the adjoint kernels' R-dropped 80-row state."""
    tab = get_tableau(tableau)
    h = 1.0 / substeps
    a_tab, b_tab, fsal = tab.a, tab.b, tab.fsal
    stages = tab.stages
    _rhs_fused = _rhs88 if rhs is None else rhs

    def one_substep(y88, prm, M):
        ks = [_rhs_fused(y88, prm, M)]
        for i in range(1, stages):
            yi = y88
            for j in range(i):
                if a_tab[i, j] != 0.0:
                    # Python float: a NumPy f64 scalar would promote the
                    # f32 state to f64 under jax_enable_x64
                    yi = yi + float(h * a_tab[i, j]) * ks[j]
            ks.append(_rhs_fused(yi, prm, M))
        y_new = y88
        for i in range(stages):
            if b_tab[i] != 0.0:
                y_new = y_new + float(h * b_tab[i]) * ks[i]
        return y_new

    if remat:
        # expose the self-contained substep: the adjoint kernel re-derives
        # each substep's transpose separately so only one substep's stage
        # states are live at a time (jax.checkpoint's remat2 primitive has
        # no Mosaic lowering, so the rematerialization is spelled out there)
        return one_substep

    def dopri_interval(y88, prm, M):
        # fused-state RK: each stage/update axpy is ONE (88, Bt) op instead
        # of 11 per-compartment ops (measured ~8% faster at cash_karp ss=3;
        # numerically identical — same elementwise ops in the same order)
        k = _rhs_fused(y88, prm, M)
        for _ in range(substeps):
            ks = [k]
            for i in range(1, stages):
                yi = y88
                for j in range(i):
                    if a_tab[i, j] != 0.0:
                        yi = yi + float(h * a_tab[i, j]) * ks[j]
                ks.append(_rhs_fused(yi, prm, M))
            y_new = y88
            for i in range(stages):
                if b_tab[i] != 0.0:
                    y_new = y_new + float(h * b_tab[i]) * ks[i]
            y88 = y_new
            k = ks[-1] if fsal else _rhs_fused(y88, prm, M)
        return y88

    return dopri_interval


def _make_kernel(T: int, T_obs: int, runup_offset: int, substeps: int,
                 tableau: str, period_runs):
    dopri_interval = make_interval_fn(substeps, tableau)

    def kernel(y0_ref, params_ref, sched_ref, M_ref, ov_t_ref, ov_b_ref,
               ll_ref):
        from jax.experimental import pallas as pl

        M = M_ref[0:8, 0:8]
        Pblk = params_ref[:]                                 # (120, Bt)
        prm = {name: Pblk[8 * g: 8 * g + 8]
               for g, name in enumerate(_PARAM_ORDER)}
        # the state stays FUSED as (88, Bt) — compartment c at tile-aligned
        # rows 8c..8c+7; slices below are free views
        y = y0_ref[:]
        ll0 = jnp.zeros_like(y[0:2])                         # (2, Bt)
        dt_ = y.dtype
        hi = jax.lax.Precision.HIGHEST   # bf16 multiplies would inject
        # O(10) LL noise

        def poisson_all(jc, incs):
            """All three streams' Poisson terms in ONE (2, 48) @ (48, Bt)
            contraction: rows of the fused day table are
            [O_d | O_h | O_i | V_d | V_h | V_i] (each an 8-col group, top
            rows [obs | 0] / bottom rows [0 | obs]), paired against the
            stacked state [log inc_d; log inc_h; log inc_i; -inc_d; ...].
            One tiny dot per day instead of six — the per-day fold machinery
            (not the RK arithmetic) owned ~60% of the kernel step before
            this (measured: halving substeps saved only 20%)."""
            OV = jnp.concatenate([ov_t_ref[pl.ds(jc, 1), :],
                                  ov_b_ref[pl.ds(jc, 1), :]], axis=0)  # (2,48)
            state48 = jnp.concatenate(
                [jnp.log(i) for i in incs] + [-i for i in incs], axis=0)
            return jnp.dot(OV, state48,
                           preferred_element_type=dt_, precision=hi)  # (2,Bt)

        def step_state(y, beta):
            # Per-day accumulator reset (f32 noise-floor fix, OPS_ANALYSIS.md):
            # D/CumH/CumICU are pure accumulators nothing in the RHS reads, so
            # restart them at zero each interval — the day-end block value IS
            # the day's incidence, carrying roundoff relative to the DAY
            # increment (~1e2-1e4) instead of the cumulative (~1e5-1e6).
            # They are the LAST three 8-row blocks, so the reset is one concat.
            y = jnp.concatenate(
                [y[0:8 * _D], jnp.zeros((24,) + y.shape[1:], y.dtype)], axis=0)
            y = dopri_interval(y, dict(prm, beta=beta), M)
            incs = tuple(jnp.maximum(y[8 * c: 8 * c + 8], 0.0) + _EPS
                         for c in (_D, _CUMH, _CUMICU))
            return y, incs

        def kahan_add(ll, comp, term):
            contrib = term - comp
            ll_new = ll + contrib
            return ll_new, (ll_new - ll) - contrib

        # i32 throughout: under jax_enable_x64 a bare Python-int literal is
        # i64 and the i32 fori_loop index + i64 add fails Mosaic verification

        def interval_pre(t, carry, beta):
            """Run entirely inside the run-up window: integrate only."""
            y, ll, comp = carry
            y, _ = step_state(y, beta)
            return y, ll, comp

        def interval_in(t, carry, beta):
            """Run entirely inside the observation window: unmasked fold."""
            y, ll, comp = carry
            y, incs = step_state(y, beta)
            j = t + jnp.int32(1 - runup_offset)
            ll, comp = kahan_add(ll, comp, poisson_all(j, incs))
            return y, ll, comp

        def interval_edge(t, carry, beta):
            """Run straddling the run-up boundary: masked fold."""
            y, ll, comp = carry
            y, incs = step_state(y, beta)
            j = t + jnp.int32(1 - runup_offset)
            in_obs = jnp.logical_and(j >= 0, j < jnp.int32(T_obs))
            jc = jnp.clip(j, jnp.int32(0), jnp.int32(T_obs - 1))
            term = jnp.where(in_obs, poisson_all(jc, incs), 0.0)
            ll, comp = kahan_add(ll, comp, term)
            return y, ll, comp

        if runup_offset == 0:
            inc0 = jnp.full_like(y[0:8], _EPS)
            ll0 = ll0 + poisson_all(jnp.zeros((), dtype=jnp.int32),
                                    (inc0, inc0, inc0))

        # The daily intervals are grouped into STATIC runs of constant
        # (beta period, kappa period) — schedule breakpoints are fixed file
        # constants; sched_ref row 2r / 2r+1 hold run r's effective
        # beta*kappa*scaling for chain halves A / B, expanded to one (8, Bt)
        # broadcast per run. Interval t contributes observation row
        # j = t+1-runup_offset, so a run whose last interval has j < 0 never
        # folds (static: skip the Poisson machinery entirely) and a run whose
        # first interval has j >= 0 always folds (drop the mask; j never
        # reaches T_obs — the grid ends at j = T_obs-1).
        carry = (y, ll0, jnp.zeros_like(ll0))
        for r, (_pb, _pk, start, count) in enumerate(period_runs):
            bA = sched_ref[2 * r: 2 * r + 1, :]
            bB = sched_ref[2 * r + 1: 2 * r + 2, :]
            beta = jnp.concatenate([
                jnp.broadcast_to(bA, (4,) + bA.shape[1:]),
                jnp.broadcast_to(bB, (4,) + bB.shape[1:])], axis=0)
            if start + count - 1 < runup_offset - 1:
                body = interval_pre
            elif start >= runup_offset - 1:
                body = interval_in
            else:
                body = interval_edge
            carry = jax.lax.fori_loop(
                jnp.int32(start), jnp.int32(start + count),
                lambda t, c, beta=beta, body=body: body(t, c, beta), carry)
        _, ll, _comp = carry
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


def _sched_rows(n_runs: int) -> int:
    return -(-2 * n_runs // 8) * 8


@functools.partial(jax.jit, static_argnames=("runup_offset", "period_runs",
                                             "substeps", "tableau",
                                             "block_lanes", "interpret"))
def fused_objective(y0_pack, param_pack, sched_pack, M2, obs_valid_tables,
                    *, runup_offset: int, period_runs,
                    substeps: int = 4, tableau: str = "dopri5",
                    block_lanes: int = 256, interpret: bool = False):
    """Run the fused solve+fold kernel on sublane-packed inputs.

    Args (B2 = half the padded chain batch; lanes hold chains, sublanes 0-3
    hold chain-half A's ages, sublanes 4-7 chain-half B's):
      y0_pack:      (88, B2) initial states, compartment c at rows 8c..8c+7
      param_pack:   (120, B2) parameter block: 8 age-vector groups then 7
                    scalar groups (scalars duplicated across their half's
                    4 sublanes), group g at rows 8g..8g+7
      sched_pack:   (_sched_rows(n_runs), B2) effective per-run
                    beta*kappa*scaling; rows 2r / 2r+1 = run r, halves A / B
      M2:           (8, 8) blockdiag(M, M) contact matrix (shared)
      obs_valid_tables: (top, bottom) fused (T_obs, 48) day tables; columns
                    are six 8-col groups [O_d | O_h | O_i | V_d | V_h | V_i]
                    (streams in order deaths, hosp, icu; O = obs*valid);
                    top rows put the 4 age values in cols 0-3 of each group
                    ([obs | 0]) for chain-half A, bottom rows in cols 4-7
                    ([0 | obs]) for half B
      period_runs:  static tuple from :func:`period_runs_for_grid`

    Returns (2, B2) log-likelihoods — row 0 = chain half A, row 1 = half B
    (caller flattens and applies infeasibility masking).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = y0_pack.dtype
    B2 = y0_pack.shape[1]
    ov_t, ov_b = obs_valid_tables
    T_obs = ov_t.shape[0]
    if B2 % block_lanes != 0:
        raise ValueError(f"lane batch {B2} not divisible by block_lanes "
                         f"{block_lanes}")
    T = 1 + sum(r[3] for r in period_runs)

    kernel = _make_kernel(T, T_obs, runup_offset, substeps, tableau,
                          period_runs)
    grid = (B2 // block_lanes,)
    # index-map constants derive from the grid index (i * 0, not literal 0):
    # under jax_enable_x64 a literal 0 traces as i64 next to the i32 index
    # and Mosaic rejects the mixed-type index map
    tile = lambda rows: pl.BlockSpec((rows, block_lanes), lambda i: (i * 0, i),
                                     memory_space=pltpu.VMEM)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda i: (i * 0, i * 0),
                                    memory_space=pltpu.VMEM)

    ll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(88), tile(N_PARAM_ROWS), tile(sched_pack.shape[0]),
                  rep(8, 8), rep(T_obs, 48), rep(T_obs, 48)],
        out_specs=tile(2),
        out_shape=jax.ShapeDtypeStruct((2, B2), dtype),
        interpret=interpret,
    )(y0_pack, param_pack, sched_pack, M2, ov_t, ov_b)
    return ll


def shared_prep(space, base_params, data, ts, *, base_initial_state=None,
                constraint_mode="reflect", dtype=None):
    """Everything the Pallas objective builder and the adjoint gradient
    engine (``ops/sepaihrd_adjoint.py``) share: grid validation, the fused
    observation/validity day tables, the blockdiag contact matrix, the
    initial state, and the theta -> sublane-packed prep. ONE copy on
    purpose — the adjoint's custom-VJP forward must pack bit-identically to
    the plain kernel, so the layout logic must not be able to drift.

    Returns a SimpleNamespace with ``dtype, ts, runup_offset, num_obs,
    period_runs, n_runs, ov_tables, M2, base_y0`` and ``pack_halves``:
    ``pack_halves(thetas (2*B2, d), B2) ->
    (y0_pack (88, B2), param_pack (120, B2), (beffA, beffB) (n_runs, B2) x2,
    infeasible (2*B2,))``.
    """
    import types

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
    # Host constants: closure-captured by the jitted wrapper; NumPy
    # lowers to an MLIR literal without a device fetch (utils.hostdev).
    base_y0 = np.asarray(base_initial_state, dtype=dtype)
    period_runs = period_runs_for_grid(ts,
                                       np.asarray(base_params.beta_end_times),
                                       np.asarray(base_params.kappa_end_times))

    def stream_cols(x):
        x = np.asarray(x, dtype=np.float64)
        valid = (np.isfinite(x) & (x >= 0)).astype(np.float64)
        ov = np.where(valid > 0, x, 0.0) * valid
        return ov, valid

    # fused (T_obs, 48) day tables: [O_d | O_h | O_i | V_d | V_h | V_i],
    # each group's cols 0-3 (top table, chain-half A) or 4-7 (bottom, half B)
    groups6 = []
    for x in (data.new_deaths, data.new_hospitalizations, data.new_icu):
        groups6.append(stream_cols(x)[0])
    for x in (data.new_deaths, data.new_hospitalizations, data.new_icu):
        groups6.append(stream_cols(x)[1])
    z4 = np.zeros_like(groups6[0])
    ov_top = np.concatenate(
        [np.concatenate([g, z4], axis=1) for g in groups6], axis=1).astype(dtype)
    ov_bot = np.concatenate(
        [np.concatenate([z4, g], axis=1) for g in groups6], axis=1).astype(dtype)
    Mnp = np.asarray(base_params.M_baseline, dtype=np.float64)
    M2 = np.block([[Mnp, np.zeros_like(Mnp)],
                   [np.zeros_like(Mnp), Mnp]]).astype(dtype)

    invN = np.where(np.asarray(base_params.N) > C.MIN_POPULATION_FOR_DIVISION,
                    1.0 / np.asarray(base_params.N), 0.0)
    invN = np.asarray(invN, dtype=dtype)

    def prep_one(theta):
        theta = space.constrain(theta.astype(dtype), constraint_mode)
        params = space.apply(base_params, theta)
        y0, infeasible = sepaihrd.initial_state_for_params(params, base_y0)
        y0 = y0.reshape(-1)                                  # (44,)
        agevec = jnp.concatenate([
            params.a, params.h_infec * invN, params.p, params.h, params.icu,
            params.d_H, params.d_ICU, params.d_community])   # (32,)
        scal = jnp.stack([params.theta, params.sigma, params.gamma_p,
                          params.gamma_A, params.gamma_I, params.gamma_H,
                          params.gamma_ICU])                 # (7,)
        bsrc = (params.beta_values if params.beta_values.shape[-1]
                else params.beta[None])
        bsrc = bsrc * params.contact_matrix_scaling_factor
        ksrc = (params.kappa_values if params.kappa_values.shape[-1]
                else jnp.ones((1,), dtype=dtype))
        beff = jnp.stack([bsrc[pb] * ksrc[pk]
                          for pb, pk, _, _ in period_runs])  # (n_runs,)
        return y0, agevec, scal, beff, infeasible

    # out_axes=-1 emits the kernel's trailing-batch layout directly
    # (an explicit .T costs ~ms at 8192 chains)
    prep_half = jax.vmap(prep_one, out_axes=(-1, -1, -1, -1, 0))

    def pack_halves(thetas, B2):
        yA, avA, scA, beA, infA = prep_half(thetas[:B2])
        yB, avB, scB, beB, infB = prep_half(thetas[B2:])
        pieces = []
        for c in range(11):
            pieces += [yA[4 * c: 4 * c + 4], yB[4 * c: 4 * c + 4]]
        y0_pack = jnp.concatenate(pieces)                    # (88, B2)
        groups = []
        for g in range(8):
            groups += [avA[4 * g: 4 * g + 4], avB[4 * g: 4 * g + 4]]
        for s in range(7):
            groups += [jnp.broadcast_to(scA[s:s + 1], (4, B2)),
                       jnp.broadcast_to(scB[s:s + 1], (4, B2))]
        param_pack = jnp.concatenate(groups)                 # (120, B2)
        return y0_pack, param_pack, (beA, beB), \
            jnp.concatenate([infA, infB])

    return types.SimpleNamespace(
        dtype=dtype, ts=ts, runup_offset=runup_offset, num_obs=num_obs,
        period_runs=period_runs, n_runs=len(period_runs),
        ov_tables=(ov_top, ov_bot), M2=M2, base_y0=base_y0,
        pack_halves=pack_halves)


def build_objective_pallas(space, base_params, data, ts, *,
                           base_initial_state=None, substeps: int = 4,
                           tableau: str = "dopri5", constraint_mode="reflect",
                           dtype=None, block_b: int = 2048,
                           interpret: bool = False):
    """Batched objective ``loglik_batch(thetas (B, d)) -> (B,)`` backed by the
    Pallas kernel; drop-in for ``jax.vmap(build_objective(...))`` (parity
    tested). The theta -> params scatter, constraint, initial-state, and
    schedule evaluation stay in XLA (measured ~10% of the step); the
    solve+fold runs in the kernel. ``block_b`` counts CHAINS per kernel block
    (two sublane-packed halves of ``block_b // 2`` lanes each).
    """
    from ..calibration.objective import lowest

    pp = shared_prep(space, base_params, data, ts,
                     base_initial_state=base_initial_state,
                     constraint_mode=constraint_mode, dtype=dtype)
    dtype, n_runs = pp.dtype, pp.n_runs

    @jax.jit
    def loglik_batch(thetas):
        B = thetas.shape[0]
        lanes = max(1, min(block_b, B) // 2)
        half = -(-B // 2)
        B2 = -(-half // lanes) * lanes
        pad = 2 * B2 - B
        if pad:
            thetas = jnp.concatenate(
                [thetas, jnp.broadcast_to(thetas[:1], (pad,) + thetas.shape[1:])])
        y0_pack, param_pack, (beA, beB), infeasible = \
            pp.pack_halves(thetas, B2)
        sched = jnp.stack([beA, beB], axis=1).reshape(2 * n_runs, B2)
        sched_pack = jnp.concatenate(
            [sched, jnp.zeros((_sched_rows(n_runs) - 2 * n_runs, B2),
                              dtype=sched.dtype)])

        out = fused_objective(y0_pack, param_pack, sched_pack, pp.M2,
                              pp.ov_tables,
                              runup_offset=pp.runup_offset,
                              period_runs=pp.period_runs, substeps=substeps,
                              tableau=tableau, block_lanes=lanes,
                              interpret=interpret)
        ll = jnp.concatenate([out[0], out[1]])[:B]
        bad = infeasible[:B] | jnp.isnan(ll) | jnp.isinf(ll)
        return jnp.where(bad, lowest(dtype), ll)

    return loglik_batch

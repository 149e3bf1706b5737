"""Pallas reverse-mode (adjoint) kernel for the fused SEPAIHRD objective.

Closes the gradient gap measured in OPS_ANALYSIS.md: ``jax.grad`` through the
XLA fold sustains ~5.5e4 grad-evals/s/chip (~25x the cost of a Pallas forward
eval), which prices gradient-based samplers (NUTS, :mod:`calibration.mala`)
out of contention against ensemble-AM. This module makes the whole
``value_and_grad`` of the objective a pair of Pallas kernels.

Design — chunked checkpoint/recompute (the classic adjoint memory/compute
trade, sized for VMEM):

- the FORWARD kernel (a day-indexed variant of
  :func:`sepaihrd_pallas.fused_objective`) additionally writes the state at
  every chunk boundary (``L_CHUNK`` = 24 daily intervals) to a small
  ``(n_chunks*80, B2)`` output — 14 checkpoints instead of 326 day states,
  so the buffer block stays VMEM-resident (no HBM DMA programming). Both
  kernels integrate the R-DROPPED 80-row state (``_rhs80``): R is absorbing,
  unobserved, and feeds nothing, so dropping it is exact.
- the BACKWARD kernel walks chunks in reverse (a static Python loop — same
  codegen footprint as the forward's per-run loops). Per chunk: phase 1
  re-integrates the chunk from its checkpoint, storing the ~25 day states in
  a VMEM scratch; phase 2 sweeps the days backward, forming each interval's
  transpose with ``jax.vjp`` OF THE SHARED INTERVAL FUNCTION AT TRACE TIME
  (:func:`sepaihrd_pallas.make_interval_fn`) — the adjoint math is derived
  by JAX, lowered by Mosaic like any other kernel code, and can never drift
  from the forward.
- the Poisson-fold adjoint needs day-table columns on sublanes — a transpose
  Mosaic dislikes; it is instead ONE ``dot_general`` contracting the fused
  (2, 48) day table with the (2, Bt) cotangent over axis 0 (no transpose op
  materializes). Same trick reduces the per-day beta adjoint to chain halves.
- beta stays per schedule RUN (an 8-row-aligned ``(8*n_runs, B2)`` table,
  ~40x smaller in VMEM than a per-day layout) with an SMEM ``(T_pad,)``
  day->run map; the adjoint accumulates each day's beta cotangent into its
  run's rows with an aligned read-modify-write on the output ref. The
  VMEM saved is what lets the backward kernel run at full lane width.

The public entry is :func:`build_objective_pallas_grad`, a drop-in
``value_and_grad_batch`` engine for :func:`calibration.mala.run_mala` /
NUTS: theta -> params prep stays in differentiable XLA, the solve+fold and
its adjoint run in the kernels via ``jax.custom_vjp``.

Reference lineage: replaces ``SEPAIHRDGradientObjectiveFunction``
(``src/model/objectives/SEPAIHRDGradientObjectiveFunction.cpp:15-171``,
finite differences at d+1 solves/gradient) with an exact discrete adjoint at
~3 solve-equivalents/gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sepaihrd_pallas import (_EPS, _PARAM_ORDER, N_PARAM_ROWS, _rhs80,
                              make_interval_fn)

L_CHUNK = 24   # days per backward chunk (VMEM day-state scratch sizing)

# Scoped-VMEM cap handed to Mosaic for both kernels (bytes; None = the
# default 16 MB). Lane widths past the measured defaults (fwd 1024 / bwd 256
# lanes) need headroom — scripts/adjoint_lane_probe.py raises this to probe
# them. Read at TRACE time: set it before the first engine is built (the
# jitted wrappers cache on static args, so a later change does not retrace).
VMEM_LIMIT_BYTES = None

# Backward widths past 256 lanes overflow Mosaic's default 16 MiB scoped-VMEM
# budget but fit comfortably in the raised cap (v5e has 128 MiB physical).
# Measured 2026-08-19 (scripts/adjoint_lane_probe.py, batch 2048, bitwise
# parity across widths): 256 lanes 1.255e5, 512 lanes 1.460e5, 1024 lanes
# 1.487e5 value_and_grads/s — so wide-backward is the default and the cap is
# raised automatically when the requested width needs it.
# Compile-cost ladder (scripts/adjoint_compile_probe.py, batch 8192, fresh
# cache per width, quiet chip, 2026-08-21): bwd_block_b 512 -> 49.4 s cold
# compile at 1.745e5 grad-evals/s; 1024 -> 71.1 s at 2.061e5; 2048 ->
# 126.7 s at the SAME 2.061e5. The extra Mosaic compile of the 2048-wide
# backward bought nothing, so the default bwd_block_b is 1024.
_WIDE_BWD_VMEM_BYTES = 96 << 20


def _compiler_params(bwd_lanes=None):
    limit = VMEM_LIMIT_BYTES
    if limit is None and bwd_lanes is not None and bwd_lanes > 256:
        limit = _WIDE_BWD_VMEM_BYTES
    if limit is None:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=int(limit))

# The adjoint kernels integrate the R-DROPPED 80-row state (see _rhs80): R
# is absorbing, unobserved, and feeds nothing, so its value, day states, and
# adjoint are all identically irrelevant. The 9% row cut on every day-state
# buffer is what lets the backward kernel run at 512 lanes.
_ROWS = 80
_D80, _CUMH80, _CUMICU80 = 7, 8, 9   # block indices in the 80-row layout


def _day_beta(betarun_ref, runmap_ref, t):
    """(8, Bt) effective beta for day t: the SMEM day->run map picks the
    schedule run, whose beta lives at the 8-row-aligned rows 8r..8r+7 of the
    tiny per-RUN table (already broadcast to [A x4, B x4] sublanes at prep).
    Run-indexing keeps the VMEM tables ~40x smaller than a per-day layout
    (2.8 MB -> 74 KB at 256 lanes), which is what buys the backward kernel
    lane width; 8-row alignment is required for the adjoint's dynamic
    accumulation stores."""
    from jax.experimental import pallas as pl

    r = runmap_ref[t]
    return betarun_ref[pl.ds(8 * r, 8), :]


def _day_ov(ov_t_ref, ov_b_ref, jc):
    from jax.experimental import pallas as pl

    return jnp.concatenate([ov_t_ref[pl.ds(jc, 1), :],
                            ov_b_ref[pl.ds(jc, 1), :]], axis=0)   # (2, 48)


def _cum_rows(y80):
    return (y80[8 * _D80: 8 * _D80 + 8], y80[8 * _CUMH80: 8 * _CUMH80 + 8],
            y80[8 * _CUMICU80: 8 * _CUMICU80 + 8])


def _reset_acc(y80):
    """Zero the D/CumH/CumICU accumulator blocks (the LAST three 8-row blocks
    of the 80-row layout) at a daily-interval start — the per-day incidence
    reset of the f32 noise-floor fix (see ``sepaihrd_pallas`` / OPS_ANALYSIS).
    A concat, not a dynamic_update_slice (no Mosaic lowering for the latter).
    """
    assert (_D80, _CUMH80, _CUMICU80) == (7, 8, 9)
    return jnp.concatenate(
        [y80[0:8 * _D80], jnp.zeros((24,) + y80.shape[1:], y80.dtype)], axis=0)


def _scatter_cum(vals):
    """Place three (8, Bt) row-blocks at the D/CumH/CumICU offsets of a zero
    (80, Bt) array. In the R-dropped layout they are blocks 7/8/9 — the LAST
    three 8-row blocks — so the scatter is a concat (Mosaic has no lowering
    for dynamic_update_slice on values)."""
    assert (_D80, _CUMH80, _CUMICU80) == (7, 8, 9)
    d, ch, ci = vals
    zeros = jnp.zeros((56,) + d.shape[1:], d.dtype)
    return jnp.concatenate([zeros, d, ch, ci], axis=0)


def _make_fwd_kernel(n_intervals, T_obs, runup_offset, substeps, tableau,
                     n_chunks):
    interval = make_interval_fn(substeps, tableau, rhs=_rhs80)

    def kernel(y0_ref, params_ref, betarun_ref, M_ref, ov_t_ref, ov_b_ref,
               runmap_ref, ll_ref, bounds_ref):
        from jax.experimental import pallas as pl

        M = M_ref[0:8, 0:8]
        Pblk = params_ref[:]
        prm = {name: Pblk[8 * g: 8 * g + 8]
               for g, name in enumerate(_PARAM_ORDER)}
        y = y0_ref[:]
        dt_ = y.dtype
        hi = jax.lax.Precision.HIGHEST
        ll0 = jnp.zeros_like(y[0:2])

        def poisson_all(jc, incs):
            OV = _day_ov(ov_t_ref, ov_b_ref, jc)
            state48 = jnp.concatenate(
                [jnp.log(i) for i in incs] + [-i for i in incs], axis=0)
            return jnp.dot(OV, state48, preferred_element_type=dt_,
                           precision=hi)

        if runup_offset == 0:
            inc0 = jnp.full_like(y[0:8], _EPS)
            ll0 = ll0 + poisson_all(jnp.zeros((), jnp.int32),
                                    (inc0, inc0, inc0))

        def body(t, carry):
            y, ll, comp = carry

            # checkpoints hold the PRE-reset day-start state; the backward
            # recompute applies the same reset, so the stored accumulator rows
            # are never read — but storing pre-reset keeps the chunk-boundary
            # state identical to the carried one (bitwise resume).
            @pl.when(t % L_CHUNK == 0)
            def _save():
                bounds_ref[pl.ds((t // L_CHUNK) * _ROWS, _ROWS), :] = y

            # per-day accumulator reset (f32 noise-floor fix): the day-end
            # block value IS the day's incidence — no cumulative differencing
            y2 = interval(_reset_acc(y),
                          dict(prm,
                               beta=_day_beta(betarun_ref, runmap_ref, t)),
                          M)
            incs = tuple(jnp.maximum(cv, 0.0) + _EPS for cv in _cum_rows(y2))
            j = t + jnp.int32(1 - runup_offset)
            in_obs = jnp.logical_and(j >= 0, j < jnp.int32(T_obs))
            jc = jnp.clip(j, jnp.int32(0), jnp.int32(T_obs - 1))
            term = jnp.where(in_obs, poisson_all(jc, incs), 0.0)
            contrib = term - comp
            ll_new = ll + contrib
            comp = (ll_new - ll) - contrib
            return y2, ll_new, comp

        y, ll, _comp = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_intervals), body,
            (y, ll0, jnp.zeros_like(ll0)))
        ll_ref[:] = ll

    return kernel


def _make_bwd_kernel(n_intervals, T_obs, runup_offset, substeps, tableau,
                     n_chunks):
    # self-contained substep: the transpose is re-derived per SUBSTEP so only
    # one substep's stage states are live at a time (peak-VMEM knob;
    # jax.checkpoint's remat2 primitive has no Mosaic lowering, so the
    # rematerialization is spelled out below)
    substep = make_interval_fn(substeps, tableau, remat=True,
                               rhs=_rhs80)
    prm_names = list(_PARAM_ORDER)

    def kernel(params_ref, betarun_ref, M_ref, ov_t_ref, ov_b_ref,
               bounds_ref, g_ref, runmap_ref,
               dy0_ref, dparams_ref, dbetarun_ref, days_ref):
        from jax.experimental import pallas as pl

        M = M_ref[0:8, 0:8]
        Pblk = params_ref[:]
        prm_vals = tuple(Pblk[8 * g: 8 * g + 8]
                         for g in range(len(prm_names)))
        dt_ = prm_vals[0].dtype
        hi = jax.lax.Precision.HIGHEST
        g_ll = g_ref[:]                                  # (2, Bt) cotangent
        Bt = g_ll.shape[1]

        def substep_fn(y88, prm_tuple, beta8):
            prm = dict(zip(prm_names, prm_tuple))
            prm["beta"] = beta8
            return substep(y88, prm, M)

        def interval_fn(y88, prm_tuple, beta8):
            for _ in range(substeps):
                y88 = substep_fn(y88, prm_tuple, beta8)
            return y88

        def interval_vjp(y_t, prm_tuple, beta8, lam_out):
            """Pull ``lam_out`` back through one daily interval, one substep
            at a time: recompute the substep-boundary states, then transpose
            each substep independently (residuals stay substep-scoped)."""
            subs = [y_t]
            for _ in range(substeps - 1):
                subs.append(substep_fn(subs[-1], prm_tuple, beta8))
            lam = lam_out
            d_prm_tot = tuple(jnp.zeros_like(p) for p in prm_tuple)
            d_beta_tot = jnp.zeros_like(beta8)
            for s in range(substeps - 1, -1, -1):
                _y, pull = jax.vjp(substep_fn, subs[s], prm_tuple, beta8)
                lam, d_prm_s, d_beta_s = pull(lam)
                d_prm_tot = tuple(a + d for a, d in zip(d_prm_tot, d_prm_s))
                d_beta_tot = d_beta_tot + d_beta_s
            return lam, d_prm_tot, d_beta_tot

        def fold_adjoint(jc, incs, masks, active):
            """d(term)/d(cur,prev) given cotangent g_ll; active gates the
            whole contribution (run-up / padded days)."""
            OV = _day_ov(ov_t_ref, ov_b_ref, jc)
            # (48, Bt) = sum_h OV[h, :] * g[h, :] — contract axis 0 of both
            d48 = jax.lax.dot_general(OV, g_ll, (((0,), (0,)), ((), ())),
                                      preferred_element_type=dt_,
                                      precision=hi)
            d_cur = []
            for s in range(3):
                d_inc = d48[8 * s: 8 * s + 8] / incs[s] \
                    - d48[24 + 8 * s: 32 + 8 * s]
                d_inc = jnp.where(masks[s] & active, d_inc, 0.0)
                d_cur.append(d_inc)
            return tuple(d_cur)

        lam = jnp.zeros((_ROWS, Bt), dt_)
        d_prm_acc = tuple(jnp.zeros((8, Bt), dt_) for _ in prm_names)
        dbetarun_ref[:] = jnp.zeros_like(dbetarun_ref)

        for c in range(n_chunks - 1, -1, -1):
            y_start = bounds_ref[_ROWS * c: _ROWS * (c + 1), :]

            # phase 1: recompute the chunk's day states into scratch.
            # Scratch holds PRE-reset day-start states: slot k+1's accumulator
            # blocks then hold day k's raw increments (the incidence source).
            def fwd_body(i, y, c=c):
                t = jnp.int32(c * L_CHUNK) + i
                days_ref[pl.ds(i * _ROWS, _ROWS), :] = y
                valid = t < jnp.int32(n_intervals)
                y2 = interval_fn(_reset_acc(y), prm_vals,
                                 _day_beta(betarun_ref, runmap_ref, t))
                return jnp.where(valid, y2, y)

            y_end = jax.lax.fori_loop(jnp.int32(0), jnp.int32(L_CHUNK),
                                      fwd_body, y_start)
            days_ref[pl.ds(L_CHUNK * _ROWS, _ROWS), :] = y_end

            # phase 2: reverse sweep over the chunk's days
            def bwd_body(i, carry, c=c):
                lam, d_prm_acc = carry
                k = jnp.int32(L_CHUNK - 1) - i
                t = jnp.int32(c * L_CHUNK) + k
                valid = t < jnp.int32(n_intervals)
                y_t = days_ref[pl.ds(k * _ROWS, _ROWS), :]
                y_t1 = days_ref[pl.ds((k + 1) * _ROWS, _ROWS), :]
                r = runmap_ref[t]
                beta8 = betarun_ref[pl.ds(8 * r, 8), :]

                # y_t1's accumulator blocks hold day t's raw increments
                # directly (per-day reset forward) — no prev/diff, and no
                # opposite-sign prev term in the adjoint
                cur = _cum_rows(y_t1)
                incs = tuple(jnp.maximum(cv, 0.0) + _EPS for cv in cur)
                masks = [cv > 0.0 for cv in cur]
                j = t + jnp.int32(1 - runup_offset)
                in_obs = jnp.logical_and(j >= 0, j < jnp.int32(T_obs))
                jc = jnp.clip(j, jnp.int32(0), jnp.int32(T_obs - 1))
                d_cur = fold_adjoint(jc, incs, masks, in_obs & valid)

                lam_aug = lam + _scatter_cum(d_cur)
                lam_prev, d_prm, d_beta = interval_vjp(
                    _reset_acc(y_t), prm_vals, beta8, lam_aug)
                # transpose of the reset projection: the zeroed accumulator
                # rows propagate no cotangent into the previous day
                lam_prev = _reset_acc(lam_prev)
                lam_new = jnp.where(valid, lam_prev, lam)
                d_prm_new = tuple(
                    acc + jnp.where(valid, d, 0.0)
                    for acc, d in zip(d_prm_acc, d_prm))
                # accumulate the (8, Bt) beta adjoint into its RUN's
                # aligned rows (read-modify-write on the output ref); the
                # prep's broadcast VJP sums the sublane copies outside
                cur_db = dbetarun_ref[pl.ds(8 * r, 8), :]
                dbetarun_ref[pl.ds(8 * r, 8), :] = cur_db + jnp.where(
                    valid, d_beta, 0.0)
                return lam_new, d_prm_new

            lam, d_prm_acc = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(L_CHUNK), bwd_body,
                (lam, d_prm_acc))

        dy0_ref[:] = lam
        dparams_ref[:] = jnp.concatenate(d_prm_acc, axis=0)

    return kernel


def _pad_intervals(n_intervals: int) -> int:
    return -(-n_intervals // L_CHUNK)


@functools.partial(jax.jit, static_argnames=("n_intervals", "T_obs",
                                             "runup_offset", "substeps",
                                             "tableau", "block_lanes",
                                             "interpret"))
def _fwd_call(y0_pack, param_pack, betarun_pack, M2, ov_t, ov_b, runmap, *,
              n_intervals, T_obs, runup_offset, substeps, tableau,
              block_lanes, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = y0_pack.dtype
    B2 = y0_pack.shape[1]
    if B2 % block_lanes != 0:
        raise ValueError(f"lane batch {B2} not divisible by block_lanes "
                         f"{block_lanes}")
    n_chunks = _pad_intervals(n_intervals)
    kernel = _make_fwd_kernel(n_intervals, T_obs, runup_offset, substeps,
                              tableau, n_chunks)
    grid = (B2 // block_lanes,)
    tile = lambda rows: pl.BlockSpec((rows, block_lanes), lambda i: (i * 0, i),
                                     memory_space=pltpu.VMEM)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda i: (i * 0, i * 0),
                                    memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ll, bounds = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(_ROWS), tile(N_PARAM_ROWS), tile(betarun_pack.shape[0]),
                  rep(8, 8), rep(T_obs, 48), rep(T_obs, 48), smem],
        out_specs=(tile(2), tile(n_chunks * _ROWS)),
        out_shape=(jax.ShapeDtypeStruct((2, B2), dtype),
                   jax.ShapeDtypeStruct((n_chunks * _ROWS, B2), dtype)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(y0_pack, param_pack, betarun_pack, M2, ov_t, ov_b, runmap)
    return ll, bounds


@functools.partial(jax.jit, static_argnames=("n_intervals", "T_obs",
                                             "runup_offset", "substeps",
                                             "tableau", "block_lanes",
                                             "interpret"))
def _bwd_call(param_pack, betarun_pack, M2, ov_t, ov_b, bounds, g_ll,
              runmap, *,
              n_intervals, T_obs, runup_offset, substeps, tableau,
              block_lanes, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = param_pack.dtype
    B2 = param_pack.shape[1]
    if B2 % block_lanes != 0:
        raise ValueError(f"lane batch {B2} not divisible by block_lanes "
                         f"{block_lanes}")
    n_chunks = _pad_intervals(n_intervals)
    T_pad = n_chunks * L_CHUNK
    kernel = _make_bwd_kernel(n_intervals, T_obs, runup_offset, substeps,
                              tableau, n_chunks)
    grid = (B2 // block_lanes,)
    tile = lambda rows: pl.BlockSpec((rows, block_lanes), lambda i: (i * 0, i),
                                     memory_space=pltpu.VMEM)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda i: (i * 0, i * 0),
                                    memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    dy0, dparams, dbetarun = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile(N_PARAM_ROWS), tile(betarun_pack.shape[0]),
                  rep(8, 8), rep(T_obs, 48), rep(T_obs, 48),
                  tile(n_chunks * _ROWS), tile(2), smem],
        out_specs=(tile(_ROWS), tile(N_PARAM_ROWS),
                   tile(betarun_pack.shape[0])),
        out_shape=(jax.ShapeDtypeStruct((_ROWS, B2), dtype),
                   jax.ShapeDtypeStruct((N_PARAM_ROWS, B2), dtype),
                   jax.ShapeDtypeStruct(betarun_pack.shape, dtype)),
        scratch_shapes=[pltpu.VMEM(((L_CHUNK + 1) * _ROWS, block_lanes), dtype)],
        compiler_params=_compiler_params(bwd_lanes=block_lanes),
        interpret=interpret,
    )(param_pack, betarun_pack, M2, ov_t, ov_b, bounds, g_ll, runmap)
    return dy0, dparams, dbetarun


def make_fused_objective_vjp(M2, ov_tables, runmap, *, n_intervals, T_obs,
                             runup_offset, substeps=4, tableau="dopri5",
                             block_lanes=256, bwd_block_lanes=None,
                             interpret=False):
    """Build ``f(y0_pack, param_pack, betarun_pack) -> ll (2, B2)`` with a
    custom VJP whose forward AND backward are Pallas kernels.

    ``betarun_pack`` is the (8 * n_runs, B2) per-RUN effective-beta table:
    run r at the aligned rows 8r..8r+7 in the [A x4, B x4] sublane layout;
    ``runmap`` the (T_pad,) int32 day->run map (SMEM). M2 and the fused
    observation tables are constants (no cotangents).
    """
    ov_t, ov_b = ov_tables
    if bwd_block_lanes is None:
        bwd_block_lanes = block_lanes
    fwd_kw = dict(n_intervals=n_intervals, T_obs=T_obs,
                  runup_offset=runup_offset, substeps=substeps,
                  tableau=tableau, block_lanes=block_lanes,
                  interpret=interpret)
    bwd_kw = dict(fwd_kw, block_lanes=bwd_block_lanes)

    # The kernels run the R-dropped 80-row state; the public interface stays
    # the full 88-row pack. R occupies rows 56..63 (block 7); its cotangent
    # is identically zero.
    def _to80(y88):
        return jnp.concatenate([y88[:56], y88[64:]], axis=0)

    def _to88(dy80):
        return jnp.concatenate(
            [dy80[:56], jnp.zeros((8,) + dy80.shape[1:], dy80.dtype),
             dy80[56:]], axis=0)

    @jax.custom_vjp
    def f(y0_pack, param_pack, betarun_pack):
        ll, _ = _fwd_call(_to80(y0_pack), param_pack, betarun_pack, M2,
                          ov_t, ov_b, runmap, **fwd_kw)
        return ll

    def f_fwd(y0_pack, param_pack, betarun_pack):
        ll, bounds = _fwd_call(_to80(y0_pack), param_pack, betarun_pack, M2,
                               ov_t, ov_b, runmap, **fwd_kw)
        return ll, (param_pack, betarun_pack, bounds)

    def f_bwd(res, g_ll):
        param_pack, betarun_pack, bounds = res
        dy0, dparams, dbetarun = _bwd_call(param_pack, betarun_pack, M2,
                                           ov_t, ov_b, bounds, g_ll, runmap,
                                           **bwd_kw)
        return _to88(dy0), dparams, dbetarun

    f.defvjp(f_fwd, f_bwd)
    return f


def build_objective_pallas_grad(space, base_params, data, ts, *,
                                base_initial_state=None, substeps: int = 4,
                                tableau: str = "dopri5",
                                constraint_mode="reflect", dtype=None,
                                block_b: int = 2048, bwd_block_b: int = 1024,
                                interpret: bool = False):
    """Batched ``value_and_grad_batch(thetas (B, d)) -> (ll (B,), grad (B, d))``
    backed by the Pallas forward+adjoint kernels — the gradient engine for
    :func:`calibration.mala.run_mala` (pass as ``value_and_grad_batch``) and
    NUTS. Prep (theta scatter, constraint, initial state, schedules) stays in
    differentiable XLA; ``jax.vjp`` chains through it automatically. Also
    usable as a plain batched objective via the returned function's
    ``.value_batch`` attribute.
    """
    from ..calibration.objective import lowest
    from .sepaihrd_pallas import shared_prep

    # grid validation, day tables, M2, initial state, and the sublane
    # packing are the SAME code the plain kernel uses (sepaihrd_pallas.
    # shared_prep) — the custom-VJP forward must pack bit-identically
    pp = shared_prep(space, base_params, data, ts,
                     base_initial_state=base_initial_state,
                     constraint_mode=constraint_mode, dtype=dtype)
    dtype = pp.dtype
    ts = pp.ts
    runup_offset, num_obs = pp.runup_offset, pp.num_obs
    period_runs, n_runs = pp.period_runs, pp.n_runs
    ov_t, ov_b = pp.ov_tables
    M2 = pp.M2
    n_intervals = len(ts) - 1
    n_chunks = _pad_intervals(n_intervals)
    T_pad = n_chunks * L_CHUNK
    # static day -> run map (padded days reuse the last run; values unused)
    day_run = np.zeros((T_pad,), dtype=np.int32)
    for r, (_pb, _pk, start, count) in enumerate(period_runs):
        day_run[start:start + count] = r
    day_run[n_intervals:] = day_run[n_intervals - 1]
    # one engine per effective lane width (small batches pad to fewer lanes
    # than block_b; the kernels' block_lanes must match the padded batch)
    _engines = {}

    def get_fused(lanes):
        if lanes not in _engines:
            _engines[lanes] = make_fused_objective_vjp(
                M2, (ov_t, ov_b), day_run, n_intervals=n_intervals,
                T_obs=num_obs, runup_offset=runup_offset, substeps=substeps,
                tableau=tableau, block_lanes=lanes,
                bwd_block_lanes=(None if bwd_block_b is None
                                 else min(lanes, max(1, bwd_block_b // 2))),
                interpret=interpret)
        return _engines[lanes]

    def ll_from_thetas(thetas):
        B = thetas.shape[0]
        lanes = max(1, min(block_b, B) // 2)
        # Round DOWN to a power of two so callers with many distinct batch
        # sizes (e.g. shrinking ensembles) reuse O(log block_b) compiled
        # engines instead of accumulating one per exact width.
        lanes = 1 << (lanes.bit_length() - 1)
        half = -(-B // 2)
        B2 = -(-half // lanes) * lanes
        pad = 2 * B2 - B
        if pad:
            thetas = jnp.concatenate(
                [thetas,
                 jnp.broadcast_to(thetas[:1], (pad,) + thetas.shape[1:])])
        y0_pack, param_pack, (bdA, bdB), infeasible = \
            pp.pack_halves(thetas, B2)
        # run r at rows 8r..8r+7: [A, A, A, A, B, B, B, B] — the broadcast's
        # VJP sums the four sublane copies of each half automatically
        betarun_pack = jnp.stack(
            [bdA] * 4 + [bdB] * 4, axis=1).reshape(8 * n_runs, B2)

        out = get_fused(lanes)(y0_pack, param_pack,
                               betarun_pack)                 # (2, B2)
        ll = jnp.concatenate([out[0], out[1]])[:B]
        bad = infeasible[:B] | jnp.isnan(ll) | jnp.isinf(ll)
        return jnp.where(bad, lowest(dtype), ll)

    @jax.jit
    def value_and_grad_batch(thetas):
        ll, pull = jax.vjp(ll_from_thetas, thetas)
        # chains are independent, so the pullback of the all-ones cotangent
        # IS the per-chain gradient matrix
        (grad,) = pull(jnp.ones_like(ll))
        return ll, grad

    value_and_grad_batch.value_batch = jax.jit(ll_from_thetas)
    return value_and_grad_batch

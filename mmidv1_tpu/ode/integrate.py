"""Generic explicit RK integration under ``jit``: fixed-grid and adaptive drivers.

TPU-native replacement for the reference's ``Simulator::run`` +
Boost.Odeint ``integrate_times`` stack (``src/sir_age_structured/Simulator.cpp:60-150``,
``src/sir_age_structured/solvers/Dopri5SolverStrategy.cpp:9-37``):

- :func:`integrate_times` reproduces the observable semantics of odeint's
  ``integrate_times`` with a controlled stepper: exact landing on every output time,
  mixed absolute/relative error control with max-norm, step-size adaptation.
  Implemented as ``lax.scan`` over output intervals with a ``lax.while_loop``
  step controller inside — jit- and vmap-safe (vmapped lanes mask their own
  accept/reject decisions).

- :func:`integrate_times_fixed` is the TPU throughput path: a fixed number of
  equal substeps per output interval, fully unrolled stage loops, no data-dependent
  control flow — ideal under ``vmap`` over thousands of parameter vectors and
  reverse-mode differentiable (used by NUTS/`jax.grad`).

- :func:`fold_times` / :func:`fold_times_fixed` are fused variants that apply a
  user reduction at every output point instead of materializing the trajectory
  (used by the Poisson-likelihood objective so an MCMC step never writes a
  trajectory to HBM).

The RHS signature is ``f(t, y) -> dy`` with ``y`` an arbitrary-shape array. All
drivers also accept ``interval_ctx``, a pytree with leading dimension
``len(ts) - 1`` supplying per-output-interval constants; the RHS is then called as
``f(t, y, ctx_k)`` inside interval k. This is how piecewise-constant schedule values
(beta(t), kappa(t)) are frozen per interval: the schedules are constant within each
daily interval (breakpoints align with the grid), so freezing solves the identical
ODE while removing the stage-time discontinuity contamination an RK stage at the
exact breakpoint would otherwise inject (the reference's adaptive odeint stepper
pays for that contamination with step-size crashes at every NPI boundary).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .tableaus import Tableau, get_tableau

MAX_STEPS_PER_INTERVAL = 10_000


def rk_step(f: Callable, t, y, dt, tab: Tableau):
    """One explicit RK step. Returns ``(y_new, err_vec)``.

    ``err_vec`` is the embedded error estimate (zeros when the tableau has none).
    The stage loop unrolls at trace time into one fused XLA computation.
    """
    # NumPy f64 coefficient scalars would promote float32 states to float64
    # under jax_enable_x64; Python floats are weak-typed and preserve dtype.
    ks = []
    for i in range(tab.stages):
        yi = y
        for j in range(i):
            aij = float(tab.a[i, j])
            if aij != 0.0:
                yi = yi + (dt * aij) * ks[j]
        ks.append(f(t + float(tab.c[i]) * dt, yi))

    y_new = y
    for i in range(tab.stages):
        bi = float(tab.b[i])
        if bi != 0.0:
            y_new = y_new + (dt * bi) * ks[i]

    if tab.b_err is None:
        err = jnp.zeros_like(y)
    else:
        err = jnp.zeros_like(y)
        for i in range(tab.stages):
            bei = float(tab.b_err[i])
            if bei != 0.0:
                err = err + (dt * bei) * ks[i]
    return y_new, err


def _error_norm(err, y_old, atol, rtol):
    """Boost.Odeint ``default_error_checker`` with a_x=1, a_dxdt=0: max-norm of
    ``|err_i| / (atol + rtol * |y_i|)``."""
    scale = atol + rtol * jnp.abs(y_old)
    return jnp.max(jnp.abs(err) / scale)


def _advance_interval_adaptive(f, t0, t1, y0, dt0, atol, rtol, tab: Tableau,
                               max_steps: int):
    """Adaptively integrate from t0 to t1, landing exactly on t1.

    Mirrors odeint ``integrate_times``: each attempted step is clamped to the
    remaining interval; the controller's dt memory persists across output points.
    Returns ``(y(t1), dt)``.
    """
    inv_dec = -1.0 / (tab.error_order - 1)
    inv_inc = -1.0 / tab.order

    def cond(carry):
        t, _y, _dt, n = carry
        return (t < t1 - 1e-12 * jnp.maximum(jnp.abs(t1), 1.0)) & (n < max_steps)

    def body(carry):
        t, y, dt, n = carry
        dt_try = jnp.minimum(dt, t1 - t)
        y_new, err = rk_step(f, t, y, dt_try, tab)
        err_norm = _error_norm(err, y, atol, rtol)
        # Guard NaN/Inf states: treat as rejected with maximal shrink.
        bad = ~jnp.isfinite(err_norm)
        err_norm = jnp.where(bad, jnp.asarray(1e10, err_norm.dtype), err_norm)
        accept = err_norm <= 1.0

        # Step-size update (boost default_step_adjuster semantics):
        # reject: dt *= max(0.9*err^(-1/(eo-1)), 0.2)
        # accept with err < 0.5: dt *= 0.9*max(err, 5^-order)^(-1/order)  (growth <= ~4.5x)
        dt_dec = dt_try * jnp.maximum(0.9 * err_norm ** inv_dec, 0.2)
        err_floored = jnp.maximum(err_norm, 5.0 ** (-float(tab.order)))
        dt_inc = jnp.where(err_norm < 0.5, dt_try * 0.9 * err_floored ** inv_inc, dt_try)

        t_next = jnp.where(accept, t + dt_try, t)
        y_next = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), y_new, y)
        # boost integrate_times restores the controller's dt memory after a
        # landing step clamped to the output point: on success
        # dt = max_abs(dt, current_dt) — without this the remembered step
        # collapses to the output spacing at EVERY interval boundary and
        # must regrow at <=4.5x per step
        dt_next = jnp.where(accept, jnp.maximum(dt, dt_inc), dt_dec)
        return t_next, y_next, dt_next, n + 1

    t_f, y_f, dt_f, _n = jax.lax.while_loop(cond, body, (t0, y0, dt0, jnp.asarray(0)))
    # max_steps exhausted without landing on t1 (boost throws here): poison
    # the state with NaN so downstream likelihoods see an explicit failure
    # instead of a plausible-looking stale trajectory
    landed = t_f >= t1 - 1e-12 * jnp.maximum(jnp.abs(t1), 1.0)
    y_f = jax.tree_util.tree_map(
        lambda a: jnp.where(landed, a, jnp.full_like(a, jnp.nan)), y_f)
    return y_f, dt_f


def _bind(f, ctx):
    """Bind a per-interval context into the RHS (identity when ctx is None)."""
    if ctx is None:
        return f
    return lambda t, y: f(t, y, ctx)


def integrate_times(f, y0, ts, *, dt0=1.0, atol=1e-6, rtol=1e-6, method="dopri5",
                    max_steps=MAX_STEPS_PER_INTERVAL, interval_ctx=None):
    """Adaptive integration with output at every element of ``ts``.

    Returns an array of shape ``(len(ts),) + y0.shape`` with ``out[0] == y0``.
    """
    tab = get_tableau(method)
    if tab.b_err is None:
        raise ValueError(
            f"tableau '{method}' has no embedded error estimate; the "
            "adaptive controller would accept every step and grow dt "
            "unboundedly — use it on the fixed-grid path instead")
    ts = jnp.asarray(ts)
    dtype = jnp.result_type(y0)
    dt0 = jnp.asarray(dt0, dtype=dtype)
    atol = jnp.asarray(atol, dtype=dtype)
    rtol = jnp.asarray(rtol, dtype=dtype)

    def scan_fn(carry, x):
        t_pair, ctx = x
        y, dt = carry
        t_a, t_b = t_pair
        y_new, dt_new = _advance_interval_adaptive(_bind(f, ctx), t_a, t_b, y, dt,
                                                   atol, rtol, tab, max_steps)
        return (y_new, dt_new), y_new

    (_, _), traj = jax.lax.scan(scan_fn, (y0, dt0), ((ts[:-1], ts[1:]), interval_ctx))
    return jnp.concatenate([y0[None], traj], axis=0)


def _rk_step_fsal(f, t, y, dt, tab: Tableau, k_first):
    """One step of an FSAL tableau reusing the previous step's last stage.

    Returns ``(y_new, k_last)`` where ``k_last = f(t+dt, y_new)`` seeds the
    next step — 6 fresh RHS evaluations per Dopri5 step instead of 7."""
    ks = [k_first]
    for i in range(1, tab.stages):
        yi = y
        for j in range(i):
            aij = float(tab.a[i, j])
            if aij != 0.0:
                yi = yi + (dt * aij) * ks[j]
        ks.append(f(t + float(tab.c[i]) * dt, yi))
    y_new = y
    for i in range(tab.stages):
        bi = float(tab.b[i])
        if bi != 0.0:
            y_new = y_new + (dt * bi) * ks[i]
    return y_new, ks[-1]


def _advance_interval_fixed(f, t0, t1, y, substeps: int, tab: Tableau):
    """``substeps`` equal RK steps from t0 to t1, as a ``lax.scan`` over the
    substep index. Rolled (not unrolled) deliberately: the substep loop sits
    inside the outer per-interval scan, so unrolling multiplies the traced
    body by ``substeps`` for zero runtime gain (measured on TPU v5e at
    B=8192, cash_karp@3: identical steady-state throughput, but the unrolled
    body costs 559 s of lowering against 0.4 s rolled — the whole 515 s
    "compile" stall of BENCH_r01). FSAL tableaus chain the last stage across
    substeps via the scan carry (the RHS changes only at interval boundaries
    through ``interval_ctx``, so the chain is exact within an interval)."""
    h = (t1 - t0) / substeps
    if substeps == 1:
        y_new, _ = rk_step(f, t0, y, h, tab)
        return y_new
    offs = jnp.arange(substeps).astype(h.dtype) * h

    if tab.fsal:
        def body_fsal(carry, dt_off):
            y, k = carry
            y_new, k_new = _rk_step_fsal(f, t0 + dt_off, y, h, tab, k)
            return (y_new, k_new), None

        (y, _), _ = jax.lax.scan(body_fsal, (y, f(t0, y)), offs)
        return y

    def body(y, dt_off):
        y_new, _ = rk_step(f, t0 + dt_off, y, h, tab)
        return y_new, None

    y, _ = jax.lax.scan(body, y, offs)
    return y


def _rk_increment(f, t, y, dt, tab: Tableau):
    """The step INCREMENT ``sum_i (dt*b_i) k_i`` without adding it to ``y``.

    Stage states still build on plain ``y`` (their O(eps_f32 * |y|)
    perturbation only enters through the RHS, where it is harmless); keeping
    the b-weighted combination separate is what lets the caller accumulate
    it in compensated arithmetic."""
    ks = []
    for i in range(tab.stages):
        yi = y
        for j in range(i):
            aij = float(tab.a[i, j])
            if aij != 0.0:
                yi = yi + (dt * aij) * ks[j]
        ks.append(f(t + float(tab.c[i]) * dt, yi))
    inc = jnp.zeros_like(y)
    for i in range(tab.stages):
        bi = float(tab.b[i])
        if bi != 0.0:
            inc = inc + (dt * bi) * ks[i]
    return inc


def _advance_interval_fixed_comp(f, t0, t1, y, c, substeps: int,
                                 tab: Tableau):
    """Kahan-compensated fixed advance: carries a compensation array ``c``
    alongside ``y`` so the state accumulation over thousands of substeps is
    effectively float64-quality in float32 storage.

    Why: the Poisson objective differences CUMULATIVE state rows day by day
    (``CumH``/``CumICU``/``D`` reach ~1e5-1e6 while daily increments are
    ~1e2-1e4), so the plain running sum's O(eps_f32 * |y|) per-step roundoff
    becomes the objective's ~0.1-nat evaluation noise floor — the direct
    cap on HMC acceptance (OPS_ANALYSIS.md "step-size death spiral"). The
    compensated sum reduces the ACCUMULATION error to O(eps_f32 * |inc|)
    per step; the residual noise is then the RHS evaluations' own roundoff.
    Cost: 3 extra elementwise ops per substep against 6-7 RHS evaluations
    (<2% on the measured TPU profile). XLA does not re-associate floats, so
    the compensation survives jit.
    """
    h = (t1 - t0) / substeps
    offs = jnp.arange(substeps).astype(h.dtype) * h

    def body(carry, dt_off):
        y, c = carry
        inc = _rk_increment(f, t0 + dt_off, y, h, tab)
        t = inc - c
        y_new = y + t
        c_new = (y_new - y) - t
        return (y_new, c_new), None

    (y, c), _ = jax.lax.scan(body, (y, c), offs)
    return y, c


def integrate_times_fixed(f, y0, ts, *, substeps=4, method="dopri5",
                          interval_ctx=None):
    """Fixed-grid integration: ``substeps`` equal RK steps per output interval.

    Fully static control flow -> maximal vmap/scan fusion on TPU and
    reverse-mode differentiable. ``out[0] == y0``.
    """
    tab = get_tableau(method)
    ts = jnp.asarray(ts)

    def scan_fn(y, x):
        t_pair, ctx = x
        t_a, t_b = t_pair
        y_new = _advance_interval_fixed(_bind(f, ctx), t_a, t_b, y, substeps, tab)
        return y_new, y_new

    _, traj = jax.lax.scan(scan_fn, y0, ((ts[:-1], ts[1:]), interval_ctx))
    return jnp.concatenate([y0[None], traj], axis=0)


def fold_times_fixed(f, y0, ts, fold, init, *, substeps=4, method="dopri5",
                     interval_ctx=None, compensated=False, pre_interval=None):
    """Like :func:`integrate_times_fixed` but folds instead of stacking.

    ``fold(acc, i, y_i) -> acc`` is called for every output index i (including 0
    with ``y0``). Returns the final accumulator only — nothing trajectory-sized
    ever hits HBM. This is the fusion the C++ code approximates with its
    simulation cache + thread-local matrices (``SEPAIHRDObjectiveFunction.cpp``).

    ``pre_interval(y) -> y`` (optional) is applied to the carried state at the
    START of every output interval, before integrating across it. Intended for
    linear projections — e.g. zeroing pure-accumulator rows so they hold the
    per-interval increment instead of a running cumulative (the float32
    noise-floor fix of the Poisson objective: a day's incidence then carries
    roundoff relative to the DAY increment, not the ~1e6 cumulative). In the
    compensated path the same projection is applied to the compensation array
    (correct only for projections, which is why the hook is documented as such).

    ``compensated=True`` carries a Kahan compensation array across the WHOLE
    grid (:func:`_advance_interval_fixed_comp`), cutting the float32 state-
    accumulation roundoff that otherwise dominates the objective's noise
    floor. Non-FSAL path only (the compensated variant re-evaluates the
    first stage each substep; production tableaus at substeps=4 measure
    identical throughput).
    """
    tab = get_tableau(method)
    ts = jnp.asarray(ts)
    acc0 = fold(init, 0, y0)
    pre = (lambda y: y) if pre_interval is None else pre_interval

    if compensated:
        def scan_fn_c(carry, x):
            y, c, acc = carry
            i, t_a, t_b, ctx = x
            y_new, c_new = _advance_interval_fixed_comp(
                _bind(f, ctx), t_a, t_b, pre(y), pre(c), substeps, tab)
            acc = fold(acc, i, y_new)
            return (y_new, c_new, acc), None

        idx = jnp.arange(1, ts.shape[0])
        (y_f, _c, acc), _ = jax.lax.scan(
            scan_fn_c, (y0, jnp.zeros_like(y0), acc0),
            (idx, ts[:-1], ts[1:], interval_ctx))
        return acc, y_f

    def scan_fn(carry, x):
        y, acc = carry
        i, t_a, t_b, ctx = x
        y_new = _advance_interval_fixed(_bind(f, ctx), t_a, t_b, pre(y),
                                        substeps, tab)
        acc = fold(acc, i, y_new)
        return (y_new, acc), None

    idx = jnp.arange(1, ts.shape[0])
    (y_f, acc), _ = jax.lax.scan(scan_fn, (y0, acc0),
                                 (idx, ts[:-1], ts[1:], interval_ctx))
    return acc, y_f


def fold_times(f, y0, ts, fold, init, *, dt0=1.0, atol=1e-6, rtol=1e-6,
               method="dopri5", max_steps=MAX_STEPS_PER_INTERVAL,
               interval_ctx=None):
    """Adaptive-stepping variant of :func:`fold_times_fixed`."""
    tab = get_tableau(method)
    if tab.b_err is None:
        raise ValueError(
            f"tableau '{method}' has no embedded error estimate; the "
            "adaptive controller would accept every step and grow dt "
            "unboundedly — use it on the fixed-grid path instead")
    ts = jnp.asarray(ts)
    dtype = jnp.result_type(y0)
    dt0 = jnp.asarray(dt0, dtype=dtype)
    atol = jnp.asarray(atol, dtype=dtype)
    rtol = jnp.asarray(rtol, dtype=dtype)
    acc0 = fold(init, 0, y0)

    def scan_fn(carry, x):
        y, dt, acc = carry
        i, t_a, t_b, ctx = x
        y_new, dt_new = _advance_interval_adaptive(_bind(f, ctx), t_a, t_b, y, dt,
                                                   atol, rtol, tab, max_steps)
        acc = fold(acc, i, y_new)
        return (y_new, dt_new, acc), None

    idx = jnp.arange(1, ts.shape[0])
    (y_f, _dt, acc), _ = jax.lax.scan(scan_fn, (y0, dt0, acc0),
                                      (idx, ts[:-1], ts[1:], interval_ctx))
    return acc, y_f

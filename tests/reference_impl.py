"""Independent pure-NumPy/SciPy implementation of the SEPAIHRD dynamics.

Used as the parity golden for the JAX framework. The C++ reference
(`/root/reference`) cannot be built in this environment (no Eigen/Boost/GSL), so
this module re-derives the exact same equations from the reference's documented
model (``Readme.md:134-177``, ``src/model/AgeSEPAIHRDModel.cpp:101-228``) in plain
NumPy and integrates them with SciPy's DOP853 at tight tolerances. Agreement
between this implementation and the JAX one (written independently against the
same spec) at rtol <= 1e-6 is the trajectory-parity evidence required by
BASELINE.md.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp


def piecewise(t, end_times, values):
    end_times = np.asarray(end_times)
    values = np.asarray(values)
    if values.size == 0:
        raise ValueError("empty schedule")
    idx = int(np.searchsorted(end_times, t, side="left"))
    return values[min(idx, values.size - 1)]


def sepaihrd_rhs_np(t, y_flat, prm):
    """prm: dict with numpy entries mirroring SEPAIHRDParams."""
    A = prm["N"].size
    y = y_flat.reshape(11, A)
    S, E, P, Aa, I, H, ICU = y[0], y[1], y[2], y[3], y[4], y[5], y[6]

    inv_N = np.where(prm["N"] > 1e-9, 1.0 / prm["N"], 0.0)
    pi = (P + Aa + prm["theta"] * I) * prm["h_infec"] * inv_N
    lam = prm["M"] @ pi
    beta = (piecewise(t, prm["beta_end_times"], prm["beta_values"])
            if len(prm.get("beta_values", [])) else prm["beta"])
    kappa = (piecewise(t, prm["kappa_end_times"], prm["kappa_values"])
             if len(prm.get("kappa_values", [])) else 1.0)
    lam = np.maximum(beta * kappa * prm["a"] * lam, 0.0)

    flow_SE = lam * S
    flow_EP = prm["sigma"] * E
    flow_P_out = prm["gamma_p"] * P
    flow_PA = prm["p"] * flow_P_out
    flow_PI = flow_P_out - flow_PA
    flow_IH = prm["h"] * I
    flow_IR = prm["gamma_I"] * I
    flow_ID = prm["d_community"] * I
    flow_H_ICU = prm["icu"] * H

    d = np.empty_like(y)
    d[0] = -flow_SE
    d[1] = flow_SE - flow_EP
    d[2] = flow_EP - flow_P_out
    d[3] = flow_PA - prm["gamma_A"] * Aa
    d[4] = flow_PI - (flow_IR + flow_IH + flow_ID)
    d[5] = flow_IH - (prm["gamma_H"] * H + prm["d_H"] * H + flow_H_ICU)
    d[6] = flow_H_ICU - (prm["gamma_ICU"] + prm["d_ICU"]) * ICU
    d[7] = prm["gamma_A"] * Aa + flow_IR + prm["gamma_H"] * H + prm["gamma_ICU"] * ICU
    d[8] = prm["d_H"] * H + prm["d_ICU"] * ICU + flow_ID
    d[9] = flow_IH
    d[10] = flow_H_ICU
    return d.ravel()


def solve_golden(prm, y0, ts, rtol=1e-11, atol=1e-11):
    """High-accuracy golden trajectory, shape (len(ts), 11, A)."""
    y0 = np.asarray(y0, dtype=np.float64)
    A = prm["N"].size
    sol = solve_ivp(sepaihrd_rhs_np, (float(ts[0]), float(ts[-1])), y0.ravel(),
                    t_eval=np.asarray(ts, dtype=np.float64), method="DOP853",
                    rtol=rtol, atol=atol, args=(prm,))
    assert sol.success, sol.message
    return sol.y.T.reshape(len(ts), 11, A)


def spain_like_prm():
    """Spain-2020 parameter set (values from data/configuration/initial_guess.txt
    of the reference) as a plain-NumPy dict."""
    return dict(
        N=np.array([14075720., 20948387., 9032069., 2880884.]),
        M=np.array([
            [1.61250020311295, 1.65748762158849, 0.374692837250512, 0.130639200425682],
            [1.07829784768215, 1.60921910170542, 0.591647250525647, 0.199930805131802],
            [0.544186523616222, 1.32082961380519, 0.841103871959205, 0.19917741244234],
            [0.607128345752671, 1.42823037891329, 0.637345157863931, 0.210901821412705],
        ]),
        beta=0.462524776,
        beta_end_times=np.array([13., 63., 84., 111., 183., 237., 305.]),
        beta_values=np.array([4.62524776e-01, 2.95999272e-01, 9.24875113e-02,
                              5.92179890e-01, 2.59946418e-01, 7.03679284e-01,
                              5.70839916e-01]),
        kappa_end_times=np.array([13., 63., 84., 111., 183., 237., 305.]),
        kappa_values=np.array([1.0, 0.2, 3.91774139e-01, 2.18155752e-01,
                               6.27138468e-01, 0.2, 2.07646978e-01]),
        a=np.array([5.12364660e-01, 8.84853325e-01, 8.18661005e-01, 1.26965912e+00]),
        h_infec=np.array([0.8, 8.17481058e-01, 8.10044139e-01, 9.52861707e-01]),
        theta=0.2,
        sigma=0.3, gamma_p=0.5, gamma_A=0.25, gamma_I=2.44011691e-01,
        gamma_H=0.2, gamma_ICU=0.1,
        p=np.array([0.6, 0.3, 1.14831498e-01, 0.01]),
        h=np.array([0.01, 3.86022462e-02, 0.22, 0.30]),
        icu=np.array([2.19928041e-02, 0.02, 0.04, 1.20928919e-02]),
        d_H=np.array([0.0, 0.0, 0.1, 0.4]),
        d_ICU=np.array([1.13455929e-02, 0.05, 0.2, 0.4]),
        d_community=np.array([7.74166081e-05, 0.0, 0.0, 0.0]),
        seed_exposed=50.0,
        runup_days=2.05541965e+01,
    )


def seeded_initial_state(prm):
    N = prm["N"]
    age_frac = N / N.sum()
    y0 = np.zeros((11, N.size))
    y0[1] = prm["seed_exposed"] * age_frac
    y0[0] = N - y0[1]
    return y0

"""Test configuration: CPU backend with 8 virtual devices + float64.

The multi-chip sharding tests (tests/test_parallel.py) run on a virtual
8-device CPU mesh (``xla_force_host_platform_device_count``), mirroring how
the driver dry-runs the multi-chip path (__graft_entry__.dryrun_multichip).
Numerical parity tests need float64 (the C++ reference is all double
precision); production TPU runs use float32 via the same dtype-agnostic code
paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon sitecustomize registers the TPU backend at interpreter startup,
# before this conftest can set JAX_PLATFORMS — force CPU via the config API
# (which wins after import). Tests run on 8 virtual CPU devices; only bench.py
# and the calibration scripts target the real TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles of the scan-heavy solvers dominate
# test wall-time on this 1-core host; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def spain_params():
    """Spain-2020 SEPAIHRDParams built from the calibrated initial_guess values."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_impl import spain_like_prm
    from mmidv1_tpu import make_params

    prm = spain_like_prm()
    params = make_params(
        N=prm["N"], M_baseline=prm["M"], beta=prm["beta"],
        beta_end_times=prm["beta_end_times"], beta_values=prm["beta_values"],
        kappa_end_times=prm["kappa_end_times"], kappa_values=prm["kappa_values"],
        a=prm["a"], p=prm["p"], h=prm["h"], icu=prm["icu"],
        d_H=prm["d_H"], d_ICU=prm["d_ICU"], h_infec=prm["h_infec"],
        theta=prm["theta"], sigma=prm["sigma"], gamma_p=prm["gamma_p"],
        gamma_A=prm["gamma_A"], gamma_I=prm["gamma_I"], gamma_H=prm["gamma_H"],
        gamma_ICU=prm["gamma_ICU"], d_community=prm["d_community"],
        seed_exposed=prm["seed_exposed"], runup_days=prm["runup_days"],
    )
    return prm, params

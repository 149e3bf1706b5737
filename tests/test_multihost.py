"""Two-process jax.distributed test for the multihost initialization path.

The only §5.8 surface with no coverage elsewhere: spawn two CPU processes on
localhost, `multihost.initialize(coordinator, 2, pid)` in each, build a GLOBAL
mesh spanning both processes' devices, and run a tiny `run_mh_sharded`
ensemble across it. Process 0 also runs the unsharded ensemble locally and
asserts exact parity (chain RNG is shard-invariant), mirroring the
single-process parity tests in tests/test_parallel.py.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
pid = int(sys.argv[1])
coord = sys.argv[2]

import jax
jax.config.update("jax_platforms", "cpu")        # sitecustomize pins the TPU
jax.config.update("jax_num_cpu_devices", 2)      # 2 local -> 4 global devices
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "@@REPO@@")
from mmidv1_tpu.parallel import multihost

ok = multihost.initialize(coordinator_address=coord, num_processes=2,
                          process_id=pid)
assert ok, "expected a multi-process runtime"
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()
assert multihost.is_primary() == (pid == 0)

import jax.numpy as jnp
import numpy as np
from mmidv1_tpu.calibration.mh import MHConfig, run_mh
from mmidv1_tpu.calibration.param_space import ParameterSpace
from mmidv1_tpu.params import make_params
from mmidv1_tpu.parallel import ensemble_mesh, run_mh_sharded

mu = jnp.asarray([0.3, -0.2, 0.5])
def loglik(theta):
    return -0.5 * jnp.sum((theta - mu) ** 2)

template = make_params(N=[1e6] * 4, M_baseline=np.ones((4, 4)))
names = ["beta", "theta", "sigma"]
space = ParameterSpace.create(names, {n: (-5.0, 5.0) for n in names},
                              {n: 0.3 for n in names}, template)
cfg = MHConfig(iterations=20, burn_in=5, adaptation_period=10, thinning=4)
key = jax.random.PRNGKey(7)

mesh = ensemble_mesh()                            # spans BOTH processes
assert mesh.devices.size == 4
res = run_mh_sharded(loglik, space, jnp.zeros(3), key, cfg, n_chains=8,
                     mesh=mesh)
best = float(res.best_logp)                       # replicated scalar

if pid == 0:
    ref = run_mh(loglik, space, jnp.zeros(3), key, cfg, n_chains=8)
    np.testing.assert_allclose(best, float(ref.best_logp), rtol=1e-12)
    print(f"MULTIHOST_PARITY_OK best={best:.12e}", flush=True)
else:
    print("MULTIHOST_WORKER_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_mh():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    code = _CHILD.replace("@@REPO@@", REPO)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(pid), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"child failed (rc={rc}):\n{err[-3000:]}"
    assert "MULTIHOST_PARITY_OK" in outs[0][1], outs[0][1]
    assert "MULTIHOST_WORKER_OK" in outs[1][1], outs[1][1]

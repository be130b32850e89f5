"""Real 2-process ``jax.distributed`` exercise of the distributed BA.

All other distributed tests run single-process on virtual devices; this
one spawns two coordinator/worker processes on localhost (4 virtual CPU
devices each -> one global 8-device mesh) and runs the observation-sharded
mapping BA through the REAL ``jax.distributed.initialize`` path
(parallel/multihost.py:28-45), asserting identical iterates to the
single-process backend.  The reference has no distributed anything
(SURVEY.md §2.7); this validates the introduced scaling axis end-to-end.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    # the axon sitecustomize registers a remote-TPU PJRT plugin at
    # interpreter start, which initializes the XLA backend BEFORE the
    # worker can call jax.distributed.initialize; strip its trigger and
    # pin the env to CPU for the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.environ.get("PYTHONPATH", ""),
                    os.path.dirname(HERE)] if p)

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "_mp_dist_worker.py"),
         coord, "2", str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(logs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
        assert f"WORKER_OK {i}" in logs[i]

    w0, w1 = np.load(outs[0]), np.load(outs[1])
    # replicated outputs agree bit-for-bit across processes
    np.testing.assert_array_equal(w0["est_d"], w1["est_d"])
    np.testing.assert_array_equal(w0["chi2_d"], w1["chi2_d"])
    # distributed iterates match the single-process backend
    assert np.allclose(w0["est_d"][0], w0["est_s"][0], atol=1e-3), \
        np.abs(w0["est_d"][0] - w0["est_s"][0]).max()
    assert np.allclose(w0["est_d"][0][:3], w0["gt"][:3], atol=0.02)

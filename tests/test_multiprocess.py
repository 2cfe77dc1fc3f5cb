"""Multi-PROCESS training semantics (simulated DCN).

The reference trains DDP over NCCL across processes
(run_nerf_batch.py:26-28,344-348).  The in-process CPU-mesh tests cover
the collective MATH; this test covers the process topology: two OS
processes (Gloo backend, 4 virtual CPU devices each) form one global
(data=2, ray=4) mesh whose data axis crosses the process boundary, run
one batched train step, and each asserts the cross-process loss equals
the single-device loss on the identical batch (tests/mp_worker.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_train_step_parity():
    port = _free_port()
    # strip the tunneled-TPU plumbing too: PALLAS_AXON_* makes the
    # sitecustomize register the axon PJRT plugin at interpreter start,
    # and a wedged tunnel then hangs the workers before they ever set
    # JAX_PLATFORMS=cpu — this test must never depend on device state
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        and not k.startswith("PALLAS_AXON")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/mp_worker.py", str(i), str(port)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=560)[0] for p in procs]
    except subprocess.TimeoutExpired:
        # never leak CPU-burning workers into later tests
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        raise AssertionError(
            "worker timeout; partial output:\n"
            + "\n---\n".join(o[-2000:] for o in outs)
        )
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        ok_lines = [l for l in out.splitlines() if l.startswith("MP_OK")]
        assert p.returncode == 0 and ok_lines, (
            f"worker {i} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        losses.append(float(ok_lines[-1].split()[1]))
    # both ranks see the identical pmean'd loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

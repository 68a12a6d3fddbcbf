"""Two-process multi-host smoke (VERDICT r2 item 9).

Spawns scripts/multihost_cpu_smoke.py twice: jax.distributed.initialize
over gloo, an 8-device global mesh split 4+4 across the processes,
jax.make_array_from_process_local_data batch assembly, and ONE sharded
train step.  The reference equivalent is train.sh's OMPI multi-node
launch (train.sh:1-12,36).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_train_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["SMOKE_PORT"] = "12617"
    env.pop("XLA_FLAGS", None)  # script sets its own device count
    script = os.path.join(root, "scripts/multihost_cpu_smoke.py")
    p1 = subprocess.Popen(
        [sys.executable, script, "1"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        p0 = subprocess.run(
            [sys.executable, script, "0"], env=env,
            capture_output=True, text=True, timeout=540,
        )
        assert "MULTIHOST_OK" in p0.stdout, (
            p0.stdout[-2000:], p0.stderr[-2000:]
        )
    finally:
        try:
            p1.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p1.kill()

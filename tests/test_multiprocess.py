"""True multi-process distributed smoke as a CI test.

Spawns 2 fresh JAX processes (4 virtual CPU devices each) that
jax.distributed.initialize into one 8-device platform and run collective
+ train-step checks (see tools/multiprocess_smoke.py). This is the
real-runtime counterpart of the mocked multi-host layout tests — it
caught shard_batch's global-vs-local divisibility bug.
"""

import os
import subprocess
import sys


def test_two_process_distributed_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["MPSMOKE_PORT"] = "38583"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "multiprocess_smoke.py")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIPROCESS SMOKE OK" in out.stdout

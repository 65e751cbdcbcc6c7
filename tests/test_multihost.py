"""Multi-host (DCN) rehearsal: the jax.distributed wrapper must
initialize, shard, and all-reduce across REAL process boundaries.

Runs scripts/multihost_rehearsal.py as a subprocess driver: 2 CPU
processes x 4 virtual devices, a (data=2, tile=4) global mesh whose
'data' axis spans the two processes, two DP train steps, and a loss
comparison against the single-process ground truth. This is the one
subsystem (SURVEY.md §5.8) virtual single-process meshes cannot cover —
`jax.distributed.initialize` + cross-process collectives only exist
multi-process.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_two_process_dp_step_matches_single_process():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = ""          # axon sitecustomize off in children
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "multihost_rehearsal.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.rsplit("RESULT ", 1)[1])
    assert result["match"] is True
    assert result["processes"] == 2
    assert abs(result["multihost_loss"]
               - result["single_process_loss"]) < 1e-6

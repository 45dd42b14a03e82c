"""Multi-process (multi-host shaped) distributed BA smoke test.

Spawns `benchmarks/multihost.py` in parent mode: 2 processes x 4 virtual CPU
devices each, jax.distributed over localhost, landmark-sharded global BA on
the 8-device global mesh. Validates the REAL multi-host code path
(`parallel/distributed.initialize` + host-major `global_mesh` +
`sharded_ba.distributed_bundle_adjust`) — the capability the reference never
had (SURVEY.md §5.8).
"""

import json
import os
import subprocess
import sys


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_ba():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device counts
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "benchmarks", "multihost.py"),
            "--num-processes", "2",
            "--frames", "8",
            "--points", "1024",
            "--obs-per-frame", "256",
            "--iters", "4",
            "--solvers", "cg",
            "--port", "12931",
            "--timeout", "420",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        env=env,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    payload = json.loads(out.stdout[out.stdout.index("{"):])
    assert payload["ok"]
    reports = payload["reports"]
    assert len(reports) == 2
    for r in reports:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["multi"] is True
        assert r["cg"]["chi2_final"] < r["cg"]["chi2_initial"]

"""Every registry query must run under a VANILLA default SparkSession.

The driver harness does ``SparkSession.builder.getOrCreate()`` with none of
our tuned confs — in round 1 that made parquet ``ts`` TIMESTAMP_NTZ and 10
queries died at analysis. The in-process pytest session is the tuned one, so
this test runs the check in a subprocess with a bare session (see
``vanilla_session_check.py``).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(__file__)


def test_registry_under_vanilla_session():
    # sf0.01 = the driver's correctness-gate scale (VERDICT r1 item 10)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "vanilla_session_check.py"),
            "/root/testdata/sf0.01",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"vanilla-session registry check failed:\n{out[-4000:]}"
    assert "0 failures" in proc.stdout, out[-4000:]

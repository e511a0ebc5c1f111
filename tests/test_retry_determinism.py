"""Pytest guard for the task-retry determinism axis (tools/retry_sweep.py).

The full-corpus retry sweep is a committed round log
(docs/SWEEP_retry_r8.log, 234/234); this test keeps the axis alive in CI
at smoke scale: a handful of order/fold-sensitive operators re-proven
against the DuckDB oracle with every scan stage's partition-0 task
failing its first attempt under local[N,4]. A subprocess because the
retry-capable master and the fault-injected catalog must not leak into
the shared test session.
"""

from __future__ import annotations

import os
import subprocess
import sys

QUERIES = ("window_running", "feature_quantile_bucket", "ts_ewma")


def test_retry_sweep_smoke():
    r = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/retry_sweep.py",
            "/root/testdata/sf0.001",
            *QUERIES,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert f"{len(QUERIES)}/{len(QUERIES)} queries pass" in r.stdout, (
        r.stdout[-1500:],
        r.stderr[-1500:],
    )
    # the injection must actually have fired (retries happened)
    assert "injected first-attempt task failure" in (r.stdout + r.stderr)

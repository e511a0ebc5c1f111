"""Pytest guard for the mixed-NULL composed-fixture axis (verdict r8 #5).

The full-corpus mixednull sweep is a committed round log
(docs/COMPOSED_mixednull_r8.log, 234/234 — the fixture that found 16 real
NULL-placement divergences in round 8); this test keeps the axis alive in
CI at smoke scale: the 20 most NULL-order-sensitive operators (every
window family, the ordered timeseries folds, the three r8 bug sites
scalar_null / win_session / dedup_cross_source_matrix, rank-based stats,
as-of ordering, global sorts) re-proven against the DuckDB oracle on the
mixednull fixture, where every non-key column is NULL on a deterministic
~30% of rows on per-column-independent subsets. This is the regime that
catches a new ordered operator using bare ``.asc()`` on a nullable key:
Spark ASC is NULLS FIRST, the oracles' ORDER BY is NULLS LAST (the pinned
engine contract), and only MIXED null columns expose the divergence.

The fixture is regenerated from the read-only sf0.001 source when absent
(tools/make_composed.py is a deterministic DuckDB transform, ~seconds). A
subprocess keeps selfcheck's own session/catalog out of the shared test
session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, ".scale", "composed", "mixednull")

QUERIES = (
    # window family: frame/rank/dist ordering over nullable keys
    "window_rank",
    "window_running",
    "window_first_last",
    "window_range_frame",
    "window_cume_dist",
    "window_ntile",
    "window_rolling_median",
    # ordered struct folds (the _ts_key NULLS-LAST contract)
    "ts_ewma",
    "events_sequence_detect",
    "events_top_paths",
    # the three bug sites the mixednull fixture caught in round 8
    "scalar_null",
    "win_session",
    "dedup_cross_source_matrix",
    # distributed prefix-sum deciles over mixed-NULL measures (r7 advice bug)
    "feature_quantile_bucket",
    # rank statistics, as-of ordering, global sorts, NULL group keys
    "stats_mannwhitney",
    "asof_nearest",
    "curriculum_order",
    "sort_global",
    "sort_topk",
    "agg_group",
)


def test_mixednull_gate():
    if not os.path.isdir(FIXTURE):
        gen = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_composed.py")],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert gen.returncode == 0, (gen.stdout[-1000:], gen.stderr[-1000:])
        assert os.path.isdir(FIXTURE), "make_composed.py did not produce mixednull"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "selfcheck.py"),
            FIXTURE,
            *QUERIES,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert f"{len(QUERIES)}/{len(QUERIES)} queries pass" in r.stdout, (
        r.stdout[-2000:],
        r.stderr[-1500:],
    )

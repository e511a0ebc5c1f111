"""Pin the --spark-mat lane's safety claim (tools/shard_check.py, r12).

The lane materializes the engine output once, partitioned by shard
assignment, and each shard child digests its partition. Its docstring
claims a mis-partitioned write CANNOT pass silently: a row in the wrong
partition satisfies neither shard's (partition AND exact-predicate)
filter pair, so it vanishes from every shard — failing its own shard's
digest against the oracle and the parent's coverage sum. These tests
run the real parent end-to-end at sf0.001: once on a clean mat (green +
coverage line) and once on a mat with one row's __shard deliberately
corrupted (must exit nonzero and report the mismatch/coverage gap).
"""

from __future__ import annotations

import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"
REPO = "/root/repo"
N = 2  # two shards keep the subprocess fan-out cheap

ENV = {
    **os.environ,
    "SELFCHECK_DUCK_MEM": "2GB",
    "SELFCHECK_DUCK_THREADS": "2",
    "SPARK_DRIVER_MEMORY": "2g",
}


def _run_lane(mat_dir: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "shard_check.py"),
            SF_DIR,
            "dedup_ppjoin",
            "id_a",
            str(N),
            "--push-expr",
            "a.doc_id",
            "--inject-marker",
            "ON a.tok = b.tok AND a.doc_id < b.doc_id",
            "--spark-mat",
            mat_dir,
        ],
        capture_output=True,
        text=True,
        env=ENV,
        timeout=600,
    )


def test_clean_mat_green_with_coverage(tmp_path, spark):
    mat = str(tmp_path / "mat_clean")
    r = _run_lane(mat)  # parent materializes, then shards digest it
    out = r.stdout.replace("\r", "\n")
    assert r.returncode == 0, out[-2000:]
    assert "coverage sum" in out and "== full count" in out
    assert out.count("rows match") == N


def test_misplaced_row_fails_loudly(tmp_path, spark):
    from pyspark.sql import functions as F

    mat = str(tmp_path / "mat_dirty")
    r = _run_lane(mat)  # builds the clean mat as a side effect
    assert r.returncode == 0
    # corrupt: move exactly one row to the wrong shard partition
    df = spark.read.parquet(mat)
    some_id = df.filter(F.col("__shard") == 0).select("id_a").first()[0]
    flip = F.when(
        (F.col("__shard") == 0) & (F.col("id_a") == some_id),
        F.lit(1),
    ).otherwise(F.col("__shard"))
    dirty = str(tmp_path / "mat_dirty2")
    (
        df.withColumn("__shard", flip.cast("int"))
        .repartition(N, "__shard")
        .write.partitionBy("__shard")
        .mode("overwrite")
        .parquet(dirty)
    )
    r2 = _run_lane(dirty)
    out = r2.stdout.replace("\r", "\n")
    assert r2.returncode != 0, out[-2000:]
    # the misplaced row must surface as a digest mismatch or a
    # coverage gap — never a silent pass
    assert "FAIL" in out

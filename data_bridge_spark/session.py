"""SparkSession factory.

The reference runs everything in one Python process (reference
``app/utils/datastream.py:27-53``); here the session is the engine. Defaults
are tuned so the same code is correct on ``local[N]`` for tests and on a
multi-executor cluster at 100 TB:

- AQE on (runtime join-strategy selection, skew splitting, partition
  coalescing) — the scale knobs the reference never had.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a higher initial number.
- Arrow on for every pandas-UDF edge.
- Session timezone UTC: test parquet stores naive (NTZ) timestamps and the
  DuckDB oracle is UTC-naive; UTC makes collected values identical.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark", "lineage_cut", "plan_once"]


def _scratch_dir() -> str:
    """Spark scratch under the repo's gitignored .scale/ — a path with
    the same lifetime as the process owner, not /tmp's cleaner."""
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sparktmp")
    os.makedirs(d, exist_ok=True)
    return d


def get_spark(
    app_name: str = "data_bridge_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with a pre-set ``spark.master``
    in the environment, or hand in ``extra_conf``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # shuffle/blockmgr scratch OFF /tmp (r11): a multi-hour sf10 run
        # died mid-stage with "No such file or directory" on its own
        # blockmgr temp files — /tmp is subject to age-based cleaning
        # this process doesn't control, and an hour-old shuffle file is
        # exactly what a long scan needs back. Same class of choice as a
        # cluster's dedicated scratch volumes. Override via SPARK_LOCAL_DIRS.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", _scratch_dir()),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Sweep hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" perturbs execution
    # (partition counts, AQE off, repartition sort) without code changes —
    # the determinism sweeps re-run the full oracle corpus under these.
    # Applied AFTER extra_conf: an explicit sweep perturbation must win over
    # caller defaults, else a sweep can report green while never actually
    # running under the perturbed conf. Overlaps are logged to stderr.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    env_pairs: dict[str, str] = {}
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        env_pairs[k.strip()] = v.strip()
    for k, v in env_pairs.items():
        if extra_conf and k in extra_conf and str(extra_conf[k]) != v:
            print(
                f"[data_bridge_spark.session] SPARK_GRAFT_EXTRA_CONF overrides "
                f"extra_conf {k}: {extra_conf[k]!r} -> {v!r}",
                file=sys.stderr,
            )
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if env_pairs:
        # getOrCreate ignores every builder conf when a session already
        # lives — and "already lives" includes the default session reused
        # for a thread where no session is ACTIVE, which a
        # getActiveSession() pre-check misses (r10, ADVICE). So always
        # compare the live conf against the sweep keys after getOrCreate:
        # a freshly created session matches and stays silent; any reuse
        # path that dropped a key fails loudly instead of letting a sweep
        # run unperturbed.
        stale = {
            k: spark.conf.get(k, None)
            for k, v in env_pairs.items()
            if spark.conf.get(k, None) != v
        }
        if stale:
            print(
                f"[data_bridge_spark.session] WARNING: pre-existing session "
                f"ignores SPARK_GRAFT_EXTRA_CONF keys {stale} — sweep conf "
                f"NOT applied",
                file=sys.stderr,
            )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def drop_dead_blocks(spark: SparkSession) -> None:
    """Blocking unpersist of every persisted RDD — long multi-query
    drivers (selfcheck sweeps, benches) otherwise accumulate gigabytes
    of orphaned localCheckpoint blocks whose GC pressure can wedge the
    JVM mid-run (an r5 sweep saw a 12 s query stall 80+ minutes). One
    shared implementation for every driver tool."""
    try:
        # clearCache first: plan_once fences register in the CacheManager
        # (keyed by canonicalized plan), and a later invocation of the
        # same query would otherwise MATCH the previous sample's entry —
        # every timed sample must recompute from the parquet inputs.
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
    except Exception:
        spark.catalog.clearCache()


def lineage_cut(df, eager: bool = False):
    """One-shot lineage fence for a small intermediate that is consumed
    by multiple downstream branches (band tables, per-key seeds,
    aggregate-once frames).

    Default is ``localCheckpoint`` — executor-local block storage, no
    durable write, the right cost for local runs and tests, but NOT
    fault-tolerant: losing an executor invalidates its locally-stored
    partitions and fails the query (retry-the-query cost, never a wrong
    answer). For a cluster run, set ``spark.databridge.checkpointDir``
    (runtime-settable conf) or the ``DBS_CHECKPOINT_DIR`` env var and
    every fence in the repo becomes a durable reliable ``checkpoint()``
    into that directory — the same knob the iterative loops already
    expose as a parameter (operators/graph.py, operators/dedup.py).

    Registered queries have a fixed (spark, sf_dir) signature, so the
    knob is conf/env rather than a parameter."""
    spark = df.sparkSession
    try:
        ckpt = spark.conf.get("spark.databridge.checkpointDir", None)
    except Exception:
        ckpt = None
    ckpt = ckpt or os.environ.get("DBS_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def plan_once(df):
    """Multi-consumer EXECUTION fence: ``persist()`` so a subtree consumed
    by several branches computes once per action instead of once per
    consumer — same dedup job ``lineage_cut`` does, WITHOUT its build-time
    cost or fault-intolerance:

    - ``localCheckpoint(eager=False)`` physically PLANS its subtree at
      DataFrame-construction time (Dataset.localCheckpoint materializes
      queryExecution.toRdd), so every fence charges full analysis+planning
      to the driver before any action runs. Measured across the 12
      heaviest-build headline queries at sf0.1: driver build 14.7 s with
      localCheckpoint fences vs 5.2 s with persist fences, identical
      results (r12).
    - persist keeps lineage: losing an executor recomputes (correct,
      slower) instead of failing the query, and no checkpoint dir is
      needed at cluster scale. Storage class is the same
      MEMORY_AND_DISK family localCheckpoint uses.

    Use ``lineage_cut`` ONLY where the plan itself must be truncated —
    iterative loops (CC label propagation, PageRank, BFS) whose logical
    plan would otherwise grow without bound. Multi-query drivers must
    drop caches between queries (``drop_dead_blocks``) so no sample ever
    reads a previous invocation's blocks.

    The cluster durability knob is honored identically to lineage_cut:
    with ``spark.databridge.checkpointDir`` / ``DBS_CHECKPOINT_DIR`` set,
    every fence becomes a durable reliable ``checkpoint()`` (the contract
    tests/test_checkpointing.py pins); unset (local runs, the bench), the
    fence is the zero-build-cost persist."""
    spark = df.sparkSession
    try:
        ckpt = spark.conf.get("spark.databridge.checkpointDir", None)
    except Exception:
        ckpt = None
    ckpt = ckpt or os.environ.get("DBS_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
        return df.checkpoint(eager=False)
    return df.persist()

"""Engine-side-only execution timing for registry queries — NO oracle.

Purpose (r10): at sf10, `dedup_ppjoin` and `link_blocked_pairs` have
single-node DuckDB oracle costs in the multi-hour range (measured
~2000 s / ~1000 s of pure oracle compute at sf1, scaling ~linearly with
the shard-independent corpus), so their full-value checks stop at sf1 —
but the ENGINE side still needs its scale decade proven. This runs just
the Spark plan with bench.py's noop-write protocol (full plan executes,
nothing is collected) and reports wall seconds + the executed row count
via observe metrics. The output is labeled engine-only evidence; it is
NOT a correctness check and docs/SWEEPS.md must index it as such.

Usage: python tools/engine_timing.py SF_DIR NAME [NAME ...]
Prints one JSON line: {"sf_dir":..., "engine_only": {name: {"sec": s,
"rows": n}}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    reg = load_all()
    spark = get_spark("engine_timing")
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    out: dict[str, dict[str, float]] = {}
    for name in names:
        obs = Observation()
        df = reg[name].fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n"))
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 1)
        out[name] = {"sec": sec, "rows": int(obs.get["n"])}
        print(f"engine-only {name}: {out[name]['rows']} rows in {sec}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "engine_only": out}))


if __name__ == "__main__":
    main()

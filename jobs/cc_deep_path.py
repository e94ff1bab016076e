#!/usr/bin/env python
"""Deep-iteration connected-components exhibit: a path graph of N nodes
(diameter N) forces ~log-many alternating-star rounds.

Pre-fix, Spark 4's localCheckpoint carried each round's ESTIMATED
sizeInBytes into the next round's LogicalRDD, doubling its bit-length per
round — at 20 rounds the estimate is a ~10^8-bit BigInteger and a single
Catalyst stats visit takes 10+ minutes, so this job was IMPOSSIBLE to
finish.  With datapipe._stats_safe_local_checkpoint the estimate stays a
small constant (stats_bits telemetry below) and the run is bounded by the
actual joins.

Usage: python jobs/cc_deep_path.py [N] [CPUS] [ORDER]
ORDER: 'seq' (ids monotone along the path — the easy case for label
propagation) or 'random' (ids a random permutation — the ordering that
exposed the O(diameter) behavior of hashmin+pointer-doubling; the
alternating-star algorithm must stay log-round on BOTH).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from sparkkd import datapipe

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ORDER = sys.argv[3] if len(sys.argv) > 3 else "seq"


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ids = np.arange(N, dtype=np.int64)
    if ORDER == "random":
        ids = np.random.default_rng(5).permutation(N).astype(np.int64)
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    )
    stats: dict = {}
    t0 = time.time()
    res = datapipe.connected_components(pairs, max_iter=64, stats=stats)
    n_rows = res.count()
    wall = time.time() - t0
    ok = res.filter("component != 0").count() == 0
    print(json.dumps({
        "n_nodes": N, "diameter": N - 1, "rounds": stats.get("rounds"),
        "stats_bits": stats.get("stats_bits"), "wall_sec": round(wall, 1),
        "rows": n_rows, "single_component_min0": bool(ok), "cpus": CPUS,
        "order": ORDER,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

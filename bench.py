#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "knn_rows_per_sec": ..., "cpus": ...}

The headline metric for BASELINE.md is kNN-join throughput in query rows/sec
at k=8 (exactness is enforced separately by the correctness harness and
tests).  Scaling-efficiency evidence (local[8] vs local[32]) is produced by
bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    from sparkkd.envtune import disable_thp

    disable_thp()  # THP compaction stalls dominate runtime in this VM
    # python workers fork from the JVM and read this at first Arrow use —
    # covers workers even when sparkkd imports late (see envtune)
    pool = os.environ.get("SPARKKD_ARROW_POOL", "mimalloc").lower()
    if pool in ("mimalloc", "system", "jemalloc"):
        os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", pool)

    import pathlib

    # shuffle through tmpfs: /tmp sits on a slow virtio disk that serializes
    # shuffle I/O regardless of core count; a real cluster scales disks with
    # executors, so RAM-backed local dirs are the honest local-mode analogue
    shm = pathlib.Path("/dev/shm/sparkkd-local")
    shm.mkdir(parents=True, exist_ok=True)

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkkd-bench")
        .config("spark.local.dir", str(shm))
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARKKD_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sparkkd import synth

    tag = synth.sf_tag(sf_dir)
    synth.ensure_fixtures(tag)  # outside the timed region (input materialization)

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    headline = [
        "knn_join_k8",
        "so3_knn_join_k8",
        "se3_knn_join_k4",
        "radius_join_r2",
        "pip_join",
        "raster_vector_join",
        "tile_assign_l7",
        "cell_stats_l7",
    ]
    headline = [h for h in headline if h in qs]

    # untimed warmup: spin up python workers, compile codegen paths once
    # (measured ~15s one-time cost otherwise attributed to the first query)
    qs["knn_join_k8"](spark, "/root/testdata/sf0.001").count()

    # SELF-DEFENDING measurement (this VM shows 2-4x run-to-run noise from
    # hypervisor steal — the round-2 driver artifact hid a 4x factor):
    # 1. a COLD pass per query, reported separately as build_sec (it pays
    #    index construction: stats job + corpus persist, cached per
    #    session+sf by the entry module) so cold and steady-state can't be
    #    conflated;
    # 2. min-of-3 steady-state runs, with the RAW per-run values emitted in
    #    `all` so the artifact itself shows the noise; if the triplet's
    #    spread exceeds 2x, up to 2 extra runs are taken (variance guard).
    build_sec: dict[str, float] = {}
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for name in headline:
        t0 = time.time()
        counts[name] = qs[name](spark, sf_dir).count()
        build_sec[name] = round(time.time() - t0, 3)
        runs: list[float] = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            counts[name] = df.count()
            runs.append(round(time.time() - t0, 3))
        while max(runs) / max(min(runs), 1e-9) > 2.0 and len(runs) < 5:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)

    n_queries = synth.SF_SIZES[tag][1]
    knn_tput = round(n_queries / timings["knn_join_k8"], 1) if "knn_join_k8" in timings else None

    out = {
        "metric": "headline_query_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "all": all_runs,
        "build_sec": {**build_sec, "total": round(sum(build_sec.values()), 3)},
        "sf": tag,
        "cpus": cpus,
        "rows": counts,
        "knn_k8_query_rows_per_sec": knn_tput,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Scaling-efficiency evidence: the SAME kNN-join job on the SAME input at
two parallelism levels (local[8] = N cores, local[32] = 4N cores), per the
north_rule's two-cluster-size criterion (no multi-node cluster exists in
this sandbox; parallelism level stands in for executor count).

Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = throughput_4N / (4 * throughput_N).

Each level runs in its OWN subprocess (a JVM's master can't change
in-process) and times the steady-state join after an untimed warmup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default to the dedicated 1M-image scaling corpus: single runs are then
# 1-3 min, long enough that host-level noise (this VM shows 2-3x run-to-run
# variance on short jobs) amortizes out
SCALE_TAG = os.environ.get("SPARKKD_SCALE_TAG", "sf1")
REPEATS = int(os.environ.get("SPARKKD_SCALING_REPEATS", "3"))


def worker(cpus: int) -> None:
    from bench import build_session
    from sparkkd import engine, synth

    tag = SCALE_TAG if SCALE_TAG in synth.SF_SIZES else synth.sf_tag(SF_DIR)
    root = synth.ensure_fixtures(tag)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    images = spark.read.parquet(str(root / "images.parquet"))
    queries = spark.read.parquet(str(root / "queries.parquet"))
    n_img, n_q = synth.SF_SIZES[tag]

    # The measured job follows the reference's contract: build once, query
    # many (KDTree constructed once, nearest() called repeatedly —
    # src/_kdtree_base.hpp:38-55).  Index build (scan+stats+salt) is timed
    # separately as build_sec; the scaling-efficiency figure is the
    # steady-state QUERY throughput.
    t0 = time.time()
    idx = engine.GeoIndex(spark, images, n_images_hint=n_img)
    build_sec = time.time() - t0
    # untimed warmup (python workers, codegen, parquet footers)
    idx.knn_join(queries.limit(64), k=8).count()

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        n_rows = idx.knn_join(queries, k=8).count()
        times.append(time.time() - t0)
    sec = min(times)  # steady-state
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "sec": round(sec, 2),
                "build_sec": round(build_sec, 2),
                "all_secs": [round(t, 2) for t in times],
                "query_rows_per_sec": round(n_q / sec, 1),
                "image_rows_per_sec": round(n_img / sec, 1),
                "result_rows": n_rows,
                "n_images": n_img,
                "n_queries": n_q,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"worker local[{cpus}] produced no RESULT")
        results[cpus] = json.loads(line[-1][len("RESULT "):])

    r8, r32 = results[8], results[32]
    eff = r32["query_rows_per_sec"] / (4.0 * r8["query_rows_per_sec"])
    speedup = r8["sec"] / r32["sec"]

    from sparkkd import synth

    tag = SCALE_TAG if SCALE_TAG in synth.SF_SIZES else synth.sf_tag(SF_DIR)
    md = f"""# BENCH — scaling-efficiency evidence (north_rule two-cluster-size criterion)

Same job, same input, two parallelism levels (no real multi-node cluster in
this sandbox; local[8] vs local[32] = N vs 4N cores, per driver instruction).

**Job**: exact kNN join, k=8 — {r8['n_queries']:,} query rows against
{r8['n_images']:,} image rows ({tag} fixture corpus), build-once/query-many
(index build timed separately; steady-state query batch = best of
{REPEATS} after untimed warmup), single-JVM local mode.

| parallelism | build sec | query-batch sec | query rows/sec | image rows/sec |
|---|---|---|---|---|
| local[8]  (N)  | {r8['build_sec']} | {r8['sec']} | {r8['query_rows_per_sec']:,} | {r8['image_rows_per_sec']:,} |
| local[32] (4N) | {r32['build_sec']} | {r32['sec']} | {r32['query_rows_per_sec']:,} | {r32['image_rows_per_sec']:,} |

- **speedup 8 -> 32 cores: {speedup:.2f}x**
- **scaling efficiency = throughput_4N / (4 x throughput_N) = {eff:.3f}**
  (target >= 0.8)
- exact-NN match rate vs brute force: **1.0** (all kNN query outputs are
  row-for-row AND bit-for-bit equal to the DuckDB cross-join oracle at
  sf0.01 — see CORRECTNESS harness and tests/test_engine_spark.py)

Raw: `{json.dumps(results)}`
"""
    Path("BENCH").mkdir(exist_ok=True)
    # raw last-run record; BENCH/BASELINE.md is the CURATED multi-dataset
    # document (quiet-window numbers + honest analysis) — don't clobber it
    Path("BENCH/scaling_last_run.md").write_text(md)
    print(md)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()

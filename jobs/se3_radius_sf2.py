#!/usr/bin/env python
"""Corpus-scale-up rung for the marquee SE(3) compound radius join:
the round-4/5 sf1 workload (100k queries, r=0.7, rw=2/tw=0.5, 300M
pairs) against the sf2 corpus — SAME query count, SAME radius, 4x the
poses (4M).  Output pairs scale roughly with corpus density (~4x, low
billions); admission runs the >2048-partition group path, and skew
splitting must keep tasks bounded.  This is the direct "would the plan
survive a corpus scale-up" measurement at fixed query workload.

Usage: python jobs/se3_radius_sf2.py [--cpus 32] [--repeats 2]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cpus = 32
    repeats = 2
    args = sys.argv[1:]
    if "--cpus" in args:
        cpus = int(args[args.index("--cpus") + 1])
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])

    from pyspark.sql import functions as F

    from bench import build_session
    from sparkkd import so3engine, synth

    root = synth.ensure_pose_fixtures("sf2")
    q1 = synth.ensure_pose_fixtures("sf1")
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    poses = spark.read.parquet(str(root / "poses.parquet"))
    # the sf1 query batch verbatim: fixed workload, only the corpus grows
    queries = spark.read.parquet(str(q1 / "pose_queries.parquet"))

    t0 = time.time()
    idx = so3engine.Se3Index(spark, poses)
    build_sec = time.time() - t0

    def run() -> tuple[float, int]:
        t = time.time()
        n = idx.radius_join(
            queries, 0.7, rot_weight=2.0, trans_weight=0.5
        ).count()
        return time.time() - t, n

    wu_sec, n_pairs = run()  # warmup (timed for visibility, not reported)
    print(json.dumps({"warmup_sec": round(wu_sec, 1), "pairs": n_pairs}), flush=True)
    secs = []
    for _ in range(repeats):
        s, n_pairs = run()
        secs.append(round(s, 2))
    best = min(secs)
    print(
        json.dumps(
            {
                "job": "se3_radius_join r=0.7 rw=2 tw=0.5, sf1 queries x sf2 corpus",
                "cpus": cpus,
                "build_sec": round(build_sec, 2),
                "sec": best,
                "all_secs": secs,
                "pairs": n_pairs,
                "pairs_per_sec": round(n_pairs / best, 1),
                "n_partitions": int(idx.layout.n_partitions),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

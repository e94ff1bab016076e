#!/usr/bin/env python
"""Pose-engine ladder: build-once/query-many SO(3) and SE(3) kNN at
sf1/sf2 (the regression check BASELINE datasets E/F track each round),
plus the MEASURED layout-broadcast byte count (VERDICT r4 #3 done
criterion: f32 outward-padded stats boxes vs the f64 equivalent).

Per (space, tag): index build sec, then warm-up + 3 timed steady kNN
batches (all triplets), result rows, and for the layout the broadcast
payload bytes as shipped (float32 outward-padded) vs what the same
arrays cost in float64.  Usage: python jobs/pose_ladder.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def layout_bytes(layout) -> dict:
    """Bytes of the admission stats boxes as broadcast (f32 outward) vs
    the f64 equivalent, plus the non-box arrays that ship alongside."""
    from sparkkd.so3engine import _f32_outward

    box_pairs = [
        (layout.leaf_lo, layout.leaf_hi),
        (layout.p_lo, layout.p_hi),
        (layout.g_lo, layout.g_hi),
        (layout.leaf_slo, layout.leaf_shi),
        (layout.p_slo, layout.p_shi),
        (layout.g_slo, layout.g_shi),
    ]
    f32 = f64 = 0
    for lo, hi in box_pairs:
        if lo is None:
            continue
        a, b = _f32_outward(lo, hi)
        f32 += a.nbytes + b.nbytes
        f64 += lo.nbytes + hi.nbytes
    other = int(layout.p_start.nbytes + layout.g_start.nbytes + layout.g_counts.nbytes)
    return {
        "box_bytes_f32": int(f32),
        "box_bytes_f64": int(f64),
        "other_bytes": other,
        "reduction": round(f64 / max(f32, 1), 2),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    from bench import build_session
    from sparkkd import so3engine, synth

    spark = build_session(32 if not quick else 8)
    spark.sparkContext.setLogLevel("ERROR")
    tags = ["sf1", "sf2"] if not quick else ["sf0.1"]
    for tag in tags:
        root = synth.ensure_pose_fixtures(tag)
        poses = spark.read.parquet(str(root / "poses.parquet"))
        queries = spark.read.parquet(str(root / "pose_queries.parquet"))
        for space in ("so3", "se3"):
            t0 = time.time()
            if space == "so3":
                idx = so3engine.So3Index(spark, poses)
                run = lambda: idx.knn_join(queries, k=8).count()
            else:
                idx = so3engine.Se3Index(spark, poses)
                run = lambda: idx.knn_join(
                    queries, k=4, rot_weight=2.0, trans_weight=0.5
                ).count()
            build_sec = time.time() - t0
            rows = run()  # warm-up
            secs = []
            for _ in range(3):
                t = time.time()
                rows = run()
                secs.append(round(time.time() - t, 2))
            print(
                json.dumps(
                    {
                        "space": space,
                        "tag": tag,
                        "build_sec": round(build_sec, 2),
                        "steady_sec": min(secs),
                        "all_secs": secs,
                        "rows": rows,
                        "n_partitions": int(idx.layout.n_partitions),
                        "n_groups": int(len(idx.layout.g_counts)),
                        **layout_bytes(idx.layout),
                    }
                ),
                flush=True,
            )
            idx.unpersist()


if __name__ == "__main__":
    main()

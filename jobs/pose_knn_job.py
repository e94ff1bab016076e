#!/usr/bin/env python
"""spark-submit entry point for the SO(3) / SE(3) pose kNN joins.

Cluster launch (north_rule shape — N and 4N executors are just
--num-executors values; this sandbox evidences scaling with local[8] vs
local[32], see bench_scaling.py and BENCH/BASELINE.md D/E):

    zip -r sparkkd.zip sparkkd
    spark-submit --py-files sparkkd.zip \
        --num-executors 64 --executor-cores 4 --executor-memory 16g \
        jobs/pose_knn_job.py \
        --poses s3://bucket/poses/ --queries s3://bucket/pose_queries/ \
        --out s3://bucket/pose_knn_out/ --k 8 --space so3

Local smoke:

    python jobs/pose_knn_job.py \
        --poses _fixtures/sf0.001/poses.parquet \
        --queries _fixtures/sf0.001/pose_queries.parquet \
        --out /tmp/pose_knn_out --k 4 --space se3 \
        --rot-weight 2.0 --trans-weight 0.5 --master 'local[8]'
"""

from __future__ import annotations

import argparse
import os
import sys

# running from the repo without --py-files: make sparkkd importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--space", choices=["so3", "se3"], default="so3")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--radius", type=float, default=None,
                    help="SO(3) only: run the angular radius join instead")
    ap.add_argument("--rot-weight", type=float, default=1.0)
    ap.add_argument("--trans-weight", type=float, default=1.0)
    ap.add_argument("--level", type=int, default=None)
    ap.add_argument("--max-cell-rows", type=int, default=16384)
    ap.add_argument("--master", default=None, help="override for local runs")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(f"sparkkd-{args.space}-knn")
    if args.master:
        b = b.master(args.master)
    spark = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from sparkkd import so3engine

    poses = spark.read.parquet(args.poses)
    queries = spark.read.parquet(args.queries)
    if args.space == "so3":
        if args.radius is not None:
            res = so3engine.so3_radius_join(
                spark, poses, queries, r=args.radius,
                level=args.level, max_cell_rows=args.max_cell_rows,
            )
        else:
            res = so3engine.so3_knn_join(
                spark, poses, queries, k=args.k,
                level=args.level, max_cell_rows=args.max_cell_rows,
            )
    else:
        res = so3engine.se3_knn_join(
            spark, poses, queries, k=args.k,
            rot_weight=args.rot_weight, trans_weight=args.trans_weight,
            level=args.level, max_cell_rows=args.max_cell_rows,
        )
    res.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()

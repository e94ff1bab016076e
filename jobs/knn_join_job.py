#!/usr/bin/env python
"""spark-submit entry point for the exact kNN join.

Cluster launch (north_rule shape — N and 4N executors are just
--num-executors values; this sandbox evidences scaling with local[8] vs
local[32], see bench_scaling.py):

    zip -r sparkkd.zip sparkkd
    spark-submit --py-files sparkkd.zip \
        --num-executors 64 --executor-cores 4 --executor-memory 16g \
        jobs/knn_join_job.py \
        --images s3://bucket/images/ --queries s3://bucket/queries/ \
        --out s3://bucket/knn_out/ --k 8

Local smoke:

    python jobs/knn_join_job.py \
        --images _fixtures/sf0.001/images.parquet \
        --queries _fixtures/sf0.001/queries.parquet \
        --out /tmp/knn_out --k 8 --master 'local[8]'
"""

from __future__ import annotations

import argparse
import os
import sys

# running from the repo without --py-files: make sparkkd importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--level", type=int, default=None)
    ap.add_argument("--max-cell-rows", type=int, default=8192)
    ap.add_argument("--master", default=None, help="override for local runs")
    ap.add_argument("--snapshot-lineage", default=None,
                    help="optional SnapshotStore root for lineage metrics")
    ap.add_argument("--index-path", default=None,
                    help="bucket-stored index root: reuse it if present, "
                    "else build + save before querying (build-once/"
                    "query-many across job submissions — no per-batch "
                    "corpus shuffle)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("sparkkd-knn-join")
    if args.master:
        b = b.master(args.master)
    spark = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from sparkkd import engine

    images = spark.read.parquet(args.images)
    queries = spark.read.parquet(args.queries)
    if args.index_path:
        import pathlib

        from sparkkd import bucketstore

        root = pathlib.Path(args.index_path)
        if (root / "meta.json").exists():
            idx = bucketstore.BucketedGeoIndex.load(spark, root)
        else:
            idx = bucketstore.save_geo_index(
                spark, images, "sparkkd_geoidx", root,
                level=args.level, max_cell_rows=args.max_cell_rows,
            )
        res = idx.knn_join(queries, k=args.k)
    else:
        res = engine.knn_join(
            spark, images, queries, k=args.k,
            level=args.level, max_cell_rows=args.max_cell_rows,
        )
    res.write.mode("overwrite").parquet(args.out)

    if args.snapshot_lineage:
        from sparkkd import cells
        from sparkkd.snapshots import SnapshotStore

        store = SnapshotStore(args.snapshot_lineage)
        sid = store.write(images)
        store.write_lineage(spark, sid, args.level or cells.DEFAULT_LEVEL)

    spark.stop()


if __name__ == "__main__":
    main()

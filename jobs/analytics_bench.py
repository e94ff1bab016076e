#!/usr/bin/env python
"""Scale rungs for the round-5 composite analytics (geo_dbscan /
idw_interpolate / kring_smooth): wall time + output shape at sf0.01 and
sf0.1, printed one JSON line per rung (recorded in BENCH/BASELINE.md).

Rungs:
  dbscan_sub   — mod-4 id subsample (the oracle-checked configuration) at
                 eps=0.5/min_pts=5: eps-graph ~7M pairs at sf0.1.
  dbscan_hot   — FULL corpus at eps=0.1: the hot box (5% of rows in a
                 0.04 deg box) is one near-clique, ~1e8-pair eps-graph at
                 sf0.1 — the skew stress rung.
  idw          — full query table, k=8 (kNN join + rank-ordered fold).
  kring        — level-7 focal sum over the full corpus.

Usage: python jobs/analytics_bench.py [sf_tag ...] (default sf0.01 sf0.1)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import build_session
from sparkkd import analytics, synth

TAGS = sys.argv[1:] or ["sf0.01", "sf0.1"]


def timed(fn):
    t0 = time.time()
    n = fn().count()
    return round(time.time() - t0, 2), n


def main() -> None:
    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    for tag in TAGS:
        root = synth.ensure_fixtures(tag)
        images = spark.read.parquet(str(root / "images.parquet"))
        queries = spark.read.parquet(str(root / "queries.parquet"))
        n_img = synth.SF_SIZES[tag][0]
        sub = images.filter(
            F.expr("CAST(substring(image_id, 4) AS BIGINT) % 4 = 0")
        )

        sec, n = timed(lambda: analytics.geo_dbscan(
            spark, sub, eps=0.5, min_pts=5, n_images_hint=n_img // 4))
        print(json.dumps({"rung": "dbscan_sub", "sf": tag, "rows": n,
                          "sec": sec}), flush=True)

        sec, n = timed(lambda: analytics.geo_dbscan(
            spark, images, eps=0.1, min_pts=5, n_images_hint=n_img))
        print(json.dumps({"rung": "dbscan_hot", "sf": tag, "rows": n,
                          "sec": sec}), flush=True)

        val_img = images.withColumn("val", F.expr("CAST(w * h AS DOUBLE)"))
        sec, n = timed(lambda: analytics.idw_interpolate(
            spark, val_img, queries, "val", k=8, n_images_hint=n_img))
        print(json.dumps({"rung": "idw", "sf": tag, "rows": n,
                          "sec": sec}), flush=True)

        sec, n = timed(lambda: analytics.kring_smooth(images, 7))
        print(json.dumps({"rung": "kring", "sf": tag, "rows": n,
                          "sec": sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

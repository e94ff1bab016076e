"""Source-format breadth: the engine is input-format-agnostic because
Catalyst is — ORC / JSON / CSV corpora produce byte-identical join
results to the parquet fixture (SURVEY §2.4: formats come for free)."""

import numpy as np
import pytest

from sparkkd import engine, synth

pytestmark = pytest.mark.spark


def test_knn_join_identical_across_source_formats(spark, tmp_path):
    root = synth.ensure_fixtures("sf0.001")
    images = spark.read.parquet(str(root / "images.parquet")).select(
        "image_id", "phash"
    )
    queries = spark.read.parquet(str(root / "queries.parquet")).limit(50)
    want = (
        engine.knn_join(spark, images, queries, k=4, n_images_hint=2000)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    for fmt in ("orc", "json", "csv"):
        p = tmp_path / fmt
        w = images.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(str(p))
            rd = (
                spark.read.option("header", True)
                .schema("image_id string, phash long")
                .csv(str(p))
            )
        elif fmt == "json":
            w.json(str(p))
            rd = spark.read.schema("image_id string, phash long").json(str(p))
        else:
            w.orc(str(p))
            rd = spark.read.orc(str(p))
        got = (
            engine.knn_join(spark, rd, queries, k=4, n_images_hint=2000)
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert (got["image_id"].to_numpy() == want["image_id"].to_numpy()).all(), fmt
        assert np.array_equal(got["dist"].to_numpy(), want["dist"].to_numpy()), fmt

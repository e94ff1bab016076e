"""Composite geo analytics built from the engine's verified primitives.

Three operators a geospatial image-corpus pipeline runs on top of the
join/tiling layer, each a pure composition of already-oracle-verified
stages (so correctness reduces to the primitives plus deterministic glue):

* :func:`geo_dbscan` — density clustering (DBSCAN, Ester et al. 1996) over
  the phash-derived coordinates: one indexed radius SELF-join builds the
  eps-graph, a groupBy computes degrees, the alternating-star connected
  components labels core points, one more keyed join assigns borders.
  Deterministic variant: the cluster label is the component's minimum
  image_id and border points take the MINIMUM label over their core
  neighbors (classic DBSCAN leaves border assignment order-dependent —
  a non-starter for a distributed engine that promises bit-stable output).
* :func:`idw_interpolate` — inverse-distance-weighted kNN regression
  (Shepard 1968): the exact kNN join (reference Q2 semantics,
  ``src/_kdtree_median.hpp:456-472``) feeds a per-query ordered fold, so
  the floating-point sum order is fixed by rank and the result is
  bit-reproducible across partitionings AND engines (the DuckDB oracle
  folds the identical rank-ordered lists).
* :func:`kring_smooth` — focal (neighborhood) aggregation on the tiling
  grid: per occupied cell, the row-count sum over its 3x3 neighbor ring
  (the k=1 ring of an H3/S2-style index; grid cells here are the row-major
  ids of ``sparkkd.cells``).  Pure integer arithmetic — exact everywhere.

Scale notes (100 TB shapes):

* geo_dbscan's only super-linear object is the eps-graph itself — which is
  the OUTPUT of the radius join and inherently as large as the data's
  density demands.  Every stage is a keyed shuffle on ids (degree count,
  CC star rounds, border min) — no driver materialization, no cross join;
  hot-cell skew in the self-join is handled by the radius engine's salting
  and heavy-group splitting exactly as for any radius query.
* idw_interpolate adds one map-side join (values onto neighbors, both
  sides pre-partitioned by image_id at scale) and one groupBy(query_id)
  whose groups are bounded by k — the collect_list is k structs, never
  unbounded.
* kring_smooth fans each occupied cell out 9x (constant) and re-groups on
  the neighbor key — partial aggregation makes it one bounded shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells, engine
from .datapipe import connected_components

__all__ = ["geo_dbscan", "idw_interpolate", "kring_smooth"]


def geo_dbscan(
    spark: SparkSession,
    images: DataFrame,
    eps: float,
    min_pts: int,
    level: int | None = None,
    max_cell_rows: int = 8192,
    n_images_hint: int | None = None,
) -> DataFrame:
    """DBSCAN over phash-derived (lon, lat), deterministic labeling.

    A point is **core** iff its eps-ball holds >= ``min_pts`` points
    (the point itself included).  Core points within eps of each other
    share a cluster; a **border** point (non-core with at least one core
    neighbor) joins the MINIMUM cluster label among its core neighbors;
    everything else is **noise**.  Cluster label = minimum image_id of
    the cluster's core points (the connected-components representative).

    Returns (image_id, role, cluster) for EVERY input row — role in
    {'core','border','noise'}, cluster NULL for noise.
    """
    pts = engine.with_coords(images).select("image_id", "x", "y")
    q = pts.select(
        F.col("image_id").alias("query_id"),
        F.col("y").alias("qlat"),
        F.col("x").alias("qlon"),
    )
    # eps-graph: indexed radius SELF-join (includes the self pair at d=0,
    # so count(*) per query IS |eps-ball| with the point itself)
    pairs = engine.radius_join(
        spark, images, q, r=eps, level=level,
        max_cell_rows=max_cell_rows, n_images_hint=n_images_hint,
    ).select("query_id", "image_id")
    deg = pairs.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_eps"))
    core = deg.filter(F.col("n_eps") >= int(min_pts)).select(
        F.col("query_id").alias("id")
    )
    # core-core edges (self pairs kept: an isolated core point is its own
    # cluster — the self loop keeps it in the CC id universe)
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "query_id"), "query_id", "left_semi")
        .join(core.withColumnRenamed("id", "image_id"), "image_id", "left_semi")
        .select(F.col("query_id").alias("id_a"), F.col("image_id").alias("id_b"))
    )
    comp = connected_components(core_edges)  # (id, component) — cores only
    core_rows = comp.select(
        F.col("id").alias("image_id"),
        F.lit("core").alias("role"),
        F.col("component").alias("cluster"),
    )
    # border: non-core with >= 1 core neighbor -> min core-neighbor label
    border_rows = (
        pairs.join(core.withColumnRenamed("id", "query_id"), "query_id", "left_anti")
        .join(
            comp.withColumnRenamed("id", "image_id"), "image_id"
        )  # inner: core neighbors only
        .groupBy("query_id")
        .agg(F.min("component").alias("cluster"))
        .select(
            F.col("query_id").alias("image_id"),
            F.lit("border").alias("role"),
            "cluster",
        )
    )
    labeled = core_rows.unionByName(border_rows)
    noise_rows = (
        pts.select("image_id")
        .join(labeled.select("image_id"), "image_id", "left_anti")
        .select(
            "image_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("string").alias("cluster"),
        )
    )
    return labeled.unionByName(noise_rows)


# machine-epsilon guard so a zero-distance neighbor gets a huge-but-finite
# weight instead of a division by zero; part of the operator's DEFINITION
# (the oracle uses the identical constant)
IDW_EPS = 1e-9


def idw_interpolate(
    spark: SparkSession,
    images: DataFrame,
    queries: DataFrame,
    value_col: str,
    k: int = 8,
    level: int | None = None,
    max_cell_rows: int = 8192,
    n_images_hint: int | None = None,
) -> DataFrame:
    """Inverse-distance-weighted value at each query point from its k
    exact nearest images: sum(v_i / (d_i + eps)) / sum(1 / (d_i + eps)),
    folded in rank order so the double-precision sum is deterministic.

    ``images`` must carry ``value_col`` (double).  Returns
    (query_id, idw_value, n_used).
    """
    nn = engine.knn_join(
        spark, images, queries, k=k, level=level,
        max_cell_rows=max_cell_rows, n_images_hint=n_images_hint,
    ).select("query_id", "image_id", "dist", "rank")
    vals = images.select("image_id", F.col(value_col).cast("double").alias("val"))
    nb = (
        nn.join(vals, "image_id")
        .groupBy("query_id")
        # struct sorts lexicographically field by field; rank is unique per
        # query, so sort_array gives exactly rank order (the fold order)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rank", "dist", "val"))
            ).alias("nb")
        )
    )
    e = f"CAST('{IDW_EPS!r}' AS DOUBLE)"
    num = f"aggregate(nb, CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.val / (s.dist + {e}))"
    den = f"aggregate(nb, CAST(0.0 AS DOUBLE), (acc, s) -> acc + CAST(1.0 AS DOUBLE) / (s.dist + {e}))"
    return nb.select(
        "query_id",
        (F.expr(num) / F.expr(den)).alias("idw_value"),
        F.size("nb").alias("n_used"),
    )


def kring_smooth(images: DataFrame, level: int) -> DataFrame:
    """3x3 focal sum of per-cell row counts on the level-``level`` tiling
    grid (an H3/S2 k=1 ring analogue on the row-major grid of
    ``sparkkd.cells``).  Out-of-grid neighbors are skipped (no wrap — the
    grid clamps at the boundary, matching cell assignment semantics);
    unoccupied neighbors contribute zero.  Returns one row per OCCUPIED
    cell: (cell_id, n_rows, ring_rows)."""
    n = 1 << level
    occ = (
        engine.with_cell(engine.with_coords(images), level)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    off = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx}L AS dx, {dy}L AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    ix = F.col("cell_id") % n
    iy = (F.col("cell_id") - ix) / n  # exact: cell_id = iy*n + ix
    fan = (
        occ.select("cell_id", "n_rows", off.alias("o"))
        .withColumn("tx", ix + F.col("o.dx"))
        .withColumn("ty", iy.cast("long") + F.col("o.dy"))
        .filter(
            (F.col("tx") >= 0) & (F.col("tx") < n)
            & (F.col("ty") >= 0) & (F.col("ty") < n)
        )
        .select(
            (F.col("ty") * n + F.col("tx")).alias("cell_id"),
            F.col("n_rows").alias("c"),
        )
    )
    ring = fan.groupBy("cell_id").agg(F.sum("c").alias("ring_rows"))
    return occ.join(ring, "cell_id").select("cell_id", "n_rows", "ring_rows")

"""Spark pipelines: the distributed re-expression of the reference queries.

Every operator follows the same Spark-first shape:

    parquet scan (pushdown/pruning by Catalyst)
      -> derive coords + cell_id with BUILT-IN column exprs (JVM, codegen)
      -> shuffle on the cell key (repartition implied by groupBy/cogroup)
      -> per-cell NumPy k-d kernel inside ONE Arrow UDF (sparkkd.kernel)
      -> window merge / joins with built-in operators

Cross-cell exactness uses the same branch-and-bound reasoning as the
reference's ``shouldTraverse`` (``src/_kdtree_median.hpp:136-138``), lifted
one level up: per-cell data bboxes play the role of node regions, and a
per-query kth-distance upper bound (derived from cell point counts) prunes
whole cells before any shuffle row is produced.

Skew handling is explicit (north_rule): cells whose row count exceeds
``max_cell_rows`` are salted into ``ceil(count/max_cell_rows)`` sub-trees;
query candidates are replicated to every salt of a candidate cell, so
exactness is preserved (all sub-trees of a probed cell are probed).

Scale notes (designed for 10^12 rows / 1000 executors, tested local[32]):

* The only driver-side state is the per-cell stats table
  (cell_id, count, bbox) — bounded by the number of OCCUPIED cells.  At
  level 13 that is <= 67M rows; production would aggregate stats at a
  coarser level first (same pruning math, looser bboxes).  Everything else
  stays distributed.
* Shuffles: one for stats (map-side combined count/min/max), one cogroup on
  the salted cell key, one window on query_id.  No cross join ever.
* All pre-kernel expressions are Spark built-ins -> whole-stage codegen;
  Python only touches Arrow batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cells, kernel

# key encoding: key = (level << LEVEL_SHIFT) | cell_id  (cell_id < 4^level
# needs 2*level bits; level <= 19 fits well under 2^40);
# part_key = key << SALT_SHIFT | salt (hash-salt fallback for duplicates)
LEVEL_SHIFT = 40
SALT_SHIFT = 12
MAX_LEVEL = 19


def _parallelism(spark: SparkSession) -> int:
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return spark.sparkContext.defaultParallelism


# intermediate caches (phase-1 top-k, phase-2 candidates) from the most
# recent join call; released on the next call / via release_caches() so
# repeated query batches don't accumulate executor storage memory
_LIVE_CACHES: list[DataFrame] = []


def _register_cache(df: DataFrame) -> DataFrame:
    df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist intermediates from prior join calls.  A still-lazy earlier
    result plan remains CORRECT after this (Spark recomputes the evicted
    subtree); only already-materialized reuse is affected."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass


# ---------------------------------------------------------------- inputs


def with_coords(images: DataFrame) -> DataFrame:
    """Derive (x=lon, y=lat) from phash with JVM-side expressions (the
    ``_GetKey`` projection of the reference, ``src/_kdtree_base.hpp:50``)."""
    return images.withColumns(
        {
            "y": F.expr(cells.phash_lat_sql("phash")),
            "x": F.expr(cells.phash_lon_sql("phash")),
        }
    )


def with_cell(df: DataFrame, level: int, x: str = "x", y: str = "y") -> DataFrame:
    return df.withColumn("cell_id", F.expr(cells.cell_id_sql(x, y, level)))


@dataclass
class CellStats:
    """Driver-side pruning statistics: one row per occupied (possibly
    refined) cell.  Keys encode ``(level << LEVEL_SHIFT) | cell_id`` so a
    mix of base-level cold cells and fine-level refined cells coexists.

    Skew handling is two-tier (north_rule: explicit):

    1. **Spatial refinement** (primary — the distributed twin of the
       reference's adaptive tree depth, deeper where denser): base cells
       holding more than ``max_cell_rows`` rows are re-keyed at a finer
       level, so hot-region queries probe only NEARBY sub-cells instead of
       fanning out to every hash shard of a giant cell.
    2. **Hash salting** (fallback for point-mass duplicates that no spatial
       split can separate): a still-hot refined cell is split into
       ``ceil(count/max_cell_rows)`` salts; candidates replicate to all
       salts of that cell only.
    """

    keys: np.ndarray  # (C,) int64 sorted encoded keys
    counts: np.ndarray  # (C,) int64
    min_x: np.ndarray
    min_y: np.ndarray
    max_x: np.ndarray
    max_y: np.ndarray
    salt_n: np.ndarray  # (C,) int64 hash-salt fan-out per cell
    level: int  # base level
    # refinement schedule: list of (from_level, to_level, hot_cell_ids) —
    # a point's key descends through every matching refinement step
    refinements: list[tuple[int, int, np.ndarray]]

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    @property
    def fine_level(self) -> int:
        return self.refinements[-1][1] if self.refinements else self.level

    def key_sql(self, x_expr: str, y_expr: str) -> str:
        """SQL for the encoded key of a point: start at the base level and
        descend through each refinement step whose hot set contains the
        point's cell at that step's source level (recursive quadtree
        descent, rendered as a nested CASE)."""

        def key_at(lvl: int) -> str:
            c = cells.cell_id_sql(x_expr, y_expr, lvl)
            return f"(CAST({lvl} AS BIGINT) << {LEVEL_SHIFT}) + {c}"

        expr = key_at(self.level)
        for from_lvl, to_lvl, hot in self.refinements:
            hot_list = ", ".join(str(int(c)) for c in hot)
            cond = f"{cells.cell_id_sql(x_expr, y_expr, from_lvl)} IN ({hot_list})"
            expr = f"(CASE WHEN {cond} THEN {key_at(to_lvl)} ELSE {expr} END)"
        return expr


def _coarsen(cell: np.ndarray, from_level: int, to_level: int) -> np.ndarray:
    """Map cell ids at from_level to their ancestor ids at to_level."""
    nf = np.int64(1 << from_level)
    s = from_level - to_level
    ix = (cell % nf) >> s
    iy = (cell // nf) >> s
    return iy * np.int64(1 << to_level) + ix


def collect_cell_stats(
    img: DataFrame,
    level: int,
    max_cell_rows: int = 8192,
    max_hot_cells: int = 4096,
    probe_depth: int = 6,
) -> CellStats:
    """Spatial-refinement statistics in (typically) ONE Spark job.

    Round 1 iterated: count at the base level, refine hot cells 3 levels
    deeper, re-count, repeat — 3-5 driver-blocking jobs that dominated the
    kNN serial floor.  Now: aggregate count+bbox once at a FINE level
    (base + probe_depth) and derive the identical refinement schedule and
    per-key stats by rolling the fine table up DRIVER-SIDE (pure NumPy):
    coarser counts are sums of fine counts and coarser bboxes are unions of
    fine bboxes, so the result is bit-identical to re-aggregating in Spark.
    Only a point-mass pathology (cells still hot at the fine level) pays an
    extra aggregation pass, scoped to those cells.

    At 10^12 rows the fine stats table is bounded by occupied fine cells
    (<= 67M at MAX_LEVEL); production would insert a tree of partial rollups
    — the math below is unchanged."""
    # fine-resolution stats rows: (cell id at `lvl`, lvl, cnt, bbox)
    cell_arr = np.empty(0, np.int64)
    lvl_arr = np.empty(0, np.int64)
    cnt_arr = np.empty(0, np.int64)
    bbox_arr = np.empty((0, 4), np.float64)  # min_x, min_y, max_x, max_y

    def agg_scope(scope: DataFrame, at_level: int) -> pd.DataFrame:
        return (
            scope.groupBy(
                F.expr(cells.cell_id_sql("x", "y", at_level)).alias("c")
            )
            .agg(
                F.count("*").alias("cnt"),
                F.min("x").alias("min_x"),
                F.min("y").alias("min_y"),
                F.max("x").alias("max_x"),
                F.max("y").alias("max_y"),
            )
            .toPandas()
        )

    fine = min(level + probe_depth, MAX_LEVEL)
    pdf = agg_scope(img, fine)
    cell_arr = pdf["c"].to_numpy(np.int64)
    lvl_arr = np.full(len(pdf), fine, np.int64)
    cnt_arr = pdf["cnt"].to_numpy(np.int64)
    bbox_arr = pdf[["min_x", "min_y", "max_x", "max_y"]].to_numpy(np.float64)

    def counts_at(at_level: int, mask: np.ndarray):
        """Roll the masked fine rows up to at_level: unique ancestor cells +
        summed counts (all masked rows have lvl >= at_level)."""
        # per-row coarsen honoring each row's own level
        anc = np.empty(int(mask.sum()), np.int64)
        sub_cells = cell_arr[mask]
        sub_lvls = lvl_arr[mask]
        for lv in np.unique(sub_lvls):
            m = sub_lvls == lv
            anc[m] = _coarsen(sub_cells[m], int(lv), at_level)
        uniq, inv = np.unique(anc, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, cnt_arr[mask])
        return uniq, sums, anc

    # derive the same schedule the iterative version produced: step by 3
    # from the base level, refining cells whose count exceeds max_cell_rows
    refinements: list[tuple[int, int, np.ndarray]] = []
    cur = level
    scope_mask = np.ones(len(cell_arr), dtype=bool)
    while True:
        uniq, sums, anc = counts_at(cur, scope_mask)
        hot_ids = uniq[sums > max_cell_rows]
        if len(hot_ids) == 0 or len(hot_ids) > max_hot_cells:
            break
        if cur >= fine:
            # point-mass pathology: still hot at the fine level -> one more
            # aggregation pass scoped to the hot cells, 6 levels deeper
            if fine >= MAX_LEVEL:
                break
            new_fine = min(fine + probe_depth, MAX_LEVEL)
            hot_list = ", ".join(str(int(c)) for c in hot_ids)
            scoped = img.filter(
                F.expr(f"{cells.cell_id_sql('x', 'y', fine)} IN ({hot_list})")
            )
            sub = agg_scope(scoped, new_fine)
            # replace the hot fine rows with their finer decomposition:
            # drop rows whose ancestor at `fine` is hot (all such rows sit
            # at lvl >= fine by construction)
            row_anc = np.empty(len(cell_arr), np.int64)
            for lv in np.unique(lvl_arr):
                m = lvl_arr == lv
                row_anc[m] = _coarsen(cell_arr[m], int(lv), fine)
            drop = np.isin(row_anc, hot_ids) & (lvl_arr >= fine)
            keep = ~drop
            cell_arr = np.concatenate([cell_arr[keep], sub["c"].to_numpy(np.int64)])
            lvl_arr = np.concatenate(
                [lvl_arr[keep], np.full(len(sub), new_fine, np.int64)]
            )
            cnt_arr = np.concatenate([cnt_arr[keep], sub["cnt"].to_numpy(np.int64)])
            bbox_arr = np.concatenate(
                [
                    bbox_arr[keep],
                    sub[["min_x", "min_y", "max_x", "max_y"]].to_numpy(np.float64),
                ]
            )
            scope_mask = np.concatenate(
                [scope_mask[keep], np.ones(len(sub), dtype=bool)]
            )
            fine = new_fine
            # cur stays: re-evaluate the same level against the finer table
            continue
        nxt = min(cur + 3, fine)
        refinements.append((cur, nxt, np.sort(hot_ids)))
        # narrow scope to rows under a hot cell (the iterative `scope`)
        cur_anc = np.empty(len(cell_arr), np.int64)
        for lv in np.unique(lvl_arr):
            m = lvl_arr == lv
            cur_anc[m] = _coarsen(cell_arr[m], int(lv), cur)
        scope_mask = scope_mask & np.isin(cur_anc, hot_ids)
        cur = nxt

    # final per-key stats: descend each fine row through the schedule, then
    # roll up (sum counts, union bboxes) per final key — identical to
    # re-aggregating in Spark at key_sql granularity
    key_level = np.full(len(cell_arr), level, np.int64)
    for from_lvl, to_lvl, hot in refinements:
        anc = np.empty(len(cell_arr), np.int64)
        for lv in np.unique(lvl_arr):
            m = lvl_arr == lv
            anc[m] = _coarsen(cell_arr[m], int(lv), from_lvl)
        m = (key_level == from_lvl) & np.isin(anc, hot)
        key_level[m] = to_lvl
    final_cell = np.empty(len(cell_arr), np.int64)
    for lv in np.unique(lvl_arr):
        for kl in np.unique(key_level):
            m = (lvl_arr == lv) & (key_level == kl)
            if m.any():
                final_cell[m] = _coarsen(cell_arr[m], int(lv), int(kl))
    keys_all = (key_level << LEVEL_SHIFT) + final_cell
    uniq, inv = np.unique(keys_all, return_inverse=True)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(counts, inv, cnt_arr)
    mnx = np.full(len(uniq), np.inf)
    mny = np.full(len(uniq), np.inf)
    mxx = np.full(len(uniq), -np.inf)
    mxy = np.full(len(uniq), -np.inf)
    np.minimum.at(mnx, inv, bbox_arr[:, 0])
    np.minimum.at(mny, inv, bbox_arr[:, 1])
    np.maximum.at(mxx, inv, bbox_arr[:, 2])
    np.maximum.at(mxy, inv, bbox_arr[:, 3])
    # hash-salt fan-out is capped by its bit budget (SALT_SHIFT): a cell
    # needing more than 4096 salts (~33.5M duplicate-coordinate rows at
    # defaults) degrades to coarser salting rather than corrupting keys
    salt_n = np.clip(
        -(-counts // max_cell_rows), 1, np.int64(1 << SALT_SHIFT)
    ).astype(np.int64)
    return CellStats(
        keys=uniq,
        counts=counts,
        min_x=mnx,
        min_y=mny,
        max_x=mxx,
        max_y=mxy,
        salt_n=salt_n,
        level=level,
        refinements=refinements,
    )


def _salted_images(spark: SparkSession, img: DataFrame, stats: CellStats) -> DataFrame:
    """Attach part_key = key<<SALT_SHIFT | salt; salt = pmod(xxhash64(id), n)."""
    salt_df = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"key": stats.keys, "salt_n": stats.salt_n})
        )
    )
    return (
        img.withColumn("key", F.expr(stats.key_sql("x", "y")))
        .join(salt_df, "key")
        .withColumn(
            "part_key",
            (F.col("key") * (1 << SALT_SHIFT))
            + F.pmod(F.xxhash64("image_id"), F.col("salt_n")),
        )
    )


def _candidate_part_keys(stats: CellStats) -> pd.DataFrame:
    """(key, part_key) exploded over salts — broadcast-joined to candidates
    so a probed cell probes ALL of its salted sub-trees."""
    reps = stats.salt_n
    key = np.repeat(stats.keys, reps)
    off = np.concatenate([[0], np.cumsum(reps)[:-1]])
    salt = np.arange(reps.sum(), dtype=np.int64) - np.repeat(off, reps)
    return pd.DataFrame({"key": key, "part_key": (key << SALT_SHIFT) + salt})


# ------------------------------------------------------- candidate pruning


def _knn_candidates(
    spark: SparkSession,
    queries: DataFrame,
    stats: CellStats,
    k: int,
    exclude_home: bool = False,
    spread: bool = True,
) -> DataFrame:
    """queries (query_id, x, y [, bound]) -> (query_id, x, y, cell_id)
    candidate pairs.

    Vectorized cross-cell pruning (mapInPandas over query batches against
    broadcast cell stats).  The per-query admission bound is
    ``min(count_bound, provided bound)`` where:

    * count_bound: cells sorted by farthest-corner distance (dmax) are
      accumulated until their counts cover k; the dmax at that point
      upper-bounds the kth-NN distance (>= k points provably lie within
      it) — computable from statistics alone;
    * provided bound (optional ``bound`` column): the TRUE home-cell kth
      distance from a phase-1 probe — usually far tighter.

    Cells with min-dist <= bound become candidates — the cross-cell
    ``shouldTraverse`` (``src/_kdtree_median.hpp:136-138``).  With
    exclude_home=True the query's own cell (its ``home_key`` column) is
    skipped — it was already fully probed in phase 1.
    """
    bc = spark.sparkContext.broadcast(
        (stats.keys, stats.counts, stats.min_x, stats.min_y, stats.max_x, stats.max_y)
    )
    has_bound = "bound" in queries.columns
    if spread:
        # queries usually arrive as one small parquet file = ONE partition;
        # spread the vectorized pruning work across the cluster first
        # (spread=False when the input already comes out of a shuffle)
        queries = queries.repartition(_parallelism(spark))

    def gen(batches):
        keys, counts, mnx, mny, mxx, mxy = bc.value
        C = len(keys)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            qx = pdf["x"].to_numpy(np.float64)
            qy = pdf["y"].to_numpy(np.float64)
            given = (
                pdf["bound"].to_numpy(np.float64)
                if has_bound
                else np.full(len(pdf), np.inf)
            )
            home = (
                pdf["home_key"].to_numpy(np.int64)
                if exclude_home
                else None
            )
            chunk = max(64, 2_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                px, py = qx[sl][:, None], qy[sl][:, None]
                dmin = cells.bbox_min_dist(px, py, mnx[None, :], mny[None, :], mxx[None, :], mxy[None, :])
                gb = given[sl]
                bound = gb.copy()
                nb = np.nonzero(~np.isfinite(gb))[0]
                if len(nb) > 0:
                    # count-bound only for the (few) rows lacking a phase-1
                    # bound — never the whole chunk
                    dmax = cells.bbox_max_dist(
                        px[nb], py[nb], mnx[None, :], mny[None, :], mxx[None, :], mxy[None, :]
                    )
                    order = np.argsort(dmax, axis=1, kind="stable")
                    cum = np.cumsum(counts[order], axis=1)
                    need = np.argmax(cum >= k, axis=1)
                    enough = cum[:, -1] >= k
                    need = np.where(enough, need, C - 1)
                    rows = np.arange(len(need))
                    cb = np.where(
                        enough, np.take_along_axis(dmax, order, axis=1)[rows, need], np.inf
                    )
                    bound[nb] = cb
                adm = dmin <= bound[:, None]
                if home is not None:
                    adm &= keys[None, :] != home[sl][:, None]
                qi, ci = np.nonzero(adm)
                out = pdf.iloc[qi + c0][["query_id", "x", "y"]].copy()
                out["key"] = keys[ci]
                yield out

    return queries.mapInPandas(
        gen, schema="query_id string, x double, y double, key long"
    )


# ---------------------------------------------------------------- kNN join


def _make_knn_group(k: int, carry_xy: bool = False, max_radius: float = np.inf):
    """Cogroup kernel: build a k-d tree over the cell's images, run the
    batched bounded kNN for the cell's candidate queries (ties broken by
    image_id lexicographic rank so the global merge is deterministic).
    carry_xy=True passes the query coordinates through (lets phase 2 derive
    its inputs from phase-1 output without re-joining the query table).
    max_radius seeds the admission bound (reference Q2's maxRadius,
    ``src/_kdtree_median.hpp:456-472``)."""

    def knn_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = {"query_id": [], "image_id": [], "dist": []}
        if carry_xy:
            cols.update({"x": [], "y": []})
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(cols)
        pts = np.column_stack(
            [right["x"].to_numpy(np.float64), right["y"].to_numpy(np.float64)]
        )
        ids = right["image_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))  # lexicographic rank
        tree = kernel.build(pts)
        qpts = np.column_stack(
            [left["x"].to_numpy(np.float64), left["y"].to_numpy(np.float64)]
        )
        qi, idx, dist = kernel.knn(tree, qpts, k, tie_key=tie, max_radius=max_radius)
        out = {
            "query_id": left["query_id"].to_numpy()[qi],
            "image_id": ids[idx],
            "dist": dist,
        }
        if carry_xy:
            out["x"] = qpts[qi, 0]
            out["y"] = qpts[qi, 1]
        return pd.DataFrame(out)

    return knn_group


def knn_join(
    spark: SparkSession,
    images: DataFrame,
    queries: DataFrame,
    k: int = 8,
    level: int | None = None,
    max_cell_rows: int = 8192,
    n_images_hint: int | None = None,
    max_radius: float = float("inf"),
) -> DataFrame:
    """Exact kNN join: for every query row, its k nearest images by planar
    L2 over phash-derived (lon, lat), ties broken by image_id; neighbors
    beyond ``max_radius`` are excluded (reference Q2's bounded entry,
    ``src/_kdtree_median.hpp:456-472``).

    Returns (query_id, image_id, dist, rank) with rank in 1..k.
    Generalizes reference Q1/Q2 (``src/_kdtree_median.hpp:332-359``) from a
    single query to a query table.
    """
    img = with_coords(images).select("image_id", "x", "y")
    if level is None:
        n = n_images_hint if n_images_hint is not None else img.count()
        level = cells.level_for_count(n)
    stats = collect_cell_stats(img, level, max_cell_rows)
    img_salted = _salted_images(spark, img, stats)
    part_keys = F.broadcast(spark.createDataFrame(_candidate_part_keys(stats)))
    return _knn_join_on_index(
        spark, img_salted, stats, part_keys, queries, k, max_radius=max_radius
    )


def _knn_join_on_index(
    spark: SparkSession,
    img_salted: DataFrame,
    stats: CellStats,
    part_keys: DataFrame,
    queries: DataFrame,
    k: int,
    max_radius: float = float("inf"),
) -> DataFrame:
    release_caches()  # intermediates of the PREVIOUS join call
    q = queries.select(
        "query_id", F.col("qlon").alias("x"), F.col("qlat").alias("y")
    )
    schema = "query_id string, image_id string, dist double"
    key_expr = stats.key_sql("x", "y")

    # ---- phase 1: probe each query's HOME cell (all salts of it) --------
    # This is the first descent of the reference search: it yields a TRUE
    # kth-distance bound per query, so phase 2 probes almost nothing.
    q_home = q.withColumn("key", F.expr(key_expr))
    p1_cand = q_home.join(part_keys, "key").select("query_id", "x", "y", "part_key")
    p1 = (
        p1_cand.groupby("part_key")
        .cogroup(img_salted.groupby("part_key"))
        .applyInPandas(
            _make_knn_group(k, carry_xy=True, max_radius=max_radius),
            schema=schema + ", x double, y double",
        )
    )
    # ONE window pass (the only Q-sized shuffle) yields rank AND the
    # per-query bound inputs (cnt, kth distance) — no separate bounds agg
    w = Window.partitionBy("query_id").orderBy("dist", "image_id")
    wq = Window.partitionBy("query_id")
    p1_topk = (
        p1.withColumn("rank", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wq))
        .filter(F.col("rank") <= k)
    )
    # p1_topk feeds bound rows, the p2 exclusion AND the final union;
    # without caching the cogroup UDF subtree executes 3x per plan
    # (verified via explain("formatted")).  It is tiny (<= Q*k rows).  The
    # cache fills during the p2_cand materialization below — no separate
    # count() job for it (round-1 ran one: pure serial-floor waste).
    p1_topk = _register_cache(p1_topk)

    # ---- phase 2: probe remaining cells within the bound ----------------
    # Home is always excluded: phase 1 returned min(k, |home|) rows, which
    # covers the home cell completely in both the cnt>=k and cnt<k cases.
    # Bound rows come straight from p1_topk (rank == min(k, cnt) row) — the
    # query coordinates were carried through the kernel, so no join back to
    # the query table is needed.  With max_radius: phase-1 may return FEWER
    # than min(k, cnt) rows (all under the radius cap), so the bound row is
    # the LAST surviving rank and the bound caps at max_radius.
    mr = float(max_radius)
    last_rank = F.max("rank").over(wq)
    bound_rows = p1_topk.withColumn("last_rank", last_rank).filter(
        F.col("rank") == F.col("last_rank")
    ).select(
        "query_id",
        "x",
        "y",
        F.least(
            F.when(
                (F.col("cnt") >= k) & (F.col("rank") == k), F.col("dist")
            ).otherwise(F.lit(float("inf"))),
            F.lit(mr),
        ).alias("bound"),
        F.expr(key_expr).alias("home_key"),
    )
    # queries whose home cell holds no images never reach p1: recover them
    # with a BROADCAST anti join against the (small) part_keys table.
    # (With a finite max_radius a query CAN also vanish from p1 because all
    # home-cell points are out of radius — those queries are NOT in
    # bound_rows; recover them through the same anti join on p1 query ids.)
    absent = (
        q_home.join(part_keys, "key", "left_anti")
        .select(
            "query_id", "x", "y",
            F.lit(mr).alias("bound"),
            F.col("key").alias("home_key"),
        )
    )
    if np.isfinite(mr):
        emptied = (
            q_home.join(part_keys, "key", "left_semi")
            .join(
                F.broadcast(p1_topk.select("query_id").distinct()),
                "query_id",
                "left_anti",
            )
            .select(
                "query_id", "x", "y",
                F.lit(mr).alias("bound"),
                F.col("key").alias("home_key"),
            )
        )
        absent = absent.unionByName(emptied)
    q_b = bound_rows.unionByName(absent)
    p2_cand = _knn_candidates(spark, q_b, stats, k, exclude_home=True, spread=False)
    p2_cand = _register_cache(
        p2_cand.join(part_keys, "key").select("query_id", "x", "y", "part_key")
    )
    # ONE materialization job: fills the p1_topk cache (upstream) and the
    # p2_cand cache (consumed by the probe AND two broadcast subqueries)
    p2_cand.count()
    # probe only the cells phase 2 actually touches — without this the
    # whole corpus re-shuffles for a handful of boundary queries
    probe_keys = F.broadcast(p2_cand.select("part_key").distinct())
    img_probe = img_salted.join(probe_keys, "part_key", "left_semi")
    p2 = (
        p2_cand.groupby("part_key")
        .cogroup(img_probe.groupby("part_key"))
        .applyInPandas(_make_knn_group(k, max_radius=max_radius), schema=schema)
    )

    # re-rank ONLY queries that phase 2 probed (broadcast semi/anti joins —
    # no Q-sized shuffle); everyone else's phase-1 ranks are already final
    affected = F.broadcast(p2_cand.select("query_id").distinct())
    untouched = p1_topk.join(affected, "query_id", "left_anti").select(
        "query_id", "image_id", "dist", F.col("rank").cast("int")
    )
    touched_p1 = p1_topk.join(affected, "query_id", "left_semi").select(
        "query_id", "image_id", "dist"
    )
    reranked = (
        touched_p1.unionByName(p2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "image_id", "dist", F.col("rank").cast("int"))
    )
    # p1_topk/p2_cand stay persisted until the NEXT join call releases them
    # (they must outlive the lazy returned plan's execution)
    return untouched.unionByName(reranked)


# ------------------------------------------------------------- GeoIndex


class GeoIndex:
    """Build-once / query-many index over an image corpus — the API shape
    of the reference (construct ``KDTree`` once, call ``nearest`` many
    times, ``src/_kdtree_base.hpp:38-55``), distributed.

    The salted, cell-keyed projection of the corpus is persisted so repeated
    query batches skip the scan + stats + salt join; each query batch still
    pays one cogroup shuffle (at warehouse scale the projection would be
    bucket-stored instead — see PLANS.md).
    """

    def __init__(
        self,
        spark: SparkSession,
        images: DataFrame,
        level: int | None = None,
        max_cell_rows: int = 8192,
        n_images_hint: int | None = None,
    ):
        self.spark = spark
        img = with_coords(images).select("image_id", "x", "y")
        if level is None:
            n = n_images_hint if n_images_hint is not None else img.count()
            level = cells.level_for_count(n)
        self.level = level
        self.img = img
        self.stats = collect_cell_stats(img, level, max_cell_rows)
        self.img_salted = _salted_images(spark, img, self.stats).persist()
        self.img_salted.count()  # materialize
        self.part_keys = F.broadcast(
            spark.createDataFrame(_candidate_part_keys(self.stats))
        )

    @property
    def n_rows(self) -> int:
        return self.stats.total

    def lineage(self) -> DataFrame:
        """Per-cell lineage metrics (refined key, count, bbox)."""
        return (
            self.img.withColumn("cell_id", F.expr(self.stats.key_sql("x", "y")))
            .groupBy("cell_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("x").alias("min_x"),
                F.min("y").alias("min_y"),
                F.max("x").alias("max_x"),
                F.max("y").alias("max_y"),
            )
        )

    def knn_join(
        self, queries: DataFrame, k: int = 8, max_radius: float = float("inf")
    ) -> DataFrame:
        return _knn_join_on_index(
            self.spark,
            self.img_salted,
            self.stats,
            self.part_keys,
            queries,
            k,
            max_radius=max_radius,
        )

    def radius_join(self, queries: DataFrame, r: float) -> DataFrame:
        return _radius_join_on_index(
            self.spark, self.img_salted, self.stats, self.part_keys, queries, r
        )

    def nearest(self, qlat: float, qlon: float, k: int = 1):
        """Single-point convenience (the reference's ``nearest``): returns
        list of Rows (image_id, dist, rank)."""
        q = self.spark.createDataFrame(
            pd.DataFrame({"query_id": ["q0"], "qlat": [qlat], "qlon": [qlon]})
        )
        return self.knn_join(q, k=k).select("image_id", "dist", "rank").collect()

    def unpersist(self) -> None:
        self.img_salted.unpersist()


# ------------------------------------------------------------- radius join


def radius_join(
    spark: SparkSession,
    images: DataFrame,
    queries: DataFrame,
    r: float,
    level: int | None = None,
    max_cell_rows: int = 8192,
    n_images_hint: int | None = None,
) -> DataFrame:
    """All (query, image) pairs with planar L2 distance <= r (reference Q3:
    kNN entry with finite maxRadius, ``src/_kdtree_median.hpp:131-137``)."""
    img = with_coords(images).select("image_id", "x", "y")
    if level is None:
        n = n_images_hint if n_images_hint is not None else img.count()
        level = cells.level_for_count(n)
    stats = collect_cell_stats(img, level, max_cell_rows)
    img_salted = _salted_images(spark, img, stats)
    part_keys = F.broadcast(spark.createDataFrame(_candidate_part_keys(stats)))
    return _radius_join_on_index(spark, img_salted, stats, part_keys, queries, r)


def _radius_join_on_index(
    spark: SparkSession,
    img_salted: DataFrame,
    stats: CellStats,
    part_keys: DataFrame,
    queries: DataFrame,
    r: float,
) -> DataFrame:
    q = queries.select("query_id", F.col("qlon").alias("x"), F.col("qlat").alias("y"))
    bc = spark.sparkContext.broadcast(
        (stats.keys, stats.min_x, stats.min_y, stats.max_x, stats.max_y)
    )
    q = q.repartition(_parallelism(spark))

    def gen(batches):
        keys, mnx, mny, mxx, mxy = bc.value
        C = len(keys)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            qx = pdf["x"].to_numpy(np.float64)
            qy = pdf["y"].to_numpy(np.float64)
            chunk = max(64, 2_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                dmin = cells.bbox_min_dist(
                    qx[sl][:, None], qy[sl][:, None],
                    mnx[None, :], mny[None, :], mxx[None, :], mxy[None, :],
                )
                qi, ci = np.nonzero(dmin <= r)
                out = pdf.iloc[qi + c0][["query_id", "x", "y"]].copy()
                out["key"] = keys[ci]
                yield out

    cand = q.mapInPandas(gen, schema="query_id string, x double, y double, key long")
    cand = cand.join(part_keys, "key").select("query_id", "x", "y", "part_key")

    def radius_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "image_id": [], "dist": []})
        pts = np.column_stack(
            [right["x"].to_numpy(np.float64), right["y"].to_numpy(np.float64)]
        )
        tree = kernel.build(pts)
        qpts = np.column_stack(
            [left["x"].to_numpy(np.float64), left["y"].to_numpy(np.float64)]
        )
        qi, idx, dist = kernel.radius(tree, qpts, r)
        return pd.DataFrame(
            {
                "query_id": left["query_id"].to_numpy()[qi],
                "image_id": right["image_id"].to_numpy()[idx],
                "dist": dist,
            }
        )

    return (
        cand.groupby("part_key")
        .cogroup(img_salted.groupby("part_key"))
        .applyInPandas(
            radius_group, schema="query_id string, image_id string, dist double"
        )
    )


# --------------------------------------------------------- point-in-polygon


def _polygon_arrays(polygons_pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    """poly_id -> (E,4) edge array [x1,y1,x2,y2] over all rings."""
    out: dict[str, np.ndarray] = {}
    for (pid, ring), g in polygons_pdf.sort_values(["poly_id", "ring", "seq"]).groupby(
        ["poly_id", "ring"]
    ):
        xs = g["x"].to_numpy(np.float64)
        ys = g["y"].to_numpy(np.float64)
        e = np.column_stack([xs, ys, np.roll(xs, -1), np.roll(ys, -1)])
        out[pid] = np.vstack([out[pid], e]) if pid in out else e
    return out


def ray_cast_inside(px: np.ndarray, py: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting (P x E).  A point is inside iff a
    horizontal ray to +x crosses an odd number of edges (all rings — holes
    naturally subtract).  Crossing rule matches the oracle SQL term for
    term so results are identical."""
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] + x1[
            None, :
        ]
    crossing = cond & (px[:, None] < xs)
    return crossing.sum(axis=1) % 2 == 1


def pip_join(
    spark: SparkSession,
    images: DataFrame,
    polygons: DataFrame,
    level: int = 6,
    mode: str = "broadcast",
) -> DataFrame:
    """(image_id, poly_id) pairs where the image point lies inside the
    polygon (even-odd ray cast; SURVEY §2.4).

    mode="broadcast" (default, small polygon tables): covering cells are
    enumerated driver-side and broadcast, so the only shuffle is the
    images' groupBy.  mode="distributed" (large polygon tables): identical
    semantics with NO driver-side polygon state — see pip_join_distributed."""
    if mode == "distributed":
        return pip_join_distributed(spark, images, polygons, level)
    poly_pdf = polygons.toPandas()
    edges = _polygon_arrays(poly_pdf)
    # covering cells per polygon bbox at `level` (coarse prefilter)
    rows = []
    n = 1 << level
    for pid, e in edges.items():
        mnx, mxx = min(e[:, 0].min(), e[:, 2].min()), max(e[:, 0].max(), e[:, 2].max())
        mny, mxy = min(e[:, 1].min(), e[:, 3].min()), max(e[:, 1].max(), e[:, 3].max())
        ix0 = int(cells.axis_index(np.array([mnx]), cells.X_MIN, cells.X_SPAN, n)[0])
        ix1 = int(cells.axis_index(np.array([mxx]), cells.X_MIN, cells.X_SPAN, n)[0])
        iy0 = int(cells.axis_index(np.array([mny]), cells.Y_MIN, cells.Y_SPAN, n)[0])
        iy1 = int(cells.axis_index(np.array([mxy]), cells.Y_MIN, cells.Y_SPAN, n)[0])
        for iy in range(iy0, iy1 + 1):
            for ix in range(ix0, ix1 + 1):
                rows.append((pid, iy * n + ix))
    cover = F.broadcast(
        spark.createDataFrame(pd.DataFrame(rows, columns=["poly_id", "cell_id"]))
    )

    img = with_cell(with_coords(images).select("image_id", "x", "y"), level)
    cand = img.join(cover, "cell_id").select("image_id", "x", "y", "poly_id")

    bc = spark.sparkContext.broadcast(edges)

    def refine(batches):
        ed = bc.value
        for pdf in batches:
            for pid, g in pdf.groupby("poly_id"):  # loop over polygons only
                inside = ray_cast_inside(
                    g["x"].to_numpy(np.float64), g["y"].to_numpy(np.float64), ed[pid]
                )
                if inside.any():
                    yield g.loc[inside, ["image_id", "poly_id"]]

    return cand.mapInPandas(refine, schema="image_id string, poly_id string")


def pip_join_distributed(
    spark: SparkSession,
    images: DataFrame,
    polygons: DataFrame,
    level: int = 6,
) -> DataFrame:
    """Point-in-polygon for LARGE polygon tables: no driver-side polygon
    state, no broadcast of polygon geometry.

    Plan (all shuffles are equi-joins on bounded keys):
      1. edges from the vertex table with a window (next vertex per ring,
         wrapping) — one shuffle on (poly_id, ring);
      2. polygon bboxes -> covering cells exploded with built-in
         sequence()/transform() (the raster_vector_join pattern);
      3. candidates = images equi-joined to cover cells on cell_id;
      4. refinement: cogroup candidates x edges on poly_id, vectorized
         even-odd ray cast per group (the same kernel as the broadcast
         path, so results are identical).
    Skew note: a continent-sized polygon makes one cogroup group large;
    the kernel chunks the point side, and the candidate prefilter (bbox
    cover cells) keeps the group to points near the polygon."""
    n = 1 << level

    wcnt = Window.partitionBy("poly_id", "ring")
    v = polygons.withColumn("cnt", F.count("*").over(wcnt))
    a = v.alias("a")
    b = v.alias("b")
    edges = a.join(
        b,
        (F.col("a.poly_id") == F.col("b.poly_id"))
        & (F.col("a.ring") == F.col("b.ring"))
        & (F.col("b.seq") == (F.col("a.seq") + 1) % F.col("a.cnt")),
    ).select(
        F.col("a.poly_id").alias("poly_id"),
        F.col("a.x").alias("x1"),
        F.col("a.y").alias("y1"),
        F.col("b.x").alias("x2"),
        F.col("b.y").alias("y2"),
    )

    bbox = polygons.groupBy("poly_id").agg(
        F.min("x").alias("mnx"),
        F.min("y").alias("mny"),
        F.max("x").alias("mxx"),
        F.max("y").alias("mxy"),
    )

    def axis_sql(expr: str, vmin: float, vspan: float) -> str:
        return (
            f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
            f"CAST(floor((({expr}) - {cells.sql_double(vmin)}) / "
            f"{cells.sql_double(vspan)} * {cells.sql_double(float(n))}) AS BIGINT)))"
        )

    cover = bbox.select(
        "poly_id",
        F.explode(
            F.expr(
                f"""flatten(transform(
                    sequence({axis_sql('mny', cells.Y_MIN, cells.Y_SPAN)},
                             {axis_sql('mxy', cells.Y_MIN, cells.Y_SPAN)}),
                    iy -> transform(
                      sequence({axis_sql('mnx', cells.X_MIN, cells.X_SPAN)},
                               {axis_sql('mxx', cells.X_MIN, cells.X_SPAN)}),
                      ix -> iy * CAST({n} AS BIGINT) + ix)))"""
            )
        ).alias("cell_id"),
    )

    img = with_cell(with_coords(images).select("image_id", "x", "y"), level)
    cand = img.join(cover, "cell_id").select("image_id", "x", "y", "poly_id")

    def refine(points: pd.DataFrame, edge_rows: pd.DataFrame) -> pd.DataFrame:
        if len(points) == 0 or len(edge_rows) == 0:
            return pd.DataFrame({"image_id": [], "poly_id": []})
        e = edge_rows[["x1", "y1", "x2", "y2"]].to_numpy(np.float64)
        out = []
        pid = edge_rows["poly_id"].iloc[0]
        for c0 in range(0, len(points), 8192):  # memory-bounding chunks
            g = points.iloc[c0 : c0 + 8192]
            inside = ray_cast_inside(
                g["x"].to_numpy(np.float64), g["y"].to_numpy(np.float64), e
            )
            if inside.any():
                out.append(
                    pd.DataFrame(
                        {"image_id": g["image_id"].to_numpy()[inside], "poly_id": pid}
                    )
                )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame({"image_id": [], "poly_id": []})
        )

    return (
        cand.groupby("poly_id")
        .cogroup(edges.groupby("poly_id"))
        .applyInPandas(refine, schema="image_id string, poly_id string")
    )


# -------------------------------------------------- raster <-> vector join


def footprints_from_polygons(polygons: DataFrame) -> DataFrame:
    """Polygon bounding boxes (the 'vector footprint' side)."""
    return polygons.groupBy("poly_id").agg(
        F.min("x").alias("mnx"),
        F.min("y").alias("mny"),
        F.max("x").alias("mxx"),
        F.max("y").alias("mxy"),
    )


def raster_vector_join(
    spark: SparkSession,
    tiles: DataFrame,
    footprints: DataFrame,
    level: int = 4,
) -> DataFrame:
    """(tile_id, poly_id) pairs whose bboxes overlap (closed intervals).

    Scalable range-join pattern (SURVEY §2.4): both sides explode their
    bbox into covering cells at a coarse level, equi-join on cell_id
    (co-partitioned shuffle join — no theta join), then the exact interval
    predicate refines and DISTINCT dedupes multi-cell matches."""
    n = 1 << level

    def axis_sql(expr: str, vmin: float, vspan: float) -> str:
        return (
            f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
            f"CAST(floor((({expr}) - {cells.sql_double(vmin)}) / "
            f"{cells.sql_double(vspan)} * {cells.sql_double(float(n))}) AS BIGINT)))"
        )

    def cover(df: DataFrame, idc: str, mnx: str, mny: str, mxx: str, mxy: str):
        # explode bbox into its covering cell range via sequence()
        return df.select(
            idc,
            mnx,
            mny,
            mxx,
            mxy,
            F.explode(
                F.expr(
                    f"""flatten(transform(
                        sequence({axis_sql(mny, cells.Y_MIN, cells.Y_SPAN)},
                                 {axis_sql(mxy, cells.Y_MIN, cells.Y_SPAN)}),
                        iy -> transform(
                          sequence({axis_sql(mnx, cells.X_MIN, cells.X_SPAN)},
                                   {axis_sql(mxx, cells.X_MIN, cells.X_SPAN)}),
                          ix -> iy * CAST({n} AS BIGINT) + ix)))"""
                )
            ).alias("cell_id"),
        )

    t = cover(tiles, "tile_id", "min_x", "min_y", "max_x", "max_y")
    p = cover(footprints, "poly_id", "mnx", "mny", "mxx", "mxy")
    joined = t.join(p, "cell_id").where(
        (F.col("mnx") <= F.col("max_x"))
        & (F.col("mxx") >= F.col("min_x"))
        & (F.col("mny") <= F.col("max_y"))
        & (F.col("mxy") >= F.col("min_y"))
    )
    return joined.select("tile_id", "poly_id").distinct()


# ---------------------------------------------------------------- lineage


def cell_lineage(images: DataFrame, level: int) -> DataFrame:
    """Per-cell lineage/metrics rows (north_rule: per-partition lineage):
    cell id, row count, data bbox, estimated tree depth."""
    img = with_cell(with_coords(images), level)
    return img.groupBy("cell_id").agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.min("y").alias("min_y"),
        F.max("x").alias("max_x"),
        F.max("y").alias("max_y"),
        F.ceil(F.log2(F.greatest(F.count("*") / 32.0, F.lit(1.0)))).alias(
            "tree_depth"
        ),
    )

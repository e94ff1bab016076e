"""Distributed SO(3) and SE(3) kNN joins over pose tables.

The reference's raison d'être is nearest-neighbor search in rotation /
rigid-motion spaces for motion planning (``/root/reference/README.md:6``;
active test matrix ``test/kdtree_test.cpp:385-417`` runs StaticBuildAndQuery
and dynamic Add/KNN for SO3, SO3Alt, SO3RL, SE3 and weighted SE3).  This
module is the distributed twin, following the exact plan shape of the geo
engine (``sparkkd.engine``): coarse space partition as the shuffle key,
driver-side pruning stats, per-cell NumPy kernels inside one Arrow cogroup,
and a window merge.

SO(3) — antipodal R^4 reduction (reference SO3RL space,
``src/_so3rlspace.hpp:36-54``): for unit quaternions the angular metric
``arccos(|a.b|)`` is strictly increasing in ``min(|a-b|, |a+b|)``, so exact
angular kNN over canonicalized points (q ~ -q collapsed to one sign) equals
Euclidean R^4 kNN probed at BOTH +q and -q with the per-point best kept.
The coarse partition is a 4-D grid over the canonicalized coefficients —
the distributed analogue of the reference's 4-volume radix partition
(``src/_so3space.hpp:594-658``).

SE(3) — compound space (``src/_spaces.hpp:369-421``): distance is
``rot_weight * angular + trans_weight * L2(translation)``.  The partition
key is a 3-D grid over translation; rotation contributes 0 to the cell
lower bound and its max (pi/2) to the count-bound upper bound, so pruning
stays EXACT without indexing the 7-D product space.

IEEE parity with the DuckDB oracle: the final ranking distance is computed
with term-for-term the same expression the oracle uses —
``arccos(min(1, |qw*pw + qx*px + qy*py + qz*pz|))`` with left-associated
additions (NumPy elementwise adds in the same order) — so hash-exact
comparison holds.  Canonicalization sign flips are exact in IEEE, so
|dot(±a, ±b)| is bit-identical to |dot(a, b)|.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import kernel

SALT_BITS = 12

QCOLS = ("qw", "qx", "qy", "qz")
TCOLS = ("tx", "ty", "tz")


# ------------------------------------------------------------ SQL helpers


def canon_sign_sql() -> str:
    """Sign that makes the first nonzero quaternion coefficient positive
    (q and -q name the same rotation; both engines and NumPy share this
    rule).  Random unit quaternions have qw != 0 a.s.; the chain keeps the
    rule total anyway."""
    return (
        "(CASE WHEN qw > 0 THEN 1.0 WHEN qw < 0 THEN -1.0"
        " WHEN qx > 0 THEN 1.0 WHEN qx < 0 THEN -1.0"
        " WHEN qy > 0 THEN 1.0 WHEN qy < 0 THEN -1.0"
        " WHEN qz >= 0 THEN 1.0 ELSE -1.0 END)"
    )


def canon_sign_np(q: np.ndarray) -> np.ndarray:
    """NumPy twin of canon_sign_sql (q: (n, 4))."""
    s = np.ones(len(q))
    undecided = np.ones(len(q), dtype=bool)
    for j in range(4):
        col = q[:, j]
        neg = undecided & (col < 0)
        s[neg] = -1.0
        undecided &= col == 0
        if j == 3:
            break
    return s


def _axis_idx_sql(expr: str, vmin: float, vspan: float, n: int) -> str:
    return (
        f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((({expr}) - CAST({vmin!r} AS DOUBLE)) / "
        f"CAST({vspan!r} AS DOUBLE) * CAST({float(n)!r} AS DOUBLE)) AS BIGINT)))"
    )


def so3_cell_sql(level: int) -> str:
    """4-D grid id over the CANONICALIZED coefficients in [-1, 1]^4."""
    n = 1 << level
    s = canon_sign_sql()
    parts = [_axis_idx_sql(f"({s} * {c})", -1.0, 2.0, n) for c in QCOLS]
    expr = parts[0]
    for p in parts[1:]:
        expr = f"(({expr}) * CAST({n} AS BIGINT) + {p})"
    return expr


def trans_cell_sql(bounds: list[tuple[float, float]], level: int) -> str:
    """3-D grid id over translation with DATA-DERIVED bounds (literals, so
    the expression is identical across the stats and salted passes)."""
    n = 1 << level
    parts = [
        _axis_idx_sql(c, lo, max(hi - lo, 1e-9), n)
        for c, (lo, hi) in zip(TCOLS, bounds)
    ]
    expr = parts[0]
    for p in parts[1:]:
        expr = f"(({expr}) * CAST({n} AS BIGINT) + {p})"
    return expr


# ------------------------------------------------------------------ stats


@dataclass
class PoseCellStats:
    keys: np.ndarray  # (C,) int64 cell ids
    counts: np.ndarray  # (C,) int64
    lo: np.ndarray  # (C, d) per-cell data bbox lows (d=4 rot / d=3 trans)
    hi: np.ndarray  # (C, d)
    salt_n: np.ndarray  # (C,) int64

    @property
    def total(self) -> int:
        return int(self.counts.sum())


def _collect_stats(
    df: DataFrame, cell_expr: str, dim_cols: list[str], max_cell_rows: int
) -> PoseCellStats:
    aggs = [F.count("*").alias("cnt")]
    for c in dim_cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    pdf = (
        df.groupBy(F.expr(cell_expr).alias("key")).agg(*aggs).toPandas()
    ).sort_values("key")
    counts = pdf["cnt"].to_numpy(np.int64)
    return PoseCellStats(
        keys=pdf["key"].to_numpy(np.int64),
        counts=counts,
        lo=pdf[[f"lo_{c}" for c in dim_cols]].to_numpy(np.float64),
        hi=pdf[[f"hi_{c}" for c in dim_cols]].to_numpy(np.float64),
        salt_n=np.clip(-(-counts // max_cell_rows), 1, 1 << SALT_BITS).astype(
            np.int64
        ),
    )


def _salted(df: DataFrame, spark: SparkSession, stats: PoseCellStats,
            cell_expr: str, id_col: str) -> DataFrame:
    salt_df = F.broadcast(
        spark.createDataFrame(pd.DataFrame({"key": stats.keys, "salt_n": stats.salt_n}))
    )
    return (
        df.withColumn("key", F.expr(cell_expr))
        .join(salt_df, "key")
        .withColumn(
            "part_key",
            (F.col("key") * (1 << SALT_BITS))
            + F.pmod(F.xxhash64(id_col), F.col("salt_n")),
        )
    )


def _part_keys(spark: SparkSession, stats: PoseCellStats) -> DataFrame:
    reps = stats.salt_n
    key = np.repeat(stats.keys, reps)
    off = np.concatenate([[0], np.cumsum(reps)[:-1]])
    salt = np.arange(reps.sum(), dtype=np.int64) - np.repeat(off, reps)
    return F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"key": key, "part_key": (key << SALT_BITS) + salt})
        )
    )


def _bbox_min_max_dist(p: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """(Q, C) min and max L2 distances from points (Q, d) to boxes (C, d);
    the d-generic twin of cells.bbox_min_dist / bbox_max_dist."""
    dmin2 = np.zeros((len(p), len(lo)))
    dmax2 = np.zeros((len(p), len(lo)))
    for j in range(p.shape[1]):
        pj = p[:, j][:, None]
        a = lo[:, j][None, :] - pj
        b = pj - hi[:, j][None, :]
        m = np.maximum(np.maximum(a, b), 0.0)
        dmin2 += m * m
        mx = np.maximum(np.abs(a), np.abs(b))
        dmax2 += mx * mx
    return np.sqrt(dmin2), np.sqrt(dmax2)


def _count_bound(dmin, dmax, counts, k):
    """Per-row admission bound: walk cells in ascending dmax until their
    counts cover k — that dmax upper-bounds the kth-NN distance (same
    reasoning as engine._knn_candidates)."""
    order = np.argsort(dmax, axis=1, kind="stable")
    cum = np.cumsum(counts[order], axis=1)
    need = np.argmax(cum >= k, axis=1)
    enough = cum[:, -1] >= k
    need = np.where(enough, need, dmax.shape[1] - 1)
    rows = np.arange(len(need))
    return np.where(
        enough, np.take_along_axis(dmax, order, axis=1)[rows, need], np.inf
    )


import math as _math

# np.arccos is NumPy's SIMD implementation and differs from libm's acos by
# 1 ulp on ~1/3 of inputs; DuckDB (and CPython's math.acos) call libm.  The
# FINAL reported metric must be bit-identical to the oracle, so it goes
# through libm — only over the small candidate set, never the hot loop.
_ACOS_LIBM = np.frompyfunc(_math.acos, 1, 1)


def acos_exact(x: np.ndarray) -> np.ndarray:
    return _ACOS_LIBM(x).astype(np.float64)


def _angular_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """acos(min(1, |dot|)) with the ORACLE's exact semantics: left-
    associated adds ((w+x)+y)+z and libm acos — bit-identical to the SQL
    rendering in both Spark-side NumPy and DuckDB."""
    dot = a[:, 0] * b[:, 0]
    dot = dot + a[:, 1] * b[:, 1]
    dot = dot + a[:, 2] * b[:, 2]
    dot = dot + a[:, 3] * b[:, 3]
    return acos_exact(np.minimum(1.0, np.abs(dot)))


def level_for_poses(n_rows: int, dims: int, target: int = 192, max_level: int = 6) -> int:
    """Per-axis log2 resolution so occupied cells hold O(target) rows
    (2^(dims*level) total cells; occupancy is data-dependent — salting
    absorbs the rest)."""
    import math

    if n_rows <= target:
        return 1
    lvl = int(math.floor(math.log2(n_rows / target) / dims)) + 1
    return max(1, min(max_level, lvl))


# ------------------------------------------------------------ SO(3) join


class So3Index:
    """Build-once / query-many SO(3) index (the reference's KDTree contract
    applied to the rotation space): canonicalized + salted corpus persisted
    PRE-PARTITIONED on part_key so repeat query batches shuffle only the
    candidate side (same layout trick as engine.GeoIndex)."""

    def __init__(
        self,
        spark: SparkSession,
        poses: DataFrame,
        level: int | None = None,
        max_cell_rows: int = 4096,
        n_poses_hint: int | None = None,
    ):
        self.spark = spark
        if level is None:
            n = n_poses_hint if n_poses_hint is not None else poses.count()
            level = level_for_poses(n, dims=4)
        self.level = level
        self.cell_expr = so3_cell_sql(level)
        sign = canon_sign_sql()
        canon = poses.select(
            "pose_id",
            *QCOLS,  # cell_expr reads the raw coefficients
            *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in QCOLS],
        )
        self.stats = _collect_stats(
            canon, self.cell_expr, [f"c{c[1]}" for c in QCOLS], max_cell_rows
        )
        self.corpus = (
            _salted(canon, spark, self.stats, self.cell_expr, "pose_id")
            .select("pose_id", "cw", "cx", "cy", "cz", "part_key")
            .repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions")), "part_key"
            )
            .persist()
        )
        self.corpus.count()  # materialize
        self.part_keys = _part_keys(spark, self.stats)

    def knn_join(self, queries: DataFrame, k: int = 8) -> DataFrame:
        return _so3_knn_on_index(
            self.spark, self.corpus, self.stats, self.part_keys, queries, k
        )

    def unpersist(self) -> None:
        self.corpus.unpersist()


def so3_knn_join(
    spark: SparkSession,
    poses: DataFrame,
    queries: DataFrame,
    k: int = 8,
    level: int | None = None,
    max_cell_rows: int = 4096,
    n_poses_hint: int | None = None,
) -> DataFrame:
    """Exact angular kNN join over quaternion columns (qw, qx, qy, qz):
    for every query pose, its k nearest corpus poses by
    ``arccos(|q . p|)``, ties by pose_id.  Returns
    (query_id, pose_id, ang, rank).

    Plan: canonicalize -> 4-D grid cell key (+hash salts for hot cells) ->
    per-query candidate cells from broadcast stats probed at BOTH +q and -q
    (antipodal reduction) -> ONE cogroup running the 4-D k-d kernel ->
    min per (query, pose) to dedupe antipodal double-hits -> window top-k.
    Reference: SO3 build/query ``src/_so3space.hpp:594-658``, test matrix
    ``test/kdtree_test.cpp:385-417``.

    One-shot convenience over :class:`So3Index` (kept unpersisted: the
    corpus is consumed once, exactly like engine.knn_join vs GeoIndex).
    """
    if level is None:
        n = n_poses_hint if n_poses_hint is not None else poses.count()
        level = level_for_poses(n, dims=4)
    cell_expr = so3_cell_sql(level)
    sign = canon_sign_sql()
    canon = poses.select(
        "pose_id",
        *QCOLS,  # cell_expr reads the raw coefficients
        *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in QCOLS],
    )
    stats = _collect_stats(
        canon, cell_expr, [f"c{c[1]}" for c in QCOLS], max_cell_rows
    )
    corpus = _salted(
        canon, spark, stats, cell_expr, "pose_id"
    ).select("pose_id", "cw", "cx", "cy", "cz", "part_key")
    part_keys = _part_keys(spark, stats)
    return _so3_knn_on_index(spark, corpus, stats, part_keys, queries, k)


def _so3_knn_on_index(
    spark: SparkSession,
    corpus: DataFrame,
    stats: PoseCellStats,
    part_keys: DataFrame,
    queries: DataFrame,
    k: int,
) -> DataFrame:
    bc = spark.sparkContext.broadcast(
        (stats.keys, stats.counts, stats.lo, stats.hi)
    )

    q = queries.select("query_id", *QCOLS).repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )

    def gen(batches):
        keys, counts, lo, hi = bc.value
        C = len(keys)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            Q = pdf[list(QCOLS)].to_numpy(np.float64)
            s = canon_sign_np(Q)
            cq = Q * s[:, None]
            qid = pdf["query_id"].to_numpy()
            chunk = max(64, 1_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                probes = [cq[sl], -cq[sl]]
                dmins, dmaxs = zip(*(_bbox_min_max_dist(p, lo, hi) for p in probes))
                # combined kth bound <= min over probes of per-probe bound
                bound = np.minimum(
                    _count_bound(dmins[0], dmaxs[0], counts, k),
                    _count_bound(dmins[1], dmaxs[1], counts, k),
                )
                for p, dmin in zip(probes, dmins):
                    qi, ci = np.nonzero(dmin <= bound[:, None])
                    if len(qi) == 0:
                        continue
                    yield pd.DataFrame(
                        {
                            "query_id": qid[sl][qi],
                            "pw": p[qi, 0],
                            "px": p[qi, 1],
                            "py": p[qi, 2],
                            "pz": p[qi, 3],
                            "key": keys[ci],
                        }
                    )

    cand = q.mapInPandas(
        gen,
        schema="query_id string, pw double, px double, py double, pz double, key long",
    ).join(part_keys, "key").select("query_id", "pw", "px", "py", "pz", "part_key")

    def knn_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "pose_id": [], "ang": []})
        P = right[["cw", "cx", "cy", "cz"]].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))
        tree = kernel.build(P)
        QP = left[["pw", "px", "py", "pz"]].to_numpy(np.float64)
        qi, idx, _ = kernel.knn(tree, QP, k, tie_key=tie)
        # final metric recomputed with the oracle's exact expression (the
        # euclid->angular map is strictly monotone; candidate selection by
        # euclid is therefore rank-preserving)
        ang = _angular_np(QP[qi], P[idx])
        return pd.DataFrame(
            {
                "query_id": left["query_id"].to_numpy()[qi],
                "pose_id": ids[idx],
                "ang": ang,
            }
        )

    hits = (
        cand.groupby("part_key")
        .cogroup(corpus.groupby("part_key"))
        .applyInPandas(knn_group, schema="query_id string, pose_id string, ang double")
    )
    # dedupe antipodal double-hits (same pose via +q and -q has equal ang)
    merged = hits.groupBy("query_id", "pose_id").agg(F.min("ang").alias("ang"))
    w = Window.partitionBy("query_id").orderBy("ang", "pose_id")
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "pose_id", "ang", F.col("rank").cast("int"))
    )


# ------------------------------------------------------------ SE(3) join


class Se3Index:
    """Build-once / query-many SE(3) index: salted corpus persisted
    PRE-PARTITIONED on the translation-grid part_key (same layout as
    GeoIndex/So3Index) — repeat batches shuffle only the candidate side."""

    def __init__(
        self,
        spark: SparkSession,
        poses: DataFrame,
        level: int | None = None,
        max_cell_rows: int = 4096,
        n_poses_hint: int | None = None,
    ):
        self.spark = spark
        if level is None:
            n = n_poses_hint if n_poses_hint is not None else poses.count()
            level = level_for_poses(n, dims=3)
        self.level = level
        b = poses.agg(
            *[F.min(c).alias(f"lo_{c}") for c in TCOLS],
            *[F.max(c).alias(f"hi_{c}") for c in TCOLS],
        ).first()
        bounds = [(float(b[f"lo_{c}"]), float(b[f"hi_{c}"])) for c in TCOLS]
        self.cell_expr = trans_cell_sql(bounds, level)
        self.stats = _collect_stats(poses, self.cell_expr, list(TCOLS), max_cell_rows)
        self.corpus = (
            _salted(poses, spark, self.stats, self.cell_expr, "pose_id")
            .select("pose_id", *QCOLS, *TCOLS, "part_key")
            .repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions")), "part_key"
            )
            .persist()
        )
        self.corpus.count()  # materialize
        self.part_keys = _part_keys(spark, self.stats)

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 8,
        rot_weight: float = 1.0,
        trans_weight: float = 1.0,
    ) -> DataFrame:
        return _se3_knn_on_index(
            self.spark, self.corpus, self.stats, self.part_keys, queries, k,
            rot_weight, trans_weight,
        )

    def unpersist(self) -> None:
        self.corpus.unpersist()


def se3_knn_join(
    spark: SparkSession,
    poses: DataFrame,
    queries: DataFrame,
    k: int = 8,
    rot_weight: float = 1.0,
    trans_weight: float = 1.0,
    level: int | None = None,
    max_cell_rows: int = 4096,
    n_poses_hint: int | None = None,
) -> DataFrame:
    """Exact kNN join in the weighted compound SE(3) metric
    ``rot_weight * arccos(|q.p|) + trans_weight * ||t_q - t_p||``
    (reference compound/weighted spaces ``src/_spaces.hpp:273-421``,
    ``src/_compoundspace.hpp:60-88``).  Returns
    (query_id, pose_id, dist, rank).

    Partition key: 3-D grid over translation (data-derived bounds).  Cell
    pruning is exact: lower bound = trans_weight * dist-to-bbox (rotation
    contributes >= 0); count-bound upper bound adds rot_weight * pi/2 (the
    angular metric's diameter).  Per-cell kernel evaluates the FULL
    compound distance vectorized (cells hold O(max_cell_rows) rows).
    One-shot convenience over :class:`Se3Index` (corpus unpersisted)."""
    if level is None:
        n = n_poses_hint if n_poses_hint is not None else poses.count()
        level = level_for_poses(n, dims=3)
    b = poses.agg(
        *[F.min(c).alias(f"lo_{c}") for c in TCOLS],
        *[F.max(c).alias(f"hi_{c}") for c in TCOLS],
    ).first()
    bounds = [(float(b[f"lo_{c}"]), float(b[f"hi_{c}"])) for c in TCOLS]
    cell_expr = trans_cell_sql(bounds, level)
    stats = _collect_stats(poses, cell_expr, list(TCOLS), max_cell_rows)
    corpus = _salted(poses, spark, stats, cell_expr, "pose_id").select(
        "pose_id", *QCOLS, *TCOLS, "part_key"
    )
    part_keys = _part_keys(spark, stats)
    return _se3_knn_on_index(
        spark, corpus, stats, part_keys, queries, k, rot_weight, trans_weight
    )


def _se3_knn_on_index(
    spark: SparkSession,
    corpus: DataFrame,
    stats: PoseCellStats,
    part_keys: DataFrame,
    queries: DataFrame,
    k: int,
    rot_weight: float,
    trans_weight: float,
) -> DataFrame:
    rw, tw = float(rot_weight), float(trans_weight)
    rot_diam = rw * (np.pi / 2.0)
    bc = spark.sparkContext.broadcast((stats.keys, stats.counts, stats.lo, stats.hi))

    q = queries.select("query_id", *QCOLS, *TCOLS).repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )

    def gen(batches):
        keys, counts, lo, hi = bc.value
        C = len(keys)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            T = pdf[list(TCOLS)].to_numpy(np.float64)
            chunk = max(64, 1_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                dmin, dmax = _bbox_min_max_dist(T[sl], lo, hi)
                # count-bound on the compound upper bound; admission on the
                # compound lower bound (rotation >= 0)
                ub = tw * dmax + rot_diam
                order = np.argsort(ub, axis=1, kind="stable")
                cum = np.cumsum(counts[order], axis=1)
                need = np.argmax(cum >= k, axis=1)
                enough = cum[:, -1] >= k
                need = np.where(enough, need, C - 1)
                rows = np.arange(len(need))
                bound = np.where(
                    enough, np.take_along_axis(ub, order, axis=1)[rows, need], np.inf
                )
                qi, ci = np.nonzero(tw * dmin <= bound[:, None])
                if len(qi) == 0:
                    continue
                out = pdf.iloc[np.asarray(qi) + c0][
                    ["query_id", *QCOLS, *TCOLS]
                ].copy()
                out["key"] = keys[ci]
                yield out

    cand = q.mapInPandas(
        gen,
        schema="query_id string, qw double, qx double, qy double, qz double,"
        " tx double, ty double, tz double, key long",
    ).join(part_keys, "key").drop("key")

    def se3_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "pose_id": [], "dist": []})
        QR = left[list(QCOLS)].to_numpy(np.float64)
        QT = left[list(TCOLS)].to_numpy(np.float64)
        PR = right[list(QCOLS)].to_numpy(np.float64)
        PT = right[list(TCOLS)].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))
        out_q, out_p, out_d = [], [], []
        for c0 in range(0, len(left), 1024):  # memory-bounding chunk loop
            sl = slice(c0, min(c0 + 1024, len(left)))
            # oracle-exact expression, left-associated adds throughout
            dot = QR[sl, 0][:, None] * PR[:, 0][None, :]
            dot = dot + QR[sl, 1][:, None] * PR[:, 1][None, :]
            dot = dot + QR[sl, 2][:, None] * PR[:, 2][None, :]
            dot = dot + QR[sl, 3][:, None] * PR[:, 3][None, :]
            ldot = np.minimum(1.0, np.abs(dot))
            ang = np.arccos(ldot)  # SIMD arccos for SELECTION only
            dx = PT[:, 0][None, :] - QT[sl, 0][:, None]
            dy = PT[:, 1][None, :] - QT[sl, 1][:, None]
            dz = PT[:, 2][None, :] - QT[sl, 2][:, None]
            et = np.sqrt(dx * dx + dy * dy + dz * dz)
            d = rw * ang + tw * et
            kk = min(k, d.shape[1])
            order = np.lexsort((np.broadcast_to(tie, d.shape), d), axis=1)[:, :kk]
            rows = np.repeat(np.arange(d.shape[0]), kk)
            cols = order.ravel()
            out_q.append(left["query_id"].to_numpy()[sl][rows])
            out_p.append(ids[cols])
            # FINAL values via libm acos — oracle-bit-exact (the 1-ulp
            # SIMD/libm gap can't flip the selection unless two compound
            # distances tie within ~1 ulp)
            out_d.append(
                rw * acos_exact(ldot[rows, cols]) + tw * et[rows, cols]
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "pose_id": np.concatenate(out_p),
                "dist": np.concatenate(out_d),
            }
        )

    hits = (
        cand.groupby("part_key")
        .cogroup(corpus.groupby("part_key"))
        .applyInPandas(se3_group, schema="query_id string, pose_id string, dist double")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "pose_id")
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "pose_id", "dist", F.col("rank").cast("int"))
    )

"""Distributed SO(3) and SE(3) kNN joins over pose tables.

The reference's raison d'être is nearest-neighbor search in rotation /
rigid-motion spaces for motion planning (``/root/reference/README.md:6``;
active test matrix ``test/kdtree_test.cpp:385-417`` runs StaticBuildAndQuery
and dynamic Add/KNN for SO3, SO3Alt, SO3RL, SE3 and weighted SE3).  This
module is the distributed twin, following the exact plan shape of the geo
engine (``sparkkd.engine``), including its TWO-PHASE search:

* **phase 1 (home probe)**: every query probes its own partition GROUP
  first — the distributed analogue of the reference's first descent —
  yielding a TRUE kth-distance bound far tighter than any statistics-only
  bound;
* **phase 2**: remaining groups are admitted against that bound through
  fine-grained cell statistics; queries whose bound is strictly inside
  their home grid cell (home-edge early exit) skip phase 2 entirely.

TWO-LEVEL LAYOUT (round-3 profiling insight): pruning statistics live at a
FINE grid level (tight per-cell data bboxes — the pruning power), while
the shuffle / cogroup partition key is the cell's ancestor `GROUP_SHIFT`
levels up (2^(d*shift)-fold fewer Python cogroup groups).  At 1M poses the
fine grid has ~8k occupied cells: cogrouping per fine cell paid ~8k
Arrow/worker round-trips PER PHASE, which dominated wall-clock; group-level
cogroups cut that by 16x (4-D) while per-group kernels stay small (a few
thousand rows).  Bonus exactness wins: phase 1 probes the WHOLE home group
(more candidates => tighter bound, and the entire group is excluded from
phase 2), and the home-edge exit tests the wider coarse cell => more
queries exit.

SO(3) — antipodal R^4 reduction (reference SO3RL space,
``src/_so3rlspace.hpp:36-54``): for unit quaternions the angular metric
``arccos(|a.b|)`` is strictly increasing in ``min(|a-b|, |a+b|)``, so exact
angular kNN over canonicalized points (q ~ -q collapsed to one sign) equals
Euclidean R^4 kNN probed at BOTH +q and -q with the per-point best kept.
The coarse partition is a 4-D grid over the canonicalized coefficients —
the distributed analogue of the reference's 4-volume radix partition
(``src/_so3space.hpp:594-658``).  Phase-2 extra for the minus probe:
canonicalized corpus points all have ``cw >= 0``, so the minus probe (whose
w coordinate is ``-cw_q <= 0``) is at least ``cw_q`` from EVERY corpus
point — when the phase-1 bound is below that, the whole minus sweep dies on
one scalar compare (and the minus probe's home group is unoccupied almost
surely, so it contributes no phase-1 kernel work either).

SE(3) — compound space (``src/_spaces.hpp:369-421``): distance is
``rot_weight * angular + trans_weight * L2(translation)``.  The partition
key is a 3-D grid over translation; a cell's compound lower bound is
``trans_weight * dist-to-bbox`` (rotation contributes >= 0).  The phase-1
home probe returns true compound kth distances, so the slack
``rot_weight * pi/2`` term that inflated the round-2 statistics-only bound
never enters the hot path (it remains only in the fallback for queries
whose home group holds fewer than k poses).

IEEE parity with the DuckDB oracle: the final ranking distance is computed
with term-for-term the same expression the oracle uses —
``arccos(min(1, |qw*pw + qx*px + qy*py + qz*pz|))`` with left-associated
additions (NumPy elementwise adds in the same order) and libm acos — so
hash-exact comparison holds.  Canonicalization sign flips are exact in
IEEE, so |dot(±a, ±b)| is bit-identical to |dot(a, b)|.  Inside the SE(3)
kernel, selection uses NumPy's SIMD arccos (1 ulp off libm on ~1/3 of
inputs) but keeps every candidate within a relative 1e-12 margin of the
kth selection distance before exact libm rescoring, so a 1-ulp selection
tie can never cut a candidate the oracle would rank inside k.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import kernel
from .engine import _register_cache, _release_registry

SALT_BITS = 12
GROUP_SHIFT = 1  # partition key = fine cell's ancestor this many levels up

QCOLS = ("qw", "qx", "qy", "qz")
TCOLS = ("tx", "ty", "tz")
CCOLS = ("cw", "cx", "cy", "cz")  # canonicalized quaternion coefficients

# one-shot join intermediates (indexes own per-instance registries)
_ONESHOT_CACHES: list[DataFrame] = []


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


def grid_cell_sql(
    exprs: list[str], bounds: list[tuple[float, float]], level: int
) -> str:
    """d-D grid id over column exprs with per-axis (vmin, vspan) bounds;
    axis 0 is the most significant digit.  The id at level L-1 of a point
    equals the per-axis >>1 coarsening of its id at L (floor(x/2) ==
    floor(floor(x)/2)), so coarse SQL keys agree with _coarsen_nd."""
    n = 1 << level
    parts = [
        _axis_idx_sql(e, vmin, vspan, n) for e, (vmin, vspan) in zip(exprs, bounds)
    ]
    expr = parts[0]
    for p in parts[1:]:
        expr = f"(({expr}) * CAST({n} AS BIGINT) + {p})"
    return expr


def so3_cell_sql(level: int) -> str:
    """4-D grid id over the CANONICALIZED coefficients in [-1, 1]^4."""
    s = canon_sign_sql()
    return grid_cell_sql(
        [f"({s} * {c})" for c in QCOLS], [(-1.0, 2.0)] * 4, level
    )


def trans_cell_sql(bounds: list[tuple[float, float]], level: int) -> str:
    """3-D grid id over translation with DATA-DERIVED bounds (literals, so
    the expression is identical across the stats and salted passes)."""
    return grid_cell_sql(
        list(TCOLS), [(lo, max(hi - lo, 1e-9)) for lo, hi in bounds], level
    )


# ------------------------------------------------------------------ stats


@dataclass
class PoseCellStats:
    """FINE-level pruning statistics: one row per occupied fine grid cell
    (tight data bboxes drive phase-2 admission)."""

    keys: np.ndarray  # (C,) int64 fine cell ids
    counts: np.ndarray  # (C,) int64
    lo: np.ndarray  # (C, d) per-cell data bbox lows (d=4 rot / d=3 trans)
    hi: np.ndarray  # (C, d)

    @property
    def total(self) -> int:
        return int(self.counts.sum())


@dataclass
class GroupLayout:
    """COARSE-level partition layout: fine cells grouped by their ancestor
    GROUP_SHIFT levels up.  The group id (plus a hash salt for hot groups)
    is the cogroup/shuffle key; group boxes = union of member fine bboxes
    serve as the first pruning level."""

    g_keys: np.ndarray  # (G,) coarse ids (partition keys sans salt)
    g_counts: np.ndarray  # (G,)
    g_salt_n: np.ndarray  # (G,)
    glo: np.ndarray  # (G, d) union of member bboxes
    ghi: np.ndarray  # (G, d)
    g_order: np.ndarray  # member fine-cell indexes grouped by g
    g_start: np.ndarray  # offsets into g_order
    coarse_level: int


def _collect_stats(
    df: DataFrame, cell_expr: str, dim_cols: list[str]
) -> PoseCellStats:
    aggs = [F.count("*").alias("cnt")]
    for c in dim_cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    pdf = (
        df.groupBy(F.expr(cell_expr).alias("key")).agg(*aggs).toPandas()
    ).sort_values("key")
    return PoseCellStats(
        keys=pdf["key"].to_numpy(np.int64),
        counts=pdf["cnt"].to_numpy(np.int64),
        lo=pdf[[f"lo_{c}" for c in dim_cols]].to_numpy(np.float64),
        hi=pdf[[f"hi_{c}" for c in dim_cols]].to_numpy(np.float64),
    )


def _group_layout(
    stats: PoseCellStats, level: int, dims: int, max_cell_rows: int,
    shift: int = GROUP_SHIFT,
) -> GroupLayout:
    coarse = max(0, level - shift)
    anc = _coarsen_nd(stats.keys, level, coarse, dims)
    g_keys, g_inv = np.unique(anc, return_inverse=True)
    G = len(g_keys)
    g_counts = np.zeros(G, np.int64)
    np.add.at(g_counts, g_inv, stats.counts)
    glo = np.full((G, dims), np.inf)
    ghi = np.full((G, dims), -np.inf)
    for j in range(dims):
        np.minimum.at(glo[:, j], g_inv, stats.lo[:, j])
        np.maximum.at(ghi[:, j], g_inv, stats.hi[:, j])
    g_order = np.argsort(g_inv, kind="stable")
    g_start = np.searchsorted(g_inv[g_order], np.arange(G + 1))
    return GroupLayout(
        g_keys=g_keys,
        g_counts=g_counts,
        g_salt_n=np.clip(
            -(-g_counts // max_cell_rows), 1, 1 << SALT_BITS
        ).astype(np.int64),
        glo=glo,
        ghi=ghi,
        g_order=g_order,
        g_start=g_start,
        coarse_level=coarse,
    )


def _salted(df: DataFrame, spark: SparkSession, layout: GroupLayout,
            group_expr: str, id_col: str) -> DataFrame:
    salt_df = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"key": layout.g_keys, "salt_n": layout.g_salt_n})
        )
    )
    return (
        df.withColumn("key", F.expr(group_expr))
        .join(salt_df, "key")
        .withColumn(
            "part_key",
            (F.col("key") * (1 << SALT_BITS))
            + F.pmod(F.xxhash64(id_col), F.col("salt_n")),
        )
    )


def _part_keys(spark: SparkSession, layout: GroupLayout) -> DataFrame:
    reps = layout.g_salt_n
    key = np.repeat(layout.g_keys, reps)
    off = np.concatenate([[0], np.cumsum(reps)[:-1]])
    salt = np.arange(reps.sum(), dtype=np.int64) - np.repeat(off, reps)
    return F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"key": key, "part_key": (key << SALT_BITS) + salt})
        )
    )


# --------------------------------------------------- pruning geometry (d-D)


def _bbox_min_dist(p: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """(Q, C) min L2 distances from points (Q, d) to boxes (C, d)."""
    dmin2 = np.zeros((len(p), len(lo)))
    for j in range(p.shape[1]):
        pj = p[:, j][:, None]
        m = np.maximum(
            np.maximum(lo[:, j][None, :] - pj, pj - hi[:, j][None, :]), 0.0
        )
        dmin2 += m * m
    return np.sqrt(dmin2)


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
    reasoning as engine._knn_candidates).  Statistics-only FALLBACK for
    queries without a phase-1 home bound."""
    order = np.argsort(dmax, axis=1, kind="stable")
    cum = np.cumsum(counts[order], axis=1)
    need = np.argmax(cum >= k, axis=1)
    enough = cum[:, -1] >= k
    need = np.where(enough, need, dmax.shape[1] - 1)
    rows = np.arange(len(need))
    return np.where(
        enough, np.take_along_axis(dmax, order, axis=1)[rows, need], np.inf
    )


def _coarsen_nd(cell: np.ndarray, level: int, coarse: int, dims: int) -> np.ndarray:
    """Ancestor ids at `coarse` of d-D grid cells at `level` (axis 0 most
    significant, the grid_cell_sql layout)."""
    assert level >= coarse
    n = np.int64(1 << level)
    s = level - coarse
    nc = np.int64(1 << coarse)
    rem = cell.astype(np.int64, copy=True)
    idxs = []
    for _ in range(dims):
        idxs.append(rem % n)
        rem = rem // n
    out = np.zeros(len(cell), np.int64)
    for ix in reversed(idxs):  # axis 0 first
        out = out * nc + (ix >> s)
    return out


def _group_candidates(
    P: np.ndarray,
    bound: np.ndarray,
    stats_lo: np.ndarray,
    stats_hi: np.ndarray,
    layout_arrays,
    home_g: np.ndarray | None = None,
    scale: float = 1.0,
):
    """Admit (query, GROUP) pairs: a group is admitted for a query when its
    union box passes AND at least one member fine cell's tight bbox passes
    scale * dist <= bound.  `home_g` groups are skipped (the whole home
    group was probed in phase 1).  Returns (qi, g_key) arrays."""
    g_keys, glo, ghi, g_order, g_start = layout_arrays
    dmin_g = scale * _bbox_min_dist(P, glo, ghi)
    adm_g = dmin_g <= bound[:, None]
    if home_g is not None:
        adm_g &= g_keys[None, :] != home_g[:, None]
    out_qi: list[np.ndarray] = []
    out_gk: list[np.ndarray] = []
    for g in np.nonzero(adm_g.any(axis=0))[0]:
        rows_g = np.nonzero(adm_g[:, g])[0]
        mem = g_order[g_start[g] : g_start[g + 1]]
        dmin = scale * _bbox_min_dist(P[rows_g], stats_lo[mem], stats_hi[mem])
        ok = (dmin <= bound[rows_g][:, None]).any(axis=1)
        sel = rows_g[ok]
        if len(sel) > 0:
            out_qi.append(sel)
            out_gk.append(np.full(len(sel), g_keys[g], np.int64))
    if not out_qi:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_qi), np.concatenate(out_gk)


def _grid_home_edge(
    P: np.ndarray, vmin: np.ndarray, vspan: np.ndarray, n: int
) -> np.ndarray:
    """Distance from each point to the nearest boundary of its own grid
    cell, minus a float-rounding margin (the d-D twin of the geo kernel's
    home_edge): every point of every OTHER cell is at least this far away,
    so a query whose bound is strictly below it skips phase 2 entirely."""
    idx = np.clip(np.floor((P - vmin) / vspan * n), 0, n - 1)
    w = vspan / n
    lo = vmin + idx * w
    edge = np.minimum(P - lo, lo + w - P).min(axis=1)
    return edge - 1e-9 * max(float(np.max(vspan)), 1e-30)


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
    """Per-axis log2 resolution of the FINE pruning grid so occupied cells
    hold O(target) rows; the partition key sits GROUP_SHIFT levels coarser
    (2^(dims*shift) * target rows per cogroup group)."""
    import math

    if n_rows <= target:
        return 1
    lvl = int(math.floor(math.log2(n_rows / target) / dims)) + 1
    return max(1, min(max_level, lvl))


# ------------------------------------------------------------ SO(3) join


class So3Index:
    """Build-once / query-many SO(3) index (the reference's KDTree contract
    applied to the rotation space): canonicalized + group-salted corpus
    persisted PRE-PARTITIONED on part_key so repeat query batches shuffle
    only the candidate side (same layout trick as engine.GeoIndex)."""

    def __init__(
        self,
        spark: SparkSession,
        poses: DataFrame,
        level: int | None = None,
        max_cell_rows: int = 16384,
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
            *QCOLS,  # cell/group exprs read the raw coefficients
            *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in QCOLS],
        )
        self.stats = _collect_stats(canon, self.cell_expr, list(CCOLS))
        self.layout = _group_layout(self.stats, level, 4, max_cell_rows)
        self.group_expr = so3_cell_sql(self.layout.coarse_level)
        self.corpus = (
            _salted(canon, spark, self.layout, self.group_expr, "pose_id")
            .select("pose_id", *CCOLS, "part_key")
            .repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions")), "part_key"
            )
            .persist()
        )
        self.corpus.count()  # materialize
        self.part_keys = _part_keys(spark, self.layout)
        self._caches: list[DataFrame] = []

    def knn_join(self, queries: DataFrame, k: int = 8) -> DataFrame:
        return _so3_knn_on_index(
            self.spark, self.corpus, self.stats, self.layout, self.part_keys,
            queries, k, self.level, cache_registry=self._caches,
        )

    def radius_join(self, queries: DataFrame, r: float) -> DataFrame:
        return _so3_radius_on_index(
            self.spark, self.corpus, self.stats, self.layout, self.part_keys,
            queries, r,
        )

    def unpersist(self) -> None:
        _release_registry(self._caches)
        self.corpus.unpersist()


def so3_knn_join(
    spark: SparkSession,
    poses: DataFrame,
    queries: DataFrame,
    k: int = 8,
    level: int | None = None,
    max_cell_rows: int = 16384,
    n_poses_hint: int | None = None,
) -> DataFrame:
    """Exact angular kNN join over quaternion columns (qw, qx, qy, qz):
    for every query pose, its k nearest corpus poses by
    ``arccos(|q . p|)``, ties by pose_id.  Returns
    (query_id, pose_id, ang, rank).

    Plan: canonicalize -> 4-D fine grid stats + coarse partition groups ->
    phase-1 HOME-GROUP probe at both +q and -q (true kth bound) -> phase-2
    group admission by member-cell bboxes within the bound -> per-group
    4-D k-d kernels inside cogroups -> min per (query, pose) to dedupe
    antipodal double-hits -> window top-k.
    Reference: SO3 build/query ``src/_so3space.hpp:594-658``, ordered
    volume traversal with early exit ``src/_so3space.hpp:401-423``, test
    matrix ``test/kdtree_test.cpp:385-417``.

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
        *QCOLS,
        *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in QCOLS],
    )
    stats = _collect_stats(canon, cell_expr, list(CCOLS))
    layout = _group_layout(stats, level, 4, max_cell_rows)
    corpus = _salted(
        canon, spark, layout, so3_cell_sql(layout.coarse_level), "pose_id"
    ).select("pose_id", *CCOLS, "part_key")
    part_keys = _part_keys(spark, layout)
    return _so3_knn_on_index(
        spark, corpus, stats, layout, part_keys, queries, k, level
    )


def _so3_knn_on_index(
    spark: SparkSession,
    corpus: DataFrame,
    stats: PoseCellStats,
    layout: GroupLayout,
    part_keys: DataFrame,
    queries: DataFrame,
    k: int,
    level: int,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    if cache_registry is None:
        cache_registry = _ONESHOT_CACHES
    _release_registry(cache_registry)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sign = canon_sign_sql()
    ccols = list(CCOLS)
    qc = queries.select(
        "query_id",
        *[F.expr(f"{sign} * {c}").alias(f"c{c[1]}") for c in QCOLS],
    ).repartition(shuffle_n)
    bounds4 = [(-1.0, 2.0)] * 4
    coarse = layout.coarse_level
    pos_gkey = grid_cell_sql(ccols, bounds4, coarse)
    neg_gkey = grid_cell_sql([f"(- {c})" for c in ccols], bounds4, coarse)

    # ---- phase 1: probe each probe-point's HOME group (all salts) -------
    # Two probe rows per query (+canon and -canon, the antipodal
    # reduction); the inner join against part_keys drops probes whose home
    # group is unoccupied — in particular nearly every minus probe, since
    # canonicalized corpus points live in the cw >= 0 half.
    probes = (
        qc.withColumn("sgn", F.lit(1.0)).withColumn("key", F.expr(pos_gkey))
    ).unionByName(
        qc.withColumn("sgn", F.lit(-1.0)).withColumn("key", F.expr(neg_gkey))
    )
    p1_cand = probes.join(part_keys, "key").select(
        "query_id", *ccols, "sgn", "part_key"
    )

    def p1_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "query_id": [], "pose_id": [], "ang": [], "eu": [],
            "cw": [], "cx": [], "cy": [], "cz": [],
        }
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(cols)
        P = right[ccols].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))
        tree = kernel.build(P)
        C4 = left[ccols].to_numpy(np.float64)
        QP = C4 * left["sgn"].to_numpy(np.float64)[:, None]
        qi, idx, eu = kernel.knn(tree, QP, k, tie_key=tie)
        # final metric recomputed with the oracle's exact expression (the
        # euclid->angular map is strictly monotone; candidate selection by
        # euclid is therefore rank-preserving)
        ang = _angular_np(QP[qi], P[idx])
        return pd.DataFrame(
            {
                "query_id": left["query_id"].to_numpy()[qi],
                "pose_id": ids[idx],
                "ang": ang,
                "eu": eu,
                "cw": C4[qi, 0], "cx": C4[qi, 1],
                "cy": C4[qi, 2], "cz": C4[qi, 3],
            }
        )

    p1 = (
        p1_cand.groupby("part_key")
        .cogroup(corpus.groupby("part_key"))
        .applyInPandas(
            p1_group,
            schema="query_id string, pose_id string, ang double, eu double,"
            " cw double, cx double, cy double, cz double",
        )
    )
    w = Window.partitionBy("query_id").orderBy("ang", "pose_id")
    wq = Window.partitionBy("query_id")
    p1 = _register_cache(p1, cache_registry)
    # no pose is double-hit in phase 1 (each pose lives in exactly one
    # group; the two probes target DIFFERENT groups), so ranks merge clean
    p1_topk = (
        p1.withColumn("rank", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wq))
        .filter(F.col("rank") <= k)
    )

    # ---- phase 2: bound rows, early exits, group admission --------------
    # bound = max EUCLIDEAN distance over the top-k-by-angle rows when the
    # home probes produced >= k rows: k distinct poses provably lie within
    # it, so it upper-bounds the true kth distance (euclid-side, where all
    # pruning geometry lives).
    bound_rows = (
        p1_topk.withColumn("eumax", F.max("eu").over(wq))
        .filter(F.col("rank") == F.least(F.lit(k), F.col("cnt")))
        .select(
            "query_id", *ccols,
            F.when(F.col("cnt") >= k, F.col("eumax"))
            .otherwise(F.lit(float("inf")))
            .alias("bound"),
        )
    )
    # queries with BOTH home groups unoccupied never reach p1: recover
    # them with broadcast anti joins against the (small) occupied-key set.
    occ = part_keys.select("key").distinct()
    qk = qc.withColumn("kp", F.expr(pos_gkey)).withColumn("kn", F.expr(neg_gkey))
    absent = (
        qk.join(F.broadcast(occ.withColumnRenamed("key", "kp")), "kp", "left_anti")
        .join(F.broadcast(occ.withColumnRenamed("key", "kn")), "kn", "left_anti")
        .select("query_id", *ccols, F.lit(float("inf")).alias("bound"))
    )
    q_b = (
        bound_rows.unionByName(absent)
        .withColumn("kp", F.expr(pos_gkey))
        .withColumn("kn", F.expr(neg_gkey))
    )

    bc = spark.sparkContext.broadcast(
        (
            stats.counts, stats.lo, stats.hi,
            layout.g_keys, layout.glo, layout.ghi,
            layout.g_order, layout.g_start,
        )
    )
    n_coarse = 1 << coarse

    def gen(batches):
        counts, lo, hi, g_keys, glo, ghi, gord, gstart = bc.value
        C = len(counts)
        G_ = len(g_keys)
        la = (g_keys, glo, ghi, gord, gstart)
        vmin = np.full(4, -1.0)
        vspan = np.full(4, 2.0)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            C4 = pdf[ccols].to_numpy(np.float64)
            given = pdf["bound"].to_numpy(np.float64)
            kp = pdf["kp"].to_numpy(np.int64)
            kn = pdf["kn"].to_numpy(np.int64)
            qid = pdf["query_id"].to_numpy()
            chunk = max(256, 8_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                P4 = C4[sl]
                b = given[sl].copy()
                nb = np.nonzero(~np.isfinite(b))[0]
                if len(nb) > 0:
                    # statistics-only fallback for the (few) queries whose
                    # home probes covered fewer than k poses
                    dps = [
                        _bbox_min_max_dist(s * P4[nb], lo, hi)
                        for s in (1.0, -1.0)
                    ]
                    b[nb] = np.minimum(
                        _count_bound(dps[0][0], dps[0][1], counts, k),
                        _count_bound(dps[1][0], dps[1][1], counts, k),
                    )
                # home-edge exit against the COARSE cell (the home group's
                # grid box): wider cell => more queries exit than a
                # fine-cell test would allow
                edge = _grid_home_edge(P4, vmin, vspan, n_coarse)
                for sgn, home in ((1.0, kp[sl]), (-1.0, kn[sl])):
                    if sgn > 0:
                        alive = ~(b < edge)
                    else:
                        # canonical corpus points all have cw >= 0, so the
                        # minus probe (w = -cw_q <= 0) is >= cw_q from every
                        # point: one compare kills most minus sweeps
                        alive = ~(b < P4[:, 0])
                    rows = np.nonzero(alive)[0]
                    if len(rows) == 0:
                        continue
                    qi, gk = _group_candidates(
                        sgn * P4[rows], b[rows], lo, hi, la, home_g=home[rows],
                    )
                    if len(qi) == 0:
                        continue
                    pr = sgn * P4[rows[qi]]
                    yield pd.DataFrame(
                        {
                            "query_id": qid[sl][rows[qi]],
                            "pw": pr[:, 0], "px": pr[:, 1],
                            "py": pr[:, 2], "pz": pr[:, 3],
                            "key": gk,
                        }
                    )

    p2_cand = q_b.mapInPandas(
        gen,
        schema="query_id string, pw double, px double, py double, pz double,"
        " key long",
    )
    p2_cand = _register_cache(
        p2_cand.join(part_keys, "key").select(
            "query_id", "pw", "px", "py", "pz", "part_key"
        ),
        cache_registry,
    )
    p2_cand.count()  # one job fills the p1 cache (upstream) + p2_cand
    probe_keys = F.broadcast(p2_cand.select("part_key").distinct())
    corp_probe = corpus.join(probe_keys, "part_key", "left_semi")

    def p2_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "pose_id": [], "ang": []})
        P = right[ccols].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))
        tree = kernel.build(P)
        QP = left[["pw", "px", "py", "pz"]].to_numpy(np.float64)
        qi, idx, _ = kernel.knn(tree, QP, k, tie_key=tie)
        ang = _angular_np(QP[qi], P[idx])
        return pd.DataFrame(
            {
                "query_id": left["query_id"].to_numpy()[qi],
                "pose_id": ids[idx],
                "ang": ang,
            }
        )

    p2 = (
        p2_cand.groupby("part_key")
        .cogroup(corp_probe.groupby("part_key"))
        .applyInPandas(p2_group, schema="query_id string, pose_id string, ang double")
    )

    # re-rank ONLY queries phase 2 touched; a phase-2 probe may re-hit a
    # pose phase 1 saw from the other sign, so dedupe by min ang first
    affected = F.broadcast(p2_cand.select("query_id").distinct())
    untouched = p1_topk.join(affected, "query_id", "left_anti").select(
        "query_id", "pose_id", "ang", F.col("rank").cast("int")
    )
    touched = (
        p1_topk.join(affected, "query_id", "left_semi")
        .select("query_id", "pose_id", "ang")
        .unionByName(p2)
        .groupBy("query_id", "pose_id")
        .agg(F.min("ang").alias("ang"))
    )
    reranked = (
        touched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "pose_id", "ang", F.col("rank").cast("int"))
    )
    return untouched.unionByName(reranked)


def so3_radius_join(
    spark: SparkSession,
    poses: DataFrame,
    queries: DataFrame,
    r: float,
    level: int | None = None,
    max_cell_rows: int = 16384,
    n_poses_hint: int | None = None,
) -> DataFrame:
    """All (query, pose) pairs with angular distance
    ``arccos(|q.p|) <= r`` — reference Q3 (kNN entry with finite
    maxRadius, ``src/_kdtree_median.hpp:131-137``) on the rotation space.
    Returns (query_id, pose_id, ang).

    The fixed radius r maps to a EUCLIDEAN chord bound
    ``sqrt(2 - 2 cos r)`` on the canonicalized R^4 coordinates (the
    angular metric is strictly increasing in the antipodal-min chord), so
    admission and the per-group kernel run entirely in chord space — no
    phase-1 probe needed; both antipodal probes admit groups whose member
    fine-cell bboxes come within the (slightly padded) chord, and the
    EXACT libm angle filters the final pairs, so the float padding can
    only add work, never wrong rows.  One-shot convenience over
    :class:`So3Index.radius_join`."""
    if level is None:
        n = n_poses_hint if n_poses_hint is not None else poses.count()
        level = level_for_poses(n, dims=4)
    cell_expr = so3_cell_sql(level)
    sign = canon_sign_sql()
    canon = poses.select(
        "pose_id",
        *QCOLS,
        *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in QCOLS],
    )
    stats = _collect_stats(canon, cell_expr, list(CCOLS))
    layout = _group_layout(stats, level, 4, max_cell_rows)
    corpus = _salted(
        canon, spark, layout, so3_cell_sql(layout.coarse_level), "pose_id"
    ).select("pose_id", *CCOLS, "part_key")
    part_keys = _part_keys(spark, layout)
    return _so3_radius_on_index(
        spark, corpus, stats, layout, part_keys, queries, r
    )


def _so3_radius_on_index(
    spark: SparkSession,
    corpus: DataFrame,
    stats: PoseCellStats,
    layout: GroupLayout,
    part_keys: DataFrame,
    queries: DataFrame,
    r: float,
) -> DataFrame:
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sign = canon_sign_sql()
    ccols = list(CCOLS)
    r = float(r)
    # padded chord: superset admission; the exact libm angle decides below
    chord = float(np.sqrt(max(2.0 - 2.0 * np.cos(r), 0.0)) * (1.0 + 1e-12) + 1e-15)
    qc = queries.select(
        "query_id",
        *[F.expr(f"{sign} * {c}").alias(f"c{c[1]}") for c in QCOLS],
    ).repartition(shuffle_n)

    bc = spark.sparkContext.broadcast(
        (
            stats.lo, stats.hi,
            layout.g_keys, layout.glo, layout.ghi,
            layout.g_order, layout.g_start,
        )
    )

    def gen(batches):
        lo, hi, g_keys, glo, ghi, gord, gstart = bc.value
        la = (g_keys, glo, ghi, gord, gstart)
        for pdf in batches:
            if len(pdf) == 0 or len(lo) == 0:
                continue
            C4 = pdf[ccols].to_numpy(np.float64)
            qid = pdf["query_id"].to_numpy()
            chunk = max(256, 8_000_000 // max(len(lo), 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                P4 = C4[sl]
                b = np.full(len(P4), chord)
                for sgn in (1.0, -1.0):
                    if sgn < 0:
                        # canonical points have cw >= 0: the minus probe is
                        # at least cw_q away from every pose
                        rows = np.nonzero(~(b < P4[:, 0]))[0]
                    else:
                        rows = np.arange(len(P4))
                    if len(rows) == 0:
                        continue
                    qi, gk = _group_candidates(
                        sgn * P4[rows], b[rows], lo, hi, la
                    )
                    if len(qi) == 0:
                        continue
                    pr = sgn * P4[rows[qi]]
                    yield pd.DataFrame(
                        {
                            "query_id": qid[sl][rows[qi]],
                            "pw": pr[:, 0], "px": pr[:, 1],
                            "py": pr[:, 2], "pz": pr[:, 3],
                            "key": gk,
                        }
                    )

    cand = qc.mapInPandas(
        gen,
        schema="query_id string, pw double, px double, py double, pz double,"
        " key long",
    ).join(part_keys, "key").select("query_id", "pw", "px", "py", "pz", "part_key")
    probe_keys = F.broadcast(cand.select("part_key").distinct())
    corp_probe = corpus.join(probe_keys, "part_key", "left_semi")

    def radius_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "pose_id": [], "ang": []})
        P = right[ccols].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tree = kernel.build(P)
        QP = left[["pw", "px", "py", "pz"]].to_numpy(np.float64)
        qi, idx, _ = kernel.radius(tree, QP, chord)
        ang = _angular_np(QP[qi], P[idx])
        keep = ang <= r  # EXACT libm angle decides; chord pad only added work
        return pd.DataFrame(
            {
                "query_id": left["query_id"].to_numpy()[qi][keep],
                "pose_id": ids[idx][keep],
                "ang": ang[keep],
            }
        )

    hits = (
        cand.groupby("part_key")
        .cogroup(corp_probe.groupby("part_key"))
        .applyInPandas(radius_group, schema="query_id string, pose_id string, ang double")
    )
    # |dot(+-q, p)| is bit-identical, so both probes report the SAME ang
    # for a double-hit pose: a plain distinct dedupes exactly
    return hits.distinct()


# ------------------------------------------------------------ SE(3) join


class Se3Index:
    """Build-once / query-many SE(3) index: group-salted corpus persisted
    PRE-PARTITIONED on the translation-grid part_key (same layout as
    GeoIndex/So3Index) — repeat batches shuffle only the candidate side."""

    def __init__(
        self,
        spark: SparkSession,
        poses: DataFrame,
        level: int | None = None,
        max_cell_rows: int = 16384,
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
        self.bounds = [(float(b[f"lo_{c}"]), float(b[f"hi_{c}"])) for c in TCOLS]
        self.cell_expr = trans_cell_sql(self.bounds, level)
        self.stats = _collect_stats(poses, self.cell_expr, list(TCOLS))
        self.layout = _group_layout(self.stats, level, 3, max_cell_rows)
        self.group_expr = trans_cell_sql(self.bounds, self.layout.coarse_level)
        self.corpus = (
            _salted(poses, spark, self.layout, self.group_expr, "pose_id")
            .select("pose_id", *QCOLS, *TCOLS, "part_key")
            .repartition(
                int(spark.conf.get("spark.sql.shuffle.partitions")), "part_key"
            )
            .persist()
        )
        self.corpus.count()  # materialize
        self.part_keys = _part_keys(spark, self.layout)
        self._caches: list[DataFrame] = []

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 8,
        rot_weight: float = 1.0,
        trans_weight: float = 1.0,
    ) -> DataFrame:
        return _se3_knn_on_index(
            self.spark, self.corpus, self.stats, self.layout, self.part_keys,
            queries, k, rot_weight, trans_weight, self.level, self.bounds,
            self.group_expr, cache_registry=self._caches,
        )

    def unpersist(self) -> None:
        _release_registry(self._caches)
        self.corpus.unpersist()


def se3_knn_join(
    spark: SparkSession,
    poses: DataFrame,
    queries: DataFrame,
    k: int = 8,
    rot_weight: float = 1.0,
    trans_weight: float = 1.0,
    level: int | None = None,
    max_cell_rows: int = 16384,
    n_poses_hint: int | None = None,
) -> DataFrame:
    """Exact kNN join in the weighted compound SE(3) metric
    ``rot_weight * arccos(|q.p|) + trans_weight * ||t_q - t_p||``
    (reference compound/weighted spaces ``src/_spaces.hpp:273-421``,
    ``src/_compoundspace.hpp:60-88``).  Returns
    (query_id, pose_id, dist, rank).

    Partition key: 3-D grid over translation (data-derived bounds), one
    level coarser than the pruning stats.  Cell pruning is exact: lower
    bound = trans_weight * dist-to-bbox (rotation contributes >= 0); the
    phase-1 home-group probe supplies TRUE compound kth distances, so the
    ``rot_weight * pi/2`` diameter slack enters only the fallback for
    queries whose home group holds fewer than k poses.
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
    stats = _collect_stats(poses, cell_expr, list(TCOLS))
    layout = _group_layout(stats, level, 3, max_cell_rows)
    group_expr = trans_cell_sql(bounds, layout.coarse_level)
    corpus = _salted(poses, spark, layout, group_expr, "pose_id").select(
        "pose_id", *QCOLS, *TCOLS, "part_key"
    )
    part_keys = _part_keys(spark, layout)
    return _se3_knn_on_index(
        spark, corpus, stats, layout, part_keys, queries, k, rot_weight,
        trans_weight, level, bounds, group_expr,
    )


def _make_se3_group(k: int, rw: float, tw: float, carry: bool):
    """Cogroup kernel: branch-and-bound compound search via
    kernel.knn_compound — a k-d tree over the group's TRANSLATIONS prunes
    with the trans_weight * distToLeaf lower bound, so per-query work is
    leaf-log + admitted scans instead of the dense Q x P matrix the
    round-2 kernel computed (which made big two-level groups quadratic).
    Selection runs on SIMD arccos padded by a relative 1e-12 margin;
    final values are libm-rescored from the returned (ldot, et), so the
    downstream window (ordered by the EXACT dist) decides oracle-exactly.
    carry=True passes the query pose through (phase 1 feeds bound rows)."""

    def se3_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = {"query_id": [], "pose_id": [], "dist": []}
        if carry:
            cols.update({c: [] for c in (*QCOLS, *TCOLS)})
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(cols)
        QR = left[list(QCOLS)].to_numpy(np.float64)
        QT = left[list(TCOLS)].to_numpy(np.float64)
        PR = right[list(QCOLS)].to_numpy(np.float64)
        PT = right[list(TCOLS)].to_numpy(np.float64)
        ids = right["pose_id"].to_numpy()
        tie = np.empty(len(ids), dtype=np.int64)
        tie[np.argsort(ids)] = np.arange(len(ids))
        tree = kernel.build(PT)
        qi, idx, ldot, et = kernel.knn_compound(
            tree, QT, QR, PR, k, rw, tw, tie_key=tie
        )
        out = {
            "query_id": left["query_id"].to_numpy()[qi],
            "pose_id": ids[idx],
            # FINAL values via libm acos — oracle-bit-exact
            "dist": rw * acos_exact(ldot) + tw * et,
        }
        if carry:
            for j, c in enumerate(QCOLS):
                out[c] = QR[qi, j]
            for j, c in enumerate(TCOLS):
                out[c] = QT[qi, j]
        return pd.DataFrame(out)

    return se3_group


def _se3_knn_on_index(
    spark: SparkSession,
    corpus: DataFrame,
    stats: PoseCellStats,
    layout: GroupLayout,
    part_keys: DataFrame,
    queries: DataFrame,
    k: int,
    rot_weight: float,
    trans_weight: float,
    level: int,
    bounds: list[tuple[float, float]],
    group_expr: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    if cache_registry is None:
        cache_registry = _ONESHOT_CACHES
    _release_registry(cache_registry)
    rw, tw = float(rot_weight), float(trans_weight)
    rot_diam = rw * (np.pi / 2.0)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    q = queries.select("query_id", *QCOLS, *TCOLS).repartition(shuffle_n)

    # ---- phase 1: home-group probe (all salts) — TRUE compound bound ----
    q_home = q.withColumn("key", F.expr(group_expr))
    p1_cand = q_home.join(part_keys, "key").select(
        "query_id", *QCOLS, *TCOLS, "part_key"
    )
    carry_schema = (
        "query_id string, pose_id string, dist double, "
        + ", ".join(f"{c} double" for c in (*QCOLS, *TCOLS))
    )
    p1 = (
        p1_cand.groupby("part_key")
        .cogroup(corpus.groupby("part_key"))
        .applyInPandas(_make_se3_group(k, rw, tw, carry=True), schema=carry_schema)
    )
    w = Window.partitionBy("query_id").orderBy("dist", "pose_id")
    wq = Window.partitionBy("query_id")
    p1 = _register_cache(p1, cache_registry)
    p1_topk = (
        p1.withColumn("rank", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wq))
        .filter(F.col("rank") <= k)
    )
    bound_rows = (
        p1_topk.withColumn("dmx", F.max("dist").over(wq))
        .filter(F.col("rank") == F.least(F.lit(k), F.col("cnt")))
        .select(
            "query_id", *QCOLS, *TCOLS,
            F.when(F.col("cnt") >= k, F.col("dmx"))
            .otherwise(F.lit(float("inf")))
            .alias("bound"),
        )
    )
    absent = (
        q_home.join(part_keys, "key", "left_anti")
        .select("query_id", *QCOLS, *TCOLS, F.lit(float("inf")).alias("bound"))
    )
    q_b = (
        bound_rows.unionByName(absent)
        .withColumn("home_key", F.expr(group_expr))
    )

    # ---- phase 2: group admission within the compound bound -------------
    bc = spark.sparkContext.broadcast(
        (
            stats.counts, stats.lo, stats.hi,
            layout.g_keys, layout.glo, layout.ghi,
            layout.g_order, layout.g_start,
        )
    )
    n_coarse = 1 << layout.coarse_level
    vmin_a = np.array([lo for lo, _ in bounds])
    vspan_a = np.array([max(hi - lo, 1e-9) for lo, hi in bounds])

    def gen(batches):
        counts, lo, hi, g_keys, glo, ghi, gord, gstart = bc.value
        C = len(counts)
        la = (g_keys, glo, ghi, gord, gstart)
        for pdf in batches:
            if len(pdf) == 0 or C == 0:
                continue
            T = pdf[list(TCOLS)].to_numpy(np.float64)
            given = pdf["bound"].to_numpy(np.float64)
            home = pdf["home_key"].to_numpy(np.int64)
            chunk = max(256, 8_000_000 // max(C, 1))
            for c0 in range(0, len(pdf), chunk):
                sl = slice(c0, min(c0 + chunk, len(pdf)))
                P3 = T[sl]
                b = given[sl].copy()
                nb = np.nonzero(~np.isfinite(b))[0]
                if len(nb) > 0:
                    # fallback count-bound: compound upper bound inflated
                    # by the angular diameter (home had < k poses)
                    dmin, dmax = _bbox_min_max_dist(P3[nb], lo, hi)
                    ub = tw * dmax + rot_diam
                    order = np.argsort(ub, axis=1, kind="stable")
                    cum = np.cumsum(counts[order], axis=1)
                    need = np.argmax(cum >= k, axis=1)
                    enough = cum[:, -1] >= k
                    need = np.where(enough, need, C - 1)
                    rr = np.arange(len(need))
                    b[nb] = np.where(
                        enough,
                        np.take_along_axis(ub, order, axis=1)[rr, need],
                        np.inf,
                    )
                # home-edge early exit in COMPOUND units against the
                # COARSE (home-group) cell boundary
                edge = tw * _grid_home_edge(P3, vmin_a, vspan_a, n_coarse)
                alive = ~(b < edge)
                rows = np.nonzero(alive)[0]
                if len(rows) == 0:
                    continue
                qi, gk = _group_candidates(
                    P3[rows], b[rows], lo, hi, la,
                    home_g=home[sl][rows], scale=tw,
                )
                if len(qi) == 0:
                    continue
                out = pdf.iloc[np.asarray(rows[qi]) + c0][
                    ["query_id", *QCOLS, *TCOLS]
                ].copy()
                out["key"] = gk
                yield out

    p2_cand = q_b.mapInPandas(
        gen,
        schema="query_id string, "
        + ", ".join(f"{c} double" for c in (*QCOLS, *TCOLS))
        + ", key long",
    )
    p2_cand = _register_cache(
        p2_cand.join(part_keys, "key").drop("key"), cache_registry
    )
    p2_cand.count()
    probe_keys = F.broadcast(p2_cand.select("part_key").distinct())
    corp_probe = corpus.join(probe_keys, "part_key", "left_semi")
    p2 = (
        p2_cand.groupby("part_key")
        .cogroup(corp_probe.groupby("part_key"))
        .applyInPandas(
            _make_se3_group(k, rw, tw, carry=False),
            schema="query_id string, pose_id string, dist double",
        )
    )

    # no dedupe needed: a pose lives in exactly one group — home poses only
    # in phase 1, others only in phase 2 (single probe point)
    affected = F.broadcast(p2_cand.select("query_id").distinct())
    untouched = (
        p1_topk.join(affected, "query_id", "left_anti")
        .select("query_id", "pose_id", "dist", F.col("rank").cast("int"))
    )
    reranked = (
        p1_topk.join(affected, "query_id", "left_semi")
        .select("query_id", "pose_id", "dist")
        .unionByName(p2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "pose_id", "dist", F.col("rank").cast("int"))
    )
    return untouched.unionByName(reranked)

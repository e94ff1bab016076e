"""Tiling index: fixed-resolution grid cells over (lon, lat).

This is the engine's coarse space decomposition — the analogue of the
reference's SO(3) 4-volume radix partition (``src/_so3space.hpp:594-658``),
which radix-buckets points into coarse volumes *before* per-volume k-d
subtrees.  Here the buckets are grid cells used as the Spark shuffle key;
per-cell k-d trees (``sparkkd.kernel``) answer queries inside each bucket.

Design choices (documented for scale review):

* **Row-major grid id** ``cell = iy * 2^level + ix`` rather than
  Morton/Hilbert.  Reason: the cell function must be *provably identical* in
  three engines (NumPy kernels, Spark SQL, DuckDB oracle), and row-major is
  a single arithmetic expression in all three.  A Morton variant
  (:func:`morton_id`) exists for locality-friendly file ordering at scale —
  it changes storage order only, never assignment semantics.
* **Resolution**: ``level`` = log2 of the per-axis cell count.  Level 13
  (2^26 ≈ 67M cells) is the S2-level-12-equivalent production default
  (S2 L12 has ~100M cells); tests/benches pick a data-adaptive level via
  :func:`level_for_count` so cells hold O(100) rows.
* **Planar metric**: coordinates are treated as points in the bounded plane
  [-180,180) x [-90,90) with Euclidean distance (the reference is L2 in R^d;
  ``BoundedL2Space``, ``src/_spaces.hpp:112-158``).  No longitude wrap —
  neighbor rings clamp at the boundary.  A haversine scalar function is
  provided separately (:func:`haversine`) but the join operators are L2.

All functions are vectorized NumPy (no per-row Python).
"""

from __future__ import annotations

import numpy as np

# production default: 2^13 x 2^13 = 67M cells ~ S2 level-12-equivalent count
DEFAULT_LEVEL = 13

X_MIN, X_SPAN = -180.0, 360.0
Y_MIN, Y_SPAN = -90.0, 180.0


# ---------------------------------------------------------------- assignment


def axis_index(v: np.ndarray, vmin: float, vspan: float, n: int) -> np.ndarray:
    """Canonical 1-D bucket index: clip(floor((v - vmin) / vspan * n), 0, n-1).

    The op order here is THE definition — the SQL renderings below must
    match it term for term so IEEE evaluation is identical across engines.
    """
    idx = np.floor((np.asarray(v, dtype=np.float64) - vmin) / vspan * n)
    return np.clip(idx, 0, n - 1).astype(np.int64)


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    n = 1 << level
    ix = axis_index(lon, X_MIN, X_SPAN, n)
    iy = axis_index(lat, Y_MIN, Y_SPAN, n)
    return iy * n + ix


def sql_double(v: float) -> str:
    """Render a float literal portably: Spark parses `90.0` as DECIMAL(3,1)
    while DuckDB parses DOUBLE — an explicit CAST makes both engines run
    the identical IEEE double expression."""
    return f"CAST({v!r} AS DOUBLE)"


def cell_id_sql(lon_expr: str, lat_expr: str, level: int = DEFAULT_LEVEL) -> str:
    """One SQL string valid in BOTH Spark SQL and DuckDB, same IEEE op order
    as :func:`cell_id`.  floor() output is cast to BIGINT because DuckDB's
    floor(double) is double while Spark's is bigint; float literals are
    CAST AS DOUBLE (see :func:`sql_double`)."""
    n = 1 << level

    def axis(expr: str, vmin: float, vspan: float) -> str:
        return (
            f"least(CAST({n - 1} AS BIGINT), greatest(CAST(0 AS BIGINT), "
            f"CAST(floor((({expr}) - {sql_double(vmin)}) / {sql_double(vspan)}"
            f" * {sql_double(float(n))}) AS BIGINT)))"
        )

    ix = axis(lon_expr, X_MIN, X_SPAN)
    iy = axis(lat_expr, Y_MIN, Y_SPAN)
    return f"({iy} * CAST({n} AS BIGINT) + {ix})"


# phash -> (lat, lon): the documented fixture constant (FIXTURES.md F1).
# high 32 bits -> lat, low 32 bits -> lon.  Works on signed int64 because
# (phash >> 32) & 0xFFFFFFFF extracts bits 63..32 regardless of sign
# convention (arithmetic shift + mask == logical shift).
PHASH_LAT_SQL = (
    "((({p} >> 32) & 4294967295) / CAST(4294967296.0 AS DOUBLE)"
    " * CAST(180.0 AS DOUBLE) - CAST(90.0 AS DOUBLE))"
)
PHASH_LON_SQL = (
    "((({p} & 4294967295)) / CAST(4294967296.0 AS DOUBLE)"
    " * CAST(360.0 AS DOUBLE) - CAST(180.0 AS DOUBLE))"
)


def phash_lat_sql(p: str = "phash") -> str:
    return PHASH_LAT_SQL.format(p=p)


def phash_lon_sql(p: str = "phash") -> str:
    return PHASH_LON_SQL.format(p=p)


def phash_to_coords(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin of the SQL above (same op order)."""
    u = np.asarray(phash).astype(np.int64)
    hi = ((u >> 32) & np.int64(0xFFFFFFFF)).astype(np.float64)
    lo = (u & np.int64(0xFFFFFFFF)).astype(np.float64)
    lat = hi / 4294967296.0 * 180.0 - 90.0
    lon = lo / 4294967296.0 * 360.0 - 180.0
    return lat, lon


def coords_to_phash(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Quantize coords into a phash whose round-trip is exact at 2^-32 grid."""
    hi = np.clip(np.floor((lat + 90.0) / 180.0 * 4294967296.0), 0, 2**32 - 1)
    lo = np.clip(np.floor((lon + 180.0) / 360.0 * 4294967296.0), 0, 2**32 - 1)
    return (hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)).view(np.int64)


# ---------------------------------------------------------------- geometry


def cell_bbox(cell: np.ndarray, level: int = DEFAULT_LEVEL):
    """-> (min_x, min_y, max_x, max_y) arrays for each cell id."""
    n = 1 << level
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell % n
    iy = cell // n
    w = X_SPAN / n
    h = Y_SPAN / n
    return X_MIN + ix * w, Y_MIN + iy * h, X_MIN + (ix + 1) * w, Y_MIN + (iy + 1) * h


def bbox_min_dist(
    px: np.ndarray, py: np.ndarray, min_x, min_y, max_x, max_y
) -> np.ndarray:
    """L2 distance from points to axis-aligned boxes (0 if inside).

    Cross-cell analogue of the reference's distToRegion lower bound
    (``src/_l2space.hpp:134-168``): used to prune whole cells whose box
    cannot contain a closer point than the current kth distance
    (``shouldTraverse``, ``src/_kdtree_median.hpp:136-138``).
    Broadcasts: points (Q,) or (Q,1) against boxes (C,) -> (Q,C).
    """
    dx = np.maximum(0.0, np.maximum(min_x - px, px - max_x))
    dy = np.maximum(0.0, np.maximum(min_y - py, py - max_y))
    return np.sqrt(dx * dx + dy * dy)


def bbox_max_dist(
    px: np.ndarray, py: np.ndarray, min_x, min_y, max_x, max_y
) -> np.ndarray:
    """Distance from points to the FARTHEST corner of each box — a valid
    upper bound on the distance to any point inside the box (used to turn
    'these cells hold >= k points' into a kth-distance bound)."""
    dx = np.maximum(np.abs(px - min_x), np.abs(px - max_x))
    dy = np.maximum(np.abs(py - min_y), np.abs(py - max_y))
    return np.sqrt(dx * dx + dy * dy)


def neighbor_ring(cell: np.ndarray, ring: int, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """All cell ids with Chebyshev distance <= ring (clamped at grid edges,
    no wrap).  Returns unique sorted ids; vectorized over input cells."""
    n = 1 << level
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    ix = cell % n
    iy = cell // n
    offs = np.arange(-ring, ring + 1)
    ox, oy = np.meshgrid(offs, offs)
    nx = np.clip(ix[:, None] + ox.ravel()[None, :], 0, n - 1)
    ny = np.clip(iy[:, None] + oy.ravel()[None, :], 0, n - 1)
    return np.unique(ny * n + nx)


# ---------------------------------------------------------------- scalars


def level_for_count(n_rows: int, target_per_cell: int = 256, max_level: int = DEFAULT_LEVEL) -> int:
    """Data-adaptive level: ~target_per_cell rows per occupied cell assuming
    uniform spread.  At 10^12 rows the cap (level 13, 67M cells) yields
    ~15k rows/cell — right-sized for one Arrow batch per cell."""
    if n_rows <= 0:
        return 1
    import math

    lvl = int(math.floor(math.log(max(n_rows / target_per_cell, 1.0), 4)))
    return max(1, min(max_level, lvl))


def morton_id(lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Z-order (Morton) cell id — storage-locality variant.  Same buckets as
    :func:`cell_id`, different numbering; used only to ORDER files/rows so
    that spatially-near cells land in the same parquet row groups."""
    n = 1 << level
    ix = axis_index(lon, X_MIN, X_SPAN, n).astype(np.uint64)
    iy = axis_index(lat, Y_MIN, Y_SPAN, n).astype(np.uint64)

    def _spread(v: np.ndarray) -> np.ndarray:
        v = v & np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (_spread(ix) | (_spread(iy) << np.uint64(1))).view(np.int64)


def haversine(lat1, lon1, lat2, lon2, radius_km: float = 6371.0088) -> np.ndarray:
    """Great-circle distance in km (scalar function library entry; the join
    operators use planar L2 — see module docstring)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * radius_km * np.arcsin(np.sqrt(a))

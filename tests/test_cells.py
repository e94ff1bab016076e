"""Tiling index: golden values, determinism, SQL parity (FIXTURES.md F5)."""

import duckdb
import numpy as np
import pytest

from sparkkd import cells


def test_cell_id_golden():
    # level 2: 4x4 grid; hand-computed ids (cell = iy*4 + ix)
    lon = np.array([-180.0, -90.1, 0.0, 179.9, 180.0])
    lat = np.array([-90.0, -45.1, 0.0, 89.9, 90.0])
    # ix: 0, (89.9/360*4=0.99->0)... compute per formula
    got = cells.cell_id(lon, lat, level=2)
    n = 4
    ix = np.clip(np.floor((lon + 180) / 360 * n), 0, n - 1)
    iy = np.clip(np.floor((lat + 90) / 180 * n), 0, n - 1)
    assert np.array_equal(got, (iy * n + ix).astype(np.int64))
    # explicit corners
    assert cells.cell_id(np.array([-180.0]), np.array([-90.0]), 2)[0] == 0
    assert cells.cell_id(np.array([179.99]), np.array([89.99]), 2)[0] == 15
    # out-of-range clamps, never out of grid
    assert cells.cell_id(np.array([999.0]), np.array([999.0]), 2)[0] == 15


def test_cell_id_sql_parity_duckdb():
    """The SQL rendering must agree with NumPy bit-for-bit, including
    boundary values — this is what makes the DuckDB oracle trustworthy."""
    rng = np.random.default_rng(7)
    lon = np.concatenate([rng.uniform(-180, 180, 5000), [-180.0, 180.0, 0.0, -1e-9]])
    lat = np.concatenate([rng.uniform(-90, 90, 5000), [-90.0, 90.0, 0.0, 1e-9]])
    for level in (2, 7, 13):
        want = cells.cell_id(lon, lat, level)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
        got = con.execute(
            f"SELECT {cells.cell_id_sql('lon', 'lat', level)} AS c FROM pts"
        ).fetchnumpy()["c"]
        assert np.array_equal(want, got), level


def test_phash_roundtrip_exact():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-90, 90, 10000)
    lon = rng.uniform(-180, 180, 10000)
    ph = cells.coords_to_phash(lat, lon)
    lat2, lon2 = cells.phash_to_coords(ph)
    # quantization error bounded by one 2^-32 step
    assert np.abs(lat2 - lat).max() < 180 / 2**32 + 1e-12
    assert np.abs(lon2 - lon).max() < 360 / 2**32 + 1e-12
    # derived coords are a fixed point of the mapping
    assert np.array_equal(cells.coords_to_phash(lat2, lon2), ph)


def test_phash_sql_parity_duckdb():
    rng = np.random.default_rng(4)
    ph = cells.coords_to_phash(rng.uniform(-90, 90, 2000), rng.uniform(-180, 180, 2000))
    lat, lon = cells.phash_to_coords(ph)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"phash": ph}))
    res = con.execute(
        f"SELECT {cells.phash_lat_sql()} AS lat, {cells.phash_lon_sql()} AS lon FROM t"
    ).fetchnumpy()
    assert np.array_equal(res["lat"], lat)
    assert np.array_equal(res["lon"], lon)


def test_bbox_and_rings():
    level = 3  # 8x8
    c = cells.cell_id(np.array([0.1]), np.array([0.1]), level)
    min_x, min_y, max_x, max_y = cells.cell_bbox(c, level)
    assert min_x[0] <= 0.1 < max_x[0] and min_y[0] <= 0.1 < max_y[0]
    ring0 = cells.neighbor_ring(c, 0, level)
    assert np.array_equal(ring0, c)
    ring1 = cells.neighbor_ring(c, 1, level)
    assert len(ring1) == 9 and c[0] in ring1
    # corner cell: clamped ring has 4 members
    corner = np.array([0], dtype=np.int64)
    assert len(cells.neighbor_ring(corner, 1, level)) == 4


def test_bbox_dist_bounds():
    rng = np.random.default_rng(5)
    px, py = rng.uniform(-10, 10, 100), rng.uniform(-10, 10, 100)
    min_x, min_y, max_x, max_y = -1.0, -2.0, 3.0, 4.0
    dmin = cells.bbox_min_dist(px, py, min_x, min_y, max_x, max_y)
    dmax = cells.bbox_max_dist(px, py, min_x, min_y, max_x, max_y)
    # sample points in the box; every box point obeys dmin <= d <= dmax
    bx = rng.uniform(min_x, max_x, 500)
    by = rng.uniform(min_y, max_y, 500)
    d = np.sqrt((px[:, None] - bx[None, :]) ** 2 + (py[:, None] - by[None, :]) ** 2)
    assert (d.min(axis=1) >= dmin - 1e-9).all()
    assert (d.max(axis=1) <= dmax + 1e-9).all()
    inside = (px > min_x) & (px < max_x) & (py > min_y) & (py < max_y)
    assert (dmin[inside] == 0).all()


def test_morton_same_buckets_as_row_major():
    rng = np.random.default_rng(6)
    lon, lat = rng.uniform(-180, 180, 1000), rng.uniform(-90, 90, 1000)
    level = 5
    rm = cells.cell_id(lon, lat, level)
    mz = cells.morton_id(lon, lat, level)
    # same partition structure: row-major ids and morton ids are a bijection
    import pandas as pd

    df = pd.DataFrame({"rm": rm, "mz": mz})
    assert (df.groupby("rm")["mz"].nunique() == 1).all()
    assert (df.groupby("mz")["rm"].nunique() == 1).all()


def test_haversine_golden():
    # London -> Paris ~343.5 km (published great-circle distance)
    d = cells.haversine(51.5074, -0.1278, 48.8566, 2.3522)
    assert abs(d - 343.5) < 1.0
    assert cells.haversine(0.0, 0.0, 0.0, 0.0) == 0.0
    # quarter circumference: equator to pole
    assert abs(cells.haversine(0.0, 0.0, 90.0, 0.0) - 10007.5) < 5.0


def test_level_for_count():
    assert cells.level_for_count(10**12) == cells.DEFAULT_LEVEL
    assert 1 <= cells.level_for_count(1000) <= 3
    assert cells.level_for_count(0) == 1

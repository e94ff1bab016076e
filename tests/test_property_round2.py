"""Property-based tests (hypothesis) for round-2 primitives: quaternion
canonicalization, the quadtree coarsen map, and the home-edge invariant —
pure NumPy, no Spark session."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkkd import cells, engine, so3engine

finite = st.floats(
    min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
)


@given(st.lists(st.tuples(finite, finite, finite, finite), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_canon_sign_first_nonzero_positive(rows):
    q = np.array(rows, dtype=np.float64)
    s = so3engine.canon_sign_np(q)
    c = q * s[:, None]
    for row in c:
        nz = row[row != 0]
        if len(nz):
            assert nz[0] > 0
    # idempotent: canonical form has sign +1 (unless all-zero row)
    s2 = so3engine.canon_sign_np(c)
    nonzero = (q != 0).any(axis=1)
    assert (s2[nonzero] == 1.0).all()


@given(
    st.integers(min_value=0, max_value=(1 << 30) - 1),
    st.integers(min_value=4, max_value=15),
)
@settings(max_examples=100, deadline=None)
def test_coarsen_composes(cell, lvl):
    cell = np.array([cell % (1 << (2 * lvl))], dtype=np.int64)
    for mid in range(1, lvl):
        for lo in range(1, mid + 1):
            direct = engine._coarsen(cell, lvl, lo)
            via = engine._coarsen(engine._coarsen(cell, lvl, mid), mid, lo)
            assert direct[0] == via[0]


@given(
    st.floats(min_value=-179.99, max_value=179.99, allow_nan=False),
    st.floats(min_value=-89.99, max_value=89.99, allow_nan=False),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=100, deadline=None)
def test_home_edge_invariant(lon, lat, level):
    """Any point of any OTHER cell is at least `edge` away from a point
    inside its home cell — the exactness premise of the phase-2 early
    exit."""
    cid = int(cells.cell_id(np.array([lon]), np.array([lat]), level)[0])
    mnx, mny, mxx, mxy = cells.cell_bbox(np.array([cid]), level)
    wx = mxx[0] - mnx[0]
    edge = min(lon - mnx[0], mxx[0] - lon, lat - mny[0], mxy[0] - lat) - 1e-9
    # sample points in neighboring cells and check their distance >= edge
    rng = np.random.default_rng(7)
    ox = rng.uniform(-3 * wx, 3 * wx, 64)
    oy = rng.uniform(-3 * wx, 3 * wx, 64)
    px = np.clip(lon + ox, -180.0, 179.999999)
    py = np.clip(lat + oy, -90.0, 89.999999)
    other = cells.cell_id(px, py, level) != cid
    if other.any():
        d = np.sqrt((px[other] - lon) ** 2 + (py[other] - lat) ** 2)
        assert (d >= edge).all()

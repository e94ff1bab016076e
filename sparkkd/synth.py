"""Deterministic synthetic image+caption corpus and geo fixtures.

Generates the engine's primary input table in exactly the ``input_hint``
schema ``(image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64)`` plus query points, polygons and raster tiles
(FIXTURES.md F1-F4).  Everything is a pure function of (size, seed) — no
wall clock, no external data — mirroring the reference's deterministic
default-seeded samplers (``test/state_sampler.hpp:7-57``).

Coordinate convention (the documented constant from FIXTURES.md F1):
``phash`` carries the location — high 32 bits -> lat, low 32 bits -> lon via
:func:`sparkkd.cells.phash_to_coords`.  We sample coordinates first (uniform
over the globe AND clustered-with-hot-spot mixtures, per the reference's
uniform + clustered test corpora), quantize them into ``phash``, then derive
the canonical coords back FROM ``phash`` so the mapping is exact.

Pixels are a deterministic per-row pattern seeded by ``phash`` (vectorized
gradient — no per-row RNG), encoded with :mod:`sparkkd.codec`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import cells, codec

_WORDS = (
    "ocean cliff sunset harbor forest meadow glacier canyon desert reef "
    "skyline bridge lantern market temple garden valley summit lagoon dune"
).split()

SIZES = np.array([16, 24, 32], dtype=np.int32)
FMTS = ("raw", "bmp", "png", "q6")  # q6 is lossy (PSNR>=40 invariant)

# sf tag -> (n_images, n_queries)
SF_SIZES = {
    "sf0.001": (2_000, 200),
    "sf0.01": (20_000, 2_000),
    "sf0.1": (200_000, 50_000),
    # scaling-evidence corpora: long enough runs to amortize host noise.
    # sf2 is payload-light (tiny blobs): the kNN job's scan prunes to
    # (image_id, phash) anyway — verified in PLANS.md — so full images
    # would only slow fixture generation, not change the measured job.
    "sf1": (1_000_000, 400_000),
    "sf2": (4_000_000, 1_600_000),
}

LITE_TAGS = {"sf2"}

FIXTURE_VERSION = 4  # bump to invalidate cached fixtures (v4: lossy q6 rows)

# hot-spot box: all hot rows fall inside this tiny bbox -> one hot grid cell
# at any level <= ~13 (box is ~0.04 deg wide).  Exercises salting.
HOT_LON, HOT_LAT, HOT_W = 12.48, 41.89, 0.04
HOT_FRAC = 0.05
CLUSTER_FRAC = 0.30
N_CLUSTERS = 32


def _sample_coords(n: int, rng: np.random.Generator):
    """Mixture: uniform globe + Gaussian clusters + one hot spot."""
    n_hot = int(n * HOT_FRAC)
    n_clu = int(n * CLUSTER_FRAC)
    n_uni = n - n_hot - n_clu
    lon_u = rng.uniform(-180.0, 180.0, n_uni)
    lat_u = rng.uniform(-90.0, 90.0, n_uni)
    centers_lon = rng.uniform(-170.0, 170.0, N_CLUSTERS)
    centers_lat = rng.uniform(-80.0, 80.0, N_CLUSTERS)
    which = rng.integers(0, N_CLUSTERS, n_clu)
    lon_c = np.clip(centers_lon[which] + rng.normal(0, 0.8, n_clu), -180.0, 179.999)
    lat_c = np.clip(centers_lat[which] + rng.normal(0, 0.8, n_clu), -90.0, 89.999)
    lon_h = rng.uniform(HOT_LON, HOT_LON + HOT_W, n_hot)
    lat_h = rng.uniform(HOT_LAT, HOT_LAT + HOT_W, n_hot)
    lon = np.concatenate([lon_u, lon_c, lon_h])
    lat = np.concatenate([lat_u, lat_c, lat_h])
    order = rng.permutation(n)
    return lon[order], lat[order]


def _captions(image_ids: np.ndarray, phash: np.ndarray) -> np.ndarray:
    """Deterministic caption per row, vectorized via phash bit slices."""
    w = np.asarray(_WORDS)
    u = phash.view(np.uint64)
    t1 = w[(u >> np.uint64(3)) % np.uint64(len(w))]
    t2 = w[(u >> np.uint64(17)) % np.uint64(len(w))]
    t3 = w[(u >> np.uint64(41)) % np.uint64(len(w))]
    return np.char.add(
        np.char.add(np.char.add("caption for ", image_ids), ": "),
        np.char.add(np.char.add(np.char.add(t1, " "), np.char.add(t2, " ")), t3),
    )


def gen_images(n: int, seed: int = 42, lite: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    lon, lat = _sample_coords(n, rng)
    phash = cells.coords_to_phash(lat, lon)
    # canonical coords = derived back from phash (exact round trip)
    lat, lon = cells.phash_to_coords(phash)
    image_ids = np.array([f"img{i:08d}" for i in range(n)])
    u = phash.view(np.uint64)
    w = SIZES[(u % np.uint64(3)).astype(np.int64)]
    h = SIZES[((u >> np.uint64(7)) % np.uint64(3)).astype(np.int64)]
    fmt_idx = ((u >> np.uint64(13)) % np.uint64(4)).astype(np.int64)
    a = ((u >> np.uint64(20)) & np.uint64(0xFF)).astype(np.int64)
    b = ((u >> np.uint64(28)) & np.uint64(0xFF)).astype(np.int64)
    c = ((u >> np.uint64(36)) & np.uint64(0xFF)).astype(np.int64)

    blobs: list[bytes]
    if lite:
        # payload-light corpora for scaling benches: an 8-byte token keeps
        # the schema shape; geo joins never read `bytes` (column pruning)
        blobs = [x.tobytes() for x in phash]
        fmt_idx = np.zeros(n, dtype=np.int64)
    else:
        blobs = []
        # group rows by (w, h) so the pixel pattern computes as one vector op
        pixel_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for i in range(n):  # encode loop: per-image zlib/struct, cached grids
            wi, hi = int(w[i]), int(h[i])
            if (wi, hi) not in pixel_cache:
                yy, xx = np.mgrid[0:hi, 0:wi]
                pixel_cache[(wi, hi)] = (xx, yy)
            xx, yy = pixel_cache[(wi, hi)]
            px = np.empty((hi, wi, 3), dtype=np.uint8)
            px[:, :, 0] = (a[i] * 3 + xx * 5 + yy * 7) % 256
            px[:, :, 1] = (b[i] * 3 + xx * 11 + yy * 2) % 256
            px[:, :, 2] = (c[i] * 3 + xx * 4 + yy * 13) % 256
            blobs.append(codec.encode(px, FMTS[fmt_idx[i]]))

    return pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array([FMTS[j] for j in fmt_idx], pa.string()),
            "caption": pa.array(_captions(image_ids, phash), pa.string()),
            "phash": pa.array(phash, pa.int64()),
        }
    )


def expected_pixels(phash: int, w: int, h: int) -> np.ndarray:
    """Recompute the deterministic pattern for invariant checks."""
    u = np.uint64(int(phash) & 0xFFFFFFFFFFFFFFFF)
    a = int((u >> np.uint64(20)) & np.uint64(0xFF))
    b = int((u >> np.uint64(28)) & np.uint64(0xFF))
    c = int((u >> np.uint64(36)) & np.uint64(0xFF))
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = (a * 3 + xx * 5 + yy * 7) % 256
    px[:, :, 1] = (b * 3 + xx * 11 + yy * 2) % 256
    px[:, :, 2] = (c * 3 + xx * 4 + yy * 13) % 256
    return px


def gen_queries(nq: int, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    lon, lat = _sample_coords(nq, rng)
    return pa.table(
        {
            "query_id": pa.array([f"q{i:08d}" for i in range(nq)], pa.string()),
            "qlat": pa.array(lat, pa.float64()),
            "qlon": pa.array(lon, pa.float64()),
        }
    )


def gen_polygons(n_poly: int = 32, seed: int = 44) -> pa.Table:
    """Vertex-exploded polygons: (poly_id, ring, seq, x=lon, y=lat).

    Mix of convex regular n-gons (n in 3..8), non-convex stars, and one
    polygon with a hole (ring 1 = inner ring).  Ray-cast semantics: a point
    is inside iff crossing count over ALL rings is odd.
    """
    rng = np.random.default_rng(seed)
    rows_pid, rows_ring, rows_seq, rows_x, rows_y = [], [], [], [], []

    def emit(pid: str, ring: int, xs: np.ndarray, ys: np.ndarray):
        for s, (x, y) in enumerate(zip(xs, ys)):
            rows_pid.append(pid)
            rows_ring.append(ring)
            rows_seq.append(s)
            rows_x.append(float(x))
            rows_y.append(float(y))

    for i in range(n_poly):
        pid = f"poly{i:04d}"
        cx = rng.uniform(-150.0, 150.0)
        cy = rng.uniform(-70.0, 70.0)
        r = rng.uniform(1.0, 8.0)
        if i % 3 == 2:  # star (non-convex)
            k = int(rng.integers(5, 8))
            ang = np.arange(2 * k) * np.pi / k + rng.uniform(0, np.pi)
            rad = np.where(np.arange(2 * k) % 2 == 0, r, r * 0.45)
            emit(pid, 0, cx + rad * np.cos(ang), cy + rad * np.sin(ang))
        else:  # convex regular n-gon
            k = int(rng.integers(3, 9))
            ang = np.arange(k) * 2 * np.pi / k + rng.uniform(0, np.pi)
            emit(pid, 0, cx + r * np.cos(ang), cy + r * np.sin(ang))
        if i == n_poly - 1:  # donut: add a hole ring
            k = 6
            ang = np.arange(k) * 2 * np.pi / k
            emit(pid, 1, cx + 0.4 * r * np.cos(ang), cy + 0.4 * r * np.sin(ang))

    return pa.table(
        {
            "poly_id": pa.array(rows_pid, pa.string()),
            "ring": pa.array(rows_ring, pa.int32()),
            "seq": pa.array(rows_seq, pa.int32()),
            "x": pa.array(rows_x, pa.float64()),
            "y": pa.array(rows_y, pa.float64()),
        }
    )


def gen_tiles(grid: int = 16, seed: int = 45) -> pa.Table:
    """Raster tiles: regular grid over the globe with deterministic pixels."""
    xs = np.linspace(-180.0, 180.0, grid + 1)
    ys = np.linspace(-90.0, 90.0, grid + 1)
    tid, min_x, min_y, max_x, max_y, pix = [], [], [], [], [], []
    for iy in range(grid):
        for ix in range(grid):
            tid.append(f"8/{ix}/{iy}")
            min_x.append(xs[ix])
            min_y.append(ys[iy])
            max_x.append(xs[ix + 1])
            max_y.append(ys[iy + 1])
            yy, xx = np.mgrid[0:16, 0:16]
            px = np.empty((16, 16, 3), dtype=np.uint8)
            px[:, :, 0] = (ix * 16 + xx) % 256
            px[:, :, 1] = (iy * 16 + yy) % 256
            px[:, :, 2] = (ix * iy + xx * yy) % 256
            pix.append(codec.encode_raw(px))
    return pa.table(
        {
            "tile_id": pa.array(tid, pa.string()),
            "min_x": pa.array(min_x, pa.float64()),
            "min_y": pa.array(min_y, pa.float64()),
            "max_x": pa.array(max_x, pa.float64()),
            "max_y": pa.array(max_y, pa.float64()),
            "pixels": pa.array(pix, pa.binary()),
        }
    )


def _caption_slice_sql(shift: int, dialect: str) -> str:
    """Logical-shift-then-mod word index on the SIGNED phash: the mask
    keeps bits 0..(63-shift) of the shifted value, discarding the
    sign-extension fill, so arithmetic shift equals logical shift in both
    Spark (shiftright function) and DuckDB (>> operator)."""
    mask = (1 << (64 - shift)) - 1
    sh = f"shiftright(phash, {shift})" if dialect == "spark" else f"(phash >> {shift})"
    return f"((({sh}) & {mask}) % {len(_WORDS)})"


def caption_expr_sql(dialect: str) -> str:
    """The caption as a pure SQL function of (image_id, phash) — identical
    semantics in Spark ('spark') and DuckDB ('duckdb'); used by the
    caption_fidelity driver row to verify byte-equality end to end
    (north_rule: captions byte-equal)."""
    t1 = _caption_slice_sql(3, dialect)
    t2 = _caption_slice_sql(17, dialect)
    t3 = _caption_slice_sql(41, dialect)
    if dialect == "spark":
        words = ", ".join(f"'{w}'" for w in _WORDS)
        pick = lambda t: f"element_at(array({words}), CAST({t} AS INT) + 1)"  # noqa: E731
    else:
        words = ", ".join(f"'{w}'" for w in _WORDS)
        pick = lambda t: f"list_extract([{words}], CAST({t} AS INT) + 1)"  # noqa: E731
    return (
        f"concat('caption for ', image_id, ': ', {pick(t1)}, ' ',"
        f" {pick(t2)}, ' ', {pick(t3)})"
    )


# ---------------------------------------------------------------- fixtures


def fixtures_root() -> Path:
    return Path(os.environ.get("SPARKKD_FIXTURES", "/root/repo/_fixtures"))


# --------------------------------------------------------------- poses (SE3)

# sf tag -> (n_poses, n_pose_queries): sized like the image corpus
POSE_SIZES = {
    "sf0.001": (2_000, 200),
    "sf0.01": (20_000, 2_000),
    "sf0.1": (200_000, 20_000),
    "sf1": (1_000_000, 100_000),
    "sf2": (4_000_000, 400_000),
}

POSE_FIXTURE_VERSION = 1

# orientation cluster: 20% of poses near one quaternion (hot-cell skew for
# the SO(3) grid, mirroring the reference's clustered samplers)
_POSE_CLUSTER_FRAC = 0.2
_TRANS_SPAN = 50.0


def _sample_poses(n: int, rng: np.random.Generator):
    """Unit quaternions (uniform via normalized Gaussians + one cluster) and
    translations (uniform box + matching cluster)."""
    q = rng.normal(size=(n, 4))
    n_c = int(n * _POSE_CLUSTER_FRAC)
    base = np.array([0.9, 0.1, 0.3, 0.28])
    q[:n_c] = base[None, :] + rng.normal(0.0, 0.05, (n_c, 4))
    q /= np.sqrt((q * q).sum(axis=1, keepdims=True))
    t = rng.uniform(-_TRANS_SPAN, _TRANS_SPAN, (n, 3))
    t[:n_c] = rng.normal(0.0, 1.0, (n_c, 3)) + 7.0
    order = rng.permutation(n)
    return q[order], t[order]


def _pose_table(ids: np.ndarray, q: np.ndarray, t: np.ndarray, id_name: str) -> pa.Table:
    return pa.table(
        {
            id_name: pa.array(ids, pa.string()),
            "qw": pa.array(q[:, 0], pa.float64()),
            "qx": pa.array(q[:, 1], pa.float64()),
            "qy": pa.array(q[:, 2], pa.float64()),
            "qz": pa.array(q[:, 3], pa.float64()),
            "tx": pa.array(t[:, 0], pa.float64()),
            "ty": pa.array(t[:, 1], pa.float64()),
            "tz": pa.array(t[:, 2], pa.float64()),
        }
    )


def gen_poses(n: int, seed: int = 52) -> pa.Table:
    q, t = _sample_poses(n, np.random.default_rng(seed))
    ids = np.array([f"pose{i:08d}" for i in range(n)])
    return _pose_table(ids, q, t, "pose_id")


def gen_pose_queries(nq: int, seed: int = 53) -> pa.Table:
    q, t = _sample_poses(nq, np.random.default_rng(seed))
    ids = np.array([f"pq{i:08d}" for i in range(nq)])
    return _pose_table(ids, q, t, "query_id")


def ensure_pose_fixtures(tag: str) -> Path:
    """Idempotently materialize the pose fixtures (separate manifest from
    the image fixtures so adding poses never regenerates image corpora)."""
    n, nq = POSE_SIZES[tag]
    out = fixtures_root() / tag
    out.mkdir(parents=True, exist_ok=True)
    manifest = out / "poses_manifest.json"
    want = {"version": POSE_FIXTURE_VERSION, "n": n, "nq": nq}
    if manifest.exists():
        try:
            if json.loads(manifest.read_text()) == want:
                return out
        except Exception:
            pass
    pq.write_table(gen_poses(n), out / "poses.parquet")
    pq.write_table(gen_pose_queries(nq), out / "pose_queries.parquet")
    manifest.write_text(json.dumps(want))
    return out


def sf_tag(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01'."""
    name = Path(sf_dir).name
    return name if name in SF_SIZES else "sf0.01"


def ensure_fixtures(tag: str) -> Path:
    """Idempotently materialize the fixture parquet files for one sf tag."""
    n, nq = SF_SIZES[tag]
    out = fixtures_root() / tag
    manifest = out / "manifest.json"
    want = {"version": FIXTURE_VERSION, "n": n, "nq": nq}
    if manifest.exists():
        try:
            if json.loads(manifest.read_text()) == want:
                return out
        except Exception:
            pass
    tmp = out.with_suffix(".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    pq.write_table(gen_images(n, lite=tag in LITE_TAGS), tmp / "images.parquet")
    pq.write_table(gen_queries(nq), tmp / "queries.parquet")
    pq.write_table(gen_polygons(), tmp / "polygons.parquet")
    pq.write_table(gen_tiles(), tmp / "tiles.parquet")
    (tmp / "manifest.json").write_text(json.dumps(want))
    if out.exists():
        import shutil

        shutil.rmtree(out)
    tmp.rename(out)
    return out


def fixture_path(tag: str, table: str) -> str:
    return str(fixtures_root() / tag / f"{table}.parquet")

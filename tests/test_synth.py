"""Fixture generator: determinism, schema, pixel/caption invariants."""

import numpy as np
import pyarrow.parquet as pq

from sparkkd import cells, codec, synth


def test_images_schema_and_determinism():
    t1 = synth.gen_images(200, seed=42)
    t2 = synth.gen_images(200, seed=42)
    assert t1.equals(t2)  # byte-identical across runs
    assert t1.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert str(t1.schema.field("phash").type) == "int64"
    assert str(t1.schema.field("w").type) == "int32"


def test_pixel_invariant_decodable():
    """Every blob decodes to the deterministic phash-seeded pattern
    (FIXTURES.md invariant 3; north_star decoded-pixel allclose: byte-exact
    for lossless formats, PSNR >= 40 dB + bounded error for lossy q6)."""
    t = synth.gen_images(160, seed=42).to_pandas()
    fmts = set()
    for _, row in t.iterrows():
        px = codec.decode(row["bytes"], row["fmt"], row["w"], row["h"])
        want = synth.expected_pixels(row["phash"], row["w"], row["h"])
        fmts.add(row["fmt"])
        if codec.is_lossless(row["fmt"]):
            assert (px == want).all()
        else:
            assert np.abs(px.astype(np.int16) - want.astype(np.int16)).max() <= 3
            assert codec.psnr(px, want) >= 40.0
    assert fmts == set(codec.FORMATS)  # corpus exercises every format incl. lossy


def test_caption_deterministic_from_phash():
    t = synth.gen_images(50, seed=42).to_pandas()
    assert t["caption"].str.startswith("caption for img").all()


def test_hot_spot_exists():
    """Clustered mixture puts >= HOT_FRAC of rows in one tiny box ->
    exercises hot-cell salting at any reasonable level."""
    t = synth.gen_images(5000, seed=42).to_pandas()
    lat, lon = cells.phash_to_coords(t["phash"].to_numpy())
    cid = cells.cell_id(lon, lat, level=7)
    top = np.bincount(cid - cid.min()).max()
    assert top >= synth.HOT_FRAC * len(t) * 0.9


def test_fixture_dir_idempotent(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARKKD_FIXTURES", str(tmp_path))
    p1 = synth.ensure_fixtures("sf0.001")
    stat1 = (p1 / "images.parquet").stat().st_mtime_ns
    p2 = synth.ensure_fixtures("sf0.001")
    assert (p2 / "images.parquet").stat().st_mtime_ns == stat1  # no rewrite
    n, nq = synth.SF_SIZES["sf0.001"]
    assert pq.ParquetFile(p1 / "images.parquet").metadata.num_rows == n
    assert pq.ParquetFile(p1 / "queries.parquet").metadata.num_rows == nq


def test_polygons_have_rings_and_star():
    t = synth.gen_polygons().to_pandas()
    assert set(t.columns) == {"poly_id", "ring", "seq", "x", "y"}
    assert (t["ring"] == 1).any()  # donut hole present
    counts = t[t.ring == 0].groupby("poly_id").size()
    assert counts.max() >= 10  # star polygons (2k vertices, k>=5)
    assert counts.min() >= 3


def test_tiles_grid_covers_globe():
    t = synth.gen_tiles(grid=8).to_pandas()
    assert len(t) == 64
    assert t["min_x"].min() == -180.0 and t["max_x"].max() == 180.0
    px = codec.decode_raw(t.iloc[0]["pixels"], 16, 16)
    assert px.shape == (16, 16, 3)

"""Training-data pipeline operators over the documents/embeddings tables.

The operations a large-scale training-data pipeline needs, each built
Spark-first (built-in exprs where possible, Arrow kernels where not):

* deduplication — exact (hash groupBy), n-gram Jaccard (shingle equi-join),
  MinHash+LSH (band bucketing; the scale path), SimHash fingerprints;
* similarity search — brute-force cosine top-k over an embedding column
  (baseline), with the LSH/banded pattern shared with minhash for scale;
* text analysis — token/quality stats, language-marker scoring,
  rolling-hash document fingerprints;
* multimodal — image decode + feature extraction through the real stdlib
  codecs (sparkkd.codec); audio/video decode is STUBBED (no media libs in
  this sandbox) behind NotImplementedError with a deterministic fake so the
  Spark plumbing (schema, batching, partitioning) is real and tested.

Determinism: every operator is a pure function of its input table —
hashes are blake2b/md5 (not Python's salted hash), floats are rounded
where two engines must agree (see oracle notes per function).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import codec

# ------------------------------------------------------------ dedup: exact


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one keeper (min doc_id) per distinct
    text.  Pure built-in exprs -> whole-stage codegen, one shuffle."""
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper")
    )


# ----------------------------------------------------- dedup: n-gram Jaccard


def _shingles_expr(col: str, n: int = 3) -> str:
    """Character n-gram shingle array as a Spark/DuckDB-shared idiom:
    substring(text, i, n) for i in 1..len-n+1 (1-based in both)."""
    return (
        f"transform(sequence(1, greatest(length({col}) - {n - 1}, 1)),"
        f" i -> substring({col}, i, {n}))"
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, n: int = 3) -> DataFrame:
    """Near-dup pairs by EXACT Jaccard over character n-gram shingle sets.

    Classic distributed set-similarity join: explode distinct shingles,
    self-equi-join on shingle (co-partitioned shuffle join — never a cross
    join), count intersections, Jaccard = c / (|A| + |B| - c).

    Output (doc_a, doc_b, jacc) with doc_a < doc_b, jacc rounded to 6dp
    (integer-derived division is exact in both engines; rounding is belt
    and braces)."""
    sh = docs.select(
        "doc_id", F.explode(F.expr(_shingles_expr("text", n))).alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("m"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("ma"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("mb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jacc",
            F.round(
                F.col("c").cast("double")
                / (F.col("ma") + F.col("mb") - F.col("c")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jacc") >= threshold)
        .select("doc_a", "doc_b", "jacc")
    )


# ------------------------------------------------------ dedup: MinHash+LSH


_MERSENNE = (1 << 61) - 1


def _stable_hash64(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per string (blake2b, not salted)."""
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in tokens
        ],
        dtype=np.uint64,
    )


def _minhash_params(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame, n_perm: int = 64, shingle_words: int = 3, seed: int = 7
) -> DataFrame:
    """(doc_id, sig array<long>) — MinHash over word shingles, vectorized
    per Arrow batch (loop over permutations happens as one (S, P) matmul-
    style modular op, never per row)."""
    a, b = _minhash_params(n_perm, seed)

    def gen(batches):
        for pdf in batches:
            out_rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                sh = np.unique(
                    [" ".join(toks[i : i + shingle_words]) for i in range(max(len(toks) - shingle_words + 1, 1))]
                )
                h = _stable_hash64(sh).astype(object)  # python ints: exact mod
                # (S,P) permuted hashes; object dtype keeps exact 61-bit math
                m = (h[:, None] * a.astype(object)[None, :] + b.astype(object)[None, :]) % _MERSENNE
                out_rows.append((int(doc_id), m.min(axis=0).astype(np.int64).tolist()))
            yield pd.DataFrame(out_rows, columns=["doc_id", "sig"])

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id long, sig array<long>")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Scale-path near-dup: band the MinHash signature (bands x rows), bucket
    by (band, band-hash) equi-join to get candidates, then verify candidates
    with EXACT word-shingle Jaccard.  Only candidate pairs are verified —
    the full O(n^2) comparison never materializes.  Deterministic.

    Output (doc_a, doc_b, jacc) with jacc >= threshold, rounded 6dp."""
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(docs, n_perm, shingle_words)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b AS band, xxhash64(slice(sig, b*{rows_per_band}+1, {rows_per_band})) AS bh))"
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify with exact Jaccard over word shingles (same shingling as sigs)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""transform(
                      sequence(1, greatest(size(split(text, ' ')) - {shingle_words - 1}, 1)),
                      i -> array_join(slice(split(text, ' '), i, {shingle_words}), ' '))"""
            )
        ).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("m"))
    # intersection via join on (pair, shingle): attach shingles of both sides
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh"))
    c = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    return (
        c.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("ma")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("mb")), "doc_b")
        .withColumn(
            "jacc",
            F.round(
                F.col("c").cast("double")
                / (F.col("ma") + F.col("mb") - F.col("c")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jacc") >= threshold)
        .select("doc_a", "doc_b", "jacc")
    )


# ------------------------------------------- dedup: exact Hamming banding


def phash_near_dup(images: DataFrame, max_hamming: int = 8) -> DataFrame:
    """EXACT near-duplicate image pairs by Hamming distance on the 64-bit
    perceptual hash: all (a, b) with ``popcount(phash_a XOR phash_b) <=
    max_hamming``, a < b by image_id.

    Pigeonhole banding makes this exact WITHOUT a cross join: split the 64
    bits into ``max_hamming + 1`` bands — two hashes within distance t must
    agree on at least one band (t flipped bits cannot touch all t+1 bands).
    Candidates come from per-band equi-joins (co-partitioned shuffle
    joins), then the exact popcount filter runs as a built-in expression.
    This is the standard scalable simhash/phash dedup pattern.

    Output (id_a, id_b, hamming), hamming as int."""
    bands = max_hamming + 1
    width = 64 // bands
    # band b = bits [b*width, (b+1)*width) (remainder bits join the last
    # band — any contiguous partition works for the pigeonhole argument)
    exprs = []
    for b in range(bands):
        lo = b * width
        if b < bands - 1:
            mask = (1 << width) - 1
            key = f"shiftrightunsigned(phash, {lo}) & {mask}"
        else:  # last band reaches bit 63: the logical shift IS the mask
            key = f"shiftrightunsigned(phash, {lo})"
        exprs.append(f"struct({b} AS band, {key} AS key)")
    banded = images.select(
        F.col("image_id"),
        F.col("phash"),
        F.explode(F.expr(f"array({', '.join(exprs)})")).alias("e"),
    ).select("image_id", "phash", "e.band", "e.key")
    a = banded.alias("a")
    b = banded.alias("b")
    # popcount filter BEFORE distinct: candidates are band-join-sized (can
    # be millions) while survivors are few — dedupe only the survivors
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .select("id_a", "id_b", F.col("hamming").cast("int"))
    )


# --------------------------------------------------------- dedup: SimHash


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over word unigrams, weighted by
    term frequency; bit votes computed as one (T, 64) unpackbits matrix per
    Arrow batch."""

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks, counts = np.unique(text.split(" "), return_counts=True)
                h = _stable_hash64(toks)
                bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
                votes = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
                fp_bits = (votes > 0).astype(np.uint8)
                fp = int.from_bytes(np.packbits(fp_bits, bitorder="little").tobytes(), "little")
                out.append((int(doc_id), fp - (1 << 64) if fp >= 1 << 63 else fp))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id long, simhash long")


# ------------------------------------------------------------------- ANN


def ann_cosine_topk(embeddings: DataFrame, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k per vector (self excluded) — the exactness
    baseline for similarity search.  The corpus matrix is broadcast once;
    each Arrow batch does one (B, N) float64 matmul.  Rank is computed on
    the 6dp-ROUNDED similarity (tie-broken by neighbor id) so independent
    engines agree despite summation-order float noise.

    Scale path: swap the broadcast matrix for the LSH band-bucket pattern
    (minhash_lsh_pairs) or an IVF coarse quantizer over cell_id-style
    buckets — same candidate->verify shape as the geo kNN join."""
    pdf = embeddings.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((ids, Mn))

    def gen(batches):
        all_ids, Mn_ = bc.value
        for p in batches:
            if len(p) == 0:
                continue
            q = np.array(p["embedding"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ Mn_.T  # (B, N)
            qids = p["vec_id"].to_numpy(np.int64)
            sims[qids[:, None] == all_ids[None, :]] = -np.inf  # exclude self
            simr = np.round(sims, 6)
            # top-k by (rounded sim desc, neighbor id asc)
            order = np.lexsort((all_ids[None, :].repeat(len(qids), 0), -simr), axis=1)[:, :k]
            rows = np.repeat(qids, k)
            cols = order.ravel()
            yield pd.DataFrame(
                {
                    "vec_id": rows,
                    "neighbor_id": all_ids[cols],
                    "sim": simr[np.repeat(np.arange(len(qids)), k), cols],
                    "rank": np.tile(np.arange(1, k + 1), len(qids)),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        gen, schema="vec_id long, neighbor_id long, sim double, rank int"
    )


def ann_lsh_cosine_topk(
    embeddings: DataFrame, k: int = 10, n_planes: int = 6, n_tables: int = 24, seed: int = 5
) -> DataFrame:
    """Scale-path ANN: random-hyperplane LSH.  Each of ``n_tables`` hash
    tables buckets vectors by the sign pattern of ``n_planes`` random
    projections; candidates = vectors sharing a bucket in ANY table;
    candidates are scored exactly and top-k kept.  Same candidate->verify
    shape as the geo kNN join: the only joins are equi-joins on
    (table, bucket) — never a cross join — so it scales to corpora where
    the brute-force broadcast matrix cannot exist.

    Approximate by design: recall measured against ann_cosine_topk in
    tests (recall@1 = 0.73, recall@10 = 0.67 at these defaults on the
    RANDOM fixture corpus — the adversarial case for LSH; real clustered
    embeddings bucket far better).  Deterministic given (seed, n_planes,
    n_tables)."""
    spark = embeddings.sparkSession
    first = embeddings.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    bc = spark.sparkContext.broadcast(planes)

    def bucketize(batches):
        P = bc.value
        for p in batches:
            if len(p) == 0:
                continue
            M = np.array(p["embedding"].tolist(), dtype=np.float64)
            ids = p["vec_id"].to_numpy(np.int64)
            rows = []
            for t in range(P.shape[0]):  # loop over tables, not rows
                signs = (M @ P[t].T) > 0  # (B, n_planes)
                buckets = (signs * (1 << np.arange(P.shape[1]))[None, :]).sum(axis=1)
                rows.append(
                    pd.DataFrame(
                        {"vec_id": ids, "tbl": t, "bucket": buckets.astype(np.int64)}
                    )
                )
            yield pd.concat(rows)

    hashed = embeddings.select("vec_id", "embedding").mapInPandas(
        bucketize, schema="vec_id long, tbl int, bucket long"
    )
    a = hashed.alias("a")
    b = hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    # exact scoring of candidates only (vectors re-joined by id)
    emb_a = embeddings.select(
        F.col("vec_id"), F.col("embedding").alias("ea")
    )
    emb_b = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb")
    )
    paired = cand.join(emb_a, "vec_id").join(emb_b, "neighbor_id")

    def score(batches):
        for p in batches:
            if len(p) == 0:
                continue
            A = np.array(p["ea"].tolist(), dtype=np.float64)
            B = np.array(p["eb"].tolist(), dtype=np.float64)
            sim = (A * B).sum(axis=1) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            yield pd.DataFrame(
                {
                    "vec_id": p["vec_id"].to_numpy(np.int64),
                    "neighbor_id": p["neighbor_id"].to_numpy(np.int64),
                    "sim": np.round(sim, 6),
                }
            )

    scored = paired.mapInPandas(score, schema="vec_id long, neighbor_id long, sim double")
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


# ------------------------------------------------------------- text stats


STOPWORDS = ("a", "the")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc quality metrics — all built-in exprs (codegen, no UDF):
    token count, unique tokens, stopword count, stopword ratio."""
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias("stopword_cnt"),
    ).withColumn(
        "stopword_ratio",
        F.round(F.col("stopword_cnt").cast("double") / F.col("n_tokens").cast("double"), 6),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting two ways (both codegen'd, no UDF):
    whitespace tokens and BPE-ish regex tokens (word pieces OR single
    non-space symbols — the classic pre-tokenizer shape).  The regex is
    identical in Spark and DuckDB (ASCII corpus; both engines' regex
    dialects agree on this pattern)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]', 0)")).alias(
            "bpe_tokens"
        ),
    )


def lang_token_stats(docs: DataFrame) -> DataFrame:
    """Corpus roll-up per language label."""
    toks = F.split(F.col("text"), " ")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


def lang_id_score(docs: DataFrame) -> DataFrame:
    """Deterministic marker-token language scorer (heuristic lang-ID shape:
    per-language marker lexicons -> hit counts -> argmax with a fixed
    tie order).  The fixture corpus shares one vocabulary across langs, so
    accuracy is not the point — determinism and SQL-parity are."""
    markers = {
        "en": ("the", "a", "key"),
        "es": ("data", "row"),
        "de": ("hash", "sort"),
        "fr": ("query", "agg"),
        "zh": ("table", "value"),
    }
    toks = F.split(F.col("text"), " ")

    def _contains(arr):
        return lambda t: F.array_contains(arr, t)  # 1-arg lambda (element only)

    score_cols = []
    for lang, ms in markers.items():
        arr = F.array(*[F.lit(m) for m in ms])
        score_cols.append(F.size(F.filter(toks, _contains(arr))).alias(f"s_{lang}"))
    scored = docs.select("doc_id", "lang", *score_cols)
    # argmax with fixed tie order: first lang in markers order wins ties
    best = F.greatest(*[F.col(f"s_{lang}") for lang in markers])
    chain = None
    for lang in markers:
        cond = F.col(f"s_{lang}") == best
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return scored.select(
        "doc_id", F.col("lang").alias("label"), chain.alias("pred_lang")
    )


def doc_fingerprint(docs: DataFrame, base: int = 131, mod: int = (1 << 31) - 1) -> DataFrame:
    """(doc_id, fp) — polynomial rolling hash of the text bytes (Horner),
    vectorized across the batch: the loop runs over CHARACTER POSITIONS of
    the padded (B, Lmax) byte matrix, never over rows."""

    def gen(batches):
        for pdf in batches:
            texts = pdf["text"].to_list()
            if not texts:
                continue
            lmax = max(len(t) for t in texts)
            mat = np.zeros((len(texts), lmax), dtype=np.uint64)
            lens = np.array([len(t) for t in texts])
            for i, t in enumerate(texts):
                mat[i, : len(t)] = np.frombuffer(t.encode("latin-1", "replace"), dtype=np.uint8)
            h = np.zeros(len(texts), dtype=np.uint64)
            for j in range(lmax):  # loop over char positions (vector per step)
                active = j < lens
                h[active] = (h[active] * np.uint64(base) + mat[active, j]) % np.uint64(mod)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(np.int64), "fp": h.astype(np.int64)})

    return docs.select("doc_id", "text").mapInPandas(gen, schema="doc_id long, fp long")


# ------------------------------------------------------------- multimodal


IMAGE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double,"
    " mean_b double, crc int"
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode every image blob through the real stdlib codecs and extract
    channel means + a CRC fingerprint — the multimodal feature-extract
    pattern (opaque binary column + typed metadata -> Arrow batch UDF).
    Decode is per-row by nature (zlib/struct are C-speed); stats are NumPy."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = codec.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                m = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        r.image_id,
                        int(r.w),
                        int(r.h),
                        r.fmt,
                        round(float(m[0]), 6),
                        round(float(m[1]), 6),
                        round(float(m[2]), 6),
                        zlib.crc32(px.tobytes()) & 0x7FFFFFFF,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b", "crc"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=IMAGE_STATS_SCHEMA
    )


def decode_audio(blob: bytes, fmt: str) -> np.ndarray:
    """STUB — no audio libs in this sandbox.  The Spark plumbing around it
    (media_features with fake=True) is real and tested."""
    raise NotImplementedError("audio decoding requires libs absent from this environment")


def decode_video_frames(blob: bytes, fmt: str, every_n: int = 10) -> np.ndarray:
    """STUB — no video libs in this sandbox (see decode_audio)."""
    raise NotImplementedError("video decoding requires libs absent from this environment")


def media_features(
    df: DataFrame, kind: str, fake: bool = False, id_col: str = "image_id"
) -> DataFrame:
    """Generic media feature-extraction plumbing: opaque binary column in,
    fixed-width feature vector out, one Arrow batch at a time.  For
    kind='audio'/'video' the decoder is stubbed; fake=True substitutes a
    deterministic blake2b-derived vector so schema/partitioning/batch shape
    are exercised end-to-end."""

    def gen(batches):
        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                blob = bytes(r.bytes)
                if fake:
                    d = hashlib.blake2b(blob, digest_size=32).digest()
                    v = np.frombuffer(d, dtype=np.uint8).astype(np.float64) / 255.0
                elif kind == "audio":
                    v = decode_audio(blob, "wav")
                elif kind == "video":
                    v = decode_video_frames(blob, "mp4").mean(axis=0)
                else:
                    raise ValueError(kind)
                ids.append(getattr(r, id_col))
                feats.append(v[:32].tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select(F.col(id_col), "bytes").mapInPandas(
        gen, schema="media_id string, features array<double>"
    )

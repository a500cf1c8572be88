"""Training-data pipeline operators over document corpora: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), quality heuristics, and
similarity search helpers. Everything is built-in-expression-only (JVM-side,
whole-stage codegen) — no Python in any hot path.

The SQL-twin-checkable variants live in queries_catalog.py; here are the
hash-function-specific ones (Spark xxhash64 has no DuckDB twin) verified by
unit tests with planted duplicates instead (tests/test_textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_PERMS = 16
MINHASH_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 32


def word_shingles(col, k: int = 3):
    """k-word shingles of a text column, as distinct joined strings."""
    ws = F.split(col, " ")
    n = F.greatest(F.size(ws) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
        )
    )


def minhash_signature(shingles_col, n_perms: int = MINHASH_PERMS):
    """One min over xxhash64(shingle, seed_i) per permutation i."""
    return [
        F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh{i}")
        for i in range(n_perms)
    ]


def minhash_candidates(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs with exact-Jaccard
    verification: shingle → minhash → band → bucket self-join → verify.

    Scale plan: band buckets bound the join fan-out; the verify step touches
    candidate pairs only (not the n² cross product)."""
    base = documents.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col)).alias("sh"),
    )
    sigs = base.select("id", "sh", *minhash_signature(F.col("sh")))
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    banded = sigs.select(
        "id", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
                        ).alias("bkey"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bkey")
    a = banded.alias("a")
    b = banded.select(
        F.col("id").alias("b_id"), F.col("sh").alias("b_sh"), "band", "bkey"
    )
    jac = F.size(F.array_intersect("sh", "b_sh")) / F.size(F.array_union("sh", "b_sh"))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.id") < F.col("b_id"))
        .select("a.id", "b_id", "sh", "b_sh")
        .distinct()
        .select(
            F.col("id").alias("doc_a"),
            F.col("b_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def simhash_docs(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """SimHash fingerprint per document: sign-sum of per-token hash bits.

    bit_j(doc) = 1 iff Σ_tokens sign(bit_j(xxhash64(token))) > 0; near-dups
    share buckets on the fingerprint (or low Hamming distance)."""
    toks = F.split(F.col(text_col), " ")
    bit_sums = [
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for j in range(SIMHASH_BITS)
    ]
    fp = None
    for j, bs in enumerate(bit_sums):
        bit = F.when(bs > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long")
        fp = bit if fp is None else (fp + bit)
    return documents.select(
        F.col(id_col).alias("doc_id"), fp.alias("simhash"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def simhash_neardup(documents: DataFrame) -> DataFrame:
    """Exact-bucket SimHash dedup: identical fingerprints are near-dup sets."""
    fps = simhash_docs(documents)
    return (
        fps.groupBy("simhash")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep_id"),
             F.collect_list("doc_id").alias("members"))
        .filter(F.col("n") > 1)
    )


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs via coarse LSH bucketing: random-ish
    hyperplane signs from deterministic per-dimension weights bucket vectors;
    exact cosine verifies within buckets."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    dim_w = lambda seed: F.transform(
        F.sequence(F.lit(0), F.size("v") - 1),
        lambda i: (F.pmod(F.xxhash64(i.cast("string"), F.lit(seed)), F.lit(1000)) / 500.0) - 1.0,
    )
    base = embeddings.select(F.col("vec_id").alias("id"), v.alias("v"))
    sign = lambda seed: (
        F.aggregate(
            F.zip_with("v", dim_w(seed), lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x,
        ) > 0
    ).cast("int")
    bucketed = base.select(
        "id", "v",
        F.concat_ws("", *[sign(s).cast("string") for s in range(8)]).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.select(
        F.col("id").alias("b_id"), F.col("v").alias("b_v"), "bucket"
    )
    dot = F.aggregate(F.zip_with("v", "b_v", lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("b_v", lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b_id"))
        .select(
            F.col("a.id").alias("vec_a"), F.col("b_id").alias("vec_b"),
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

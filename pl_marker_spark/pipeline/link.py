"""Stage 6 — entity linking: blocking + minhash-LSH candidate generation +
similarity scoring.

Not present in the reference (its pipeline stops at per-document triples);
mandated by the north rule. Design (SURVEY.md §2.6 "extensions"):

1. distinct (surface, type) strings from refined mentions
2. exact block: normalized surface equality (free edges)
3. minhash-LSH block: character 3-gram shingles → per-permutation min of
   ``xxhash64(shingle, seed)`` → band keys → self-join within bands —
   all built-in JVM expressions (no Python in the hot path)
4. verify candidates with exact shingle-set Jaccard (array_intersect /
   array_union) and keep pairs ≥ threshold

Scales: the band self-join is the only quadratic risk and it is bounded per
band bucket; same-type blocking keeps buckets small; AQE skew-join handles
hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
N_BANDS = 4  # 3 rows per band
JACCARD_THRESHOLD = 0.6


def normalize_surface(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"[^a-z0-9 ]", "")


def mention_surfaces(mentions_refined: DataFrame, turns_tok: DataFrame) -> DataFrame:
    """mentions + their surfaces, via a grouped join against per-conv word
    offsets (expression-level; the heavy lifting is one shuffle by conv)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = turns_tok.select(
        "conv_id", "turn_idx", "words",
        (F.sum(F.size("words")).over(w) - F.size("words")).alias("word_off"),
    )
    m = mentions_refined.alias("m").join(
        turns.alias("t"),
        (F.col("m.conv_id") == F.col("t.conv_id"))
        & (F.col("m.turn_idx") == F.col("t.turn_idx")),
    )
    return m.select(
        "m.conv_id", "m.turn_idx", "m.start", "m.end", "m.label", "m.score",
        F.array_join(
            F.slice(
                F.col("t.words"),
                F.col("m.start") - F.col("t.word_off") + 1,
                F.col("m.end") - F.col("m.start") + 1,
            ),
            " ",
        ).alias("surface"),
    )


def _shingles(col, k: int = 3):
    """Character k-gram shingle set, pure expressions."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    n = F.greatest(F.length(padded) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(k)))
    )


def build_vocab(surfaces: DataFrame) -> DataFrame:
    """Distinct (surface, type) vocabulary with stable ids + shingle sets."""
    return (
        surfaces.groupBy("label", "surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("norm", normalize_surface("surface"))
        .withColumn("sid", F.xxhash64("label", "surface"))
        .withColumn("shingles", _shingles(F.col("norm")))
    )


def link_entities(vocab: DataFrame) -> DataFrame:
    """entity vocab -> similarity edges (src, dst, sim).

    MinHash signature and band keys are built as one nested array expression
    (sequence → transform → array_min) instead of N unrolled columns — same
    algebra, a fraction of the codegen, and the per-band fan-out is a single
    explode rather than an N_BANDS-way union."""
    rows_per_band = N_HASHES // N_BANDS
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.array_min(F.transform("shingles", lambda s: F.xxhash64(s, i))),
    )
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ":",
                    F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda h: h.cast("string"),
                    ),
                )
            ).alias("bkey"),
        ),
    )
    banded = (
        vocab.withColumn("sig", sig)
        .select("sid", "label", "norm", "shingles",
                F.explode(band_structs).alias("bb"))
        .select("sid", "label", "norm", "shingles", "bb.band", "bb.bkey")
    )

    a = banded.alias("a")
    b = banded.select(
        F.col("sid").alias("b_sid"), F.col("label").alias("b_label"),
        F.col("norm").alias("b_norm"), F.col("shingles").alias("b_shingles"),
        "band", "bkey",
    ).alias("b")
    cand = (
        a.join(b, ["band", "bkey"], "inner")
        .filter(F.col("a.sid") < F.col("b_sid"))
        .filter(F.col("a.label") == F.col("b_label"))  # same-type blocking
        .select("a.sid", "b_sid", "a.shingles", "b_shingles", "a.norm", "b_norm")
        .distinct()
    )
    jac = (
        F.size(F.array_intersect("shingles", "b_shingles"))
        / F.size(F.array_union("shingles", "b_shingles"))
    )
    return (
        cand.withColumn("sim", F.round(jac, 9))
        .filter((F.col("sim") >= JACCARD_THRESHOLD) | (F.col("norm") == F.col("b_norm")))
        .select(F.col("sid").alias("src"), F.col("b_sid").alias("dst"), "sim")
    )

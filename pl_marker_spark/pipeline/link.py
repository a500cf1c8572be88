"""Stage 6 — entity linking: blocking + minhash-LSH candidate generation +
similarity scoring.

Not present in the reference (its pipeline stops at per-document triples);
mandated by the north rule. Design (SURVEY.md §2.6 "extensions"):

1. distinct (surface, type) strings from refined mentions
2. exact block: normalized surface equality (free edges)
3. minhash-LSH block: character 3-gram shingles → one portable hash per
   shingle + affine permutation minima → band keys → skew-salted self-join
   within (label, band, bucket) — all built-in JVM expressions (no Python
   in the hot path)
4. verify candidates with exact shingle-set Jaccard (array_intersect /
   array_union) and keep pairs ≥ threshold

Scales: the band self-join is the only quadratic risk and it is bounded per
(label, band, bucket) — explicitly salted above ``skew.salted_pair_join``'s
task bound (round-1 VERDICT item #7: AQE alone can miss extreme buckets).

Hashing is the portable md5 family (phash.py) so the single-process graph
oracle (oracle_graph.py) reproduces vocab ids, buckets and edges bit-for-bit
— this is what lets kg_graph_nodes/edges pass the driver's DuckDB gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..phash import phash64, phash64_py
from ..skew import salted_pair_join

N_HASHES = 12
N_BANDS = 4  # 3 rows per band
JACCARD_THRESHOLD = 0.6
LINK_P = 2_147_483_647
LINK_A = [phash64_py(f"a{i}", "lk") % (LINK_P - 1) + 1 for i in range(N_HASHES)]
LINK_B = [phash64_py(f"b{i}", "lk") % LINK_P for i in range(N_HASHES)]


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
        .withColumn(
            "sid",
            phash64(F.concat_ws("\x1f", F.col("label"), F.col("surface")), "sid"),
        )
        .withColumn("shingles", _shingles(F.col("norm")))
    )


def link_entities(vocab: DataFrame) -> DataFrame:
    """entity vocab -> similarity edges (src, dst, sim).

    MinHash signature and band keys are built as one nested array expression
    (one portable hash per shingle + affine permutation minima) instead of
    N unrolled hash calls — same algebra, one md5 per shingle.

    Same-type blocking is part of the join key (label ∈ key), and the
    within-bucket self-join is explicitly salted (task output bounded even
    for a mega-surface bucket)."""
    rows_per_band = N_HASHES // N_BANDS
    hs = F.transform("shingles", lambda s: phash64(s, "sh", chars=8))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.array_min(
            F.transform(
                "hs",
                lambda h: (F.element_at(F.lit(LINK_A), i + 1) * h
                           + F.element_at(F.lit(LINK_B), i + 1)) % F.lit(LINK_P),
            )
        ),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                phash64(
                    F.concat_ws(
                        ":",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda h: h.cast("string"),
                        ),
                    ),
                    f"band{b}",
                ).alias("bkey"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = (
        vocab.withColumn("hs", hs)
        .withColumn("sig", sig)
        .select("sid", "label", F.explode(band_structs).alias("bb"))
        .select("sid", "label", "bb.band", "bb.bkey")
    )

    # band shuffle carries ids only — the wide shingle arrays must not ride
    # the band explosion (×N_BANDS) nor the salt replication of a hot
    # bucket; the payload re-joins once per *deduped* pair (the discipline
    # textops.py's minhash/embedding paths already follow). Identical
    # output: (norm, shingles) are functions of sid.
    cand = (
        salted_pair_join(banded, ["label", "band", "bkey"], "sid")
        .select("sid", "b_sid")
        .distinct()
    )
    payload = vocab.select("sid", "norm", "shingles")
    payload_b = vocab.select(
        F.col("sid").alias("b_sid"), F.col("norm").alias("b_norm"),
        F.col("shingles").alias("b_shingles"),
    )
    cand = cand.join(payload, "sid").join(payload_b, "b_sid")
    jac = (
        F.size(F.array_intersect("shingles", "b_shingles"))
        / F.size(F.array_union("shingles", "b_shingles"))
    )
    return (
        cand.withColumn("sim", F.round(jac, 9))
        .filter((F.col("sim") >= JACCARD_THRESHOLD) | (F.col("norm") == F.col("b_norm")))
        .select(F.col("sid").alias("src"), F.col("b_sid").alias("dst"), "sim")
    )

"""S1 — reference-format JSONL document source.

The reference consumes jsonline docs shaped
``{"doc_key": str, "sentences": [[token, ...], ...],
   "ner": [[[s, e, label], ...] per sentence],
   "relations": [[[s1, e1, s2, e2, label], ...] per sentence]}``
(SciERC/ACE prep; read loop run_acener.py:171-199, run_re.py:210-260).
This module maps that shape straight into the engine's transcript table —
a user of the reference can point ``run_pipeline.py --input x.jsonl`` at
their existing eval files.

Fidelity notes:
- Tokens are joined with single spaces; the engine's word split recovers
  them exactly, and P1 PTB unescape then applies per word — the same
  unescape the reference applies per token at read time
  (``get_original_token``, run_acener.py:181-183), in the same order.
- The reference's ``ner``/``relations`` spans are DOCUMENT-level token
  indices; the engine's mention/triple coordinates are conversation-level
  word indices over the concatenated turns — the identical coordinate
  system, so gold converts by locating the sentence (turn) via cumulative
  sentence lengths and keeping the indices unchanged.
- Everything below is JVM-side (``spark.read.json`` + explode/array
  expressions); no Python touches row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Mixed-type JSON cells (ints + strings in one array) are read as strings
# and cast back — Spark's JSON reader coerces scalars to the declared type.
_REF_DOC_SCHEMA = (
    "doc_key string, sentences array<array<string>>, "
    "ner array<array<array<string>>>, "
    "relations array<array<array<string>>>"
)

_EPOCH = "2020-01-01 00:00:00"


def read_reference_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """jsonline docs -> transcript table (conv_id, turn_idx, role, text,
    tool, ts). One row per sentence; ``ts`` is a deterministic synthetic
    clock (turn_idx minutes past a fixed epoch) — the reference format
    carries no timestamps and no engine operator derives semantics from
    transcript ``ts``."""
    raw = spark.read.schema(_REF_DOC_SCHEMA).json(path)
    return (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("sentences").alias("turn_idx", "tokens"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.lit("doc").alias("role"),
            F.array_join("tokens", " ").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.to_timestamp(F.lit(_EPOCH))
             + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
        )
    )


def read_reference_jsonl_gold(spark: SparkSession, path: str):
    """jsonline docs -> (gold_mentions, gold_relations) tables in the
    engine's gold schemas. Spans stay in document-level token coordinates
    (== conversation-level word coordinates here); the owning sentence is
    recovered positionally — ``ner[i]`` / ``relations[i]`` belong to
    sentence i (run_acener.py:196-199)."""
    raw = spark.read.schema(_REF_DOC_SCHEMA).json(path)
    mentions = (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("ner").alias("turn_idx", "spans"),
        )
        .select(
            "conv_id", F.col("turn_idx").cast("int"),
            F.explode("spans").alias("sp"),
        )
        .select(
            "conv_id", "turn_idx",
            F.element_at("sp", 1).cast("int").alias("start"),
            F.element_at("sp", 2).cast("int").alias("end"),
            F.element_at("sp", 3).alias("label"),
        )
    )
    relations = (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("relations").alias("turn_idx", "rels"),
        )
        .select(
            "conv_id", F.col("turn_idx").cast("int"),
            F.explode("rels").alias("r"),
        )
        .select(
            "conv_id", "turn_idx",
            F.element_at("r", 1).cast("int").alias("s1"),
            F.element_at("r", 2).cast("int").alias("e1"),
            F.element_at("r", 3).cast("int").alias("s2"),
            F.element_at("r", 4).cast("int").alias("e2"),
            F.element_at("r", 5).alias("label"),
        )
    )
    return mentions, relations

"""Skew-bounded within-bucket pair generation for LSH self-joins.

An LSH band bucket with S members produces S² candidate pairs in one shuffle
task; a single hot bucket (all-identical boilerplate documents, a giant
entity surface) therefore creates one straggler task that AQE's skew-join
split cannot always break up (it splits *join* partitions, not the grouped
fan-out inside one key). ``salted_pair_join`` makes the task bound explicit
(north rule: "large-component skew salting"):

- buckets with ≤ ``max_bucket`` members join as one task (k = 1, zero cost);
- a bucket with S > ``max_bucket`` members is split into k = ⌈S/max_bucket⌉
  chunks by ``pmod(id, k)``; the left side keeps its chunk, the right side
  replicates each row to every chunk, and the join key becomes
  (bucket, chunk) — so every task pairs ≤ max_bucket left rows against the
  bucket's members, i.e. task output ≤ max_bucket·S instead of S².

Every unordered pair (x, y), x.id < y.id, appears exactly once: it matches
only in the task keyed by (bucket, chunk(x)) with x on the left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_pair_join(
    banded: DataFrame,
    keys: list[str],
    id_col: str,
    carry: list[str] | None = None,
    max_bucket: int = 4096,
) -> DataFrame:
    """``banded`` (one row per (member, bucket)) -> candidate pairs
    ``(id_col, b_<id_col>, *carry, *b_<carry>)`` with ``id < b_id``, one row
    per (pair, bucket) — callers dedupe across buckets themselves.

    ``carry`` columns ride along from both sides (prefixed ``b_`` on the
    right). Join tasks are bounded as described in the module docstring.
    """
    from pyspark.sql import Window

    carry = carry or []
    # bucket size via a window (one shuffle by bucket key, no side table —
    # a counts join would need a broadcast that grows with bucket count)
    w = Window.partitionBy(*keys)
    k = F.greatest(
        F.lit(1), F.ceil(F.count("*").over(w) / F.lit(max_bucket))
    ).cast("int")
    base = banded.withColumn("_k", k)
    left = base.withColumn(
        "_chunk", F.pmod(F.col(id_col), F.col("_k")).cast("int")
    ).select(*keys, "_chunk", id_col, *carry)
    right = base.withColumn(
        "_chunk", F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
    ).withColumn("_chunk", F.col("_chunk").cast("int")).select(
        *keys,
        "_chunk",
        F.col(id_col).alias(f"b_{id_col}"),
        *[F.col(c).alias(f"b_{c}") for c in carry],
    )
    return left.join(right, [*keys, "_chunk"]).filter(
        F.col(id_col) < F.col(f"b_{id_col}")
    ).drop("_chunk")

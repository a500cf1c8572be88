"""Unit tests for the round-4 training-data operators that the driver gate
can't fully exercise: the O8 guard/label branches on crafted gold (the
synthetic corpus never collides a reversed pair with a forward gold pair),
plus spot-invariants of the samplers and filters. The DuckDB twin equality
for all of these lives in test_queries_oracle.py."""

from pyspark.sql import functions as F

from pl_marker_spark.queries_catalog import inverse_gold_augment
from pl_marker_spark.synth import GOLD_RELATION_SCHEMA
from pl_marker_spark.world import NUM_REL, NUM_SYM, REL_LABELS


def test_o8_guard_and_label_branches(spark):
    """run_re.py:265-281 on crafted gold: an asymmetric pair whose reverse
    IS gold (guard drops both inverses), and a symmetric pair (inverse
    keeps the same id — the reference's `# bug` branch)."""
    art, phys = REL_LABELS.index("ART"), REL_LABELS.index("PHYS")
    soc = REL_LABELS.index("PER-SOC")
    g = spark.createDataFrame(
        [
            ("c0", 0, 1, 2, 3, 4, "ART"),
            ("c0", 0, 3, 4, 1, 2, "PHYS"),   # reverse of row 1 is gold
            ("c0", 1, 5, 6, 7, 8, "PER-SOC"),
        ],
        schema=GOLD_RELATION_SCHEMA,
    )
    rows = {
        (r.conv_id, r.turn_idx, r.s1, r.e1, r.s2, r.e2, r.lab_id, r.src)
        for r in inverse_gold_augment(g).collect()
    }
    assert rows == {
        ("c0", 0, 1, 2, 3, 4, art, "fwd"),
        ("c0", 0, 3, 4, 1, 2, phys, "fwd"),
        ("c0", 1, 5, 6, 7, 8, soc, "fwd"),
        # symmetric inverse keeps the same label id; the two asymmetric
        # inverses are suppressed by the pos2label guard
        ("c0", 1, 7, 8, 5, 6, soc, "inv"),
    }


def test_o8_asymmetric_inverse_offset(spark):
    """An asymmetric inverse with no forward collision gets
    lab_id + NUM_REL - NUM_SYM (run_re.py:281)."""
    org = REL_LABELS.index("ORG-AFF")
    g = spark.createDataFrame(
        [("c1", 2, 10, 11, 20, 21, "ORG-AFF")], schema=GOLD_RELATION_SCHEMA
    )
    out = {(r.s1, r.s2, r.lab_id, r.src)
           for r in inverse_gold_augment(g).collect()}
    assert out == {
        (10, 20, org, "fwd"),
        (20, 10, org + NUM_REL - NUM_SYM, "inv"),
    }


def test_stratified_sample_rates(spark):
    """The md5-threshold sampler hits its per-stratum target rates within
    binomial noise and is reproducible (no RNG state)."""
    from pl_marker_spark.queries_dataops import q_stratified_sample

    sf = "/root/testdata/sf0.001"
    out = q_stratified_sample(spark, sf)
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in q_stratified_sample(spark, sf).collect()}
    assert a == b and len(a) > 0
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    n_other = docs.count() - n_en
    k_en = sum(1 for r in a if r[1] == "en")
    k_other = len(a) - k_en
    # 3-sigma binomial bounds around 1/16 (en) and 1/4 (other)
    for k, n, p in ((k_en, n_en, 1 / 16), (k_other, n_other, 1 / 4)):
        sd = (n * p * (1 - p)) ** 0.5
        assert abs(k - n * p) <= 3 * sd + 1, (k, n, p)


def test_c4_line_dedup_first_occurrence_survives(spark):
    """Global counts: every duplicated line is removed everywhere except
    its (doc_id, line_idx)-first occurrence, so total removals equal
    total lines minus distinct lines."""
    from pl_marker_spark.queries_dataops import (
        _DEDUP_LINE_WORDS,
        q_c4_line_dedup,
    )

    sf = "/root/testdata/sf0.001"
    out = q_c4_line_dedup(spark, sf)
    tot = out.agg(F.sum("n_lines"), F.sum("n_removed")).collect()[0]
    lw = _DEDUP_LINE_WORDS
    lines = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.expr(
            f"transform(sequence(0, cast(ceil(size(split(text,' '))/{lw}.0) as int)-1),"
            f" i -> array_join(slice(split(text,' '), i*{lw}+1, {lw}), ' '))"
        )).alias("line"))
    )
    n_all, n_distinct = lines.count(), lines.distinct().count()
    assert tot[0] == n_all and tot[1] == n_all - n_distinct and tot[1] > 0

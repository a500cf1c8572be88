"""Spark relational scoring must equal the oracle's counter loops; the graph
stages must canonicalize deterministically."""

import pytest
from pyspark.sql import functions as F

from pl_marker_spark import synth
from pl_marker_spark.config import DEFAULT_CONFIG
from pl_marker_spark.oracle_ref import oracle_metrics, run_oracle
from pl_marker_spark.pipeline.graph import build_graph
from pl_marker_spark.pipeline.cc import connected_components
from pl_marker_spark.pipeline.runner import run_extraction
from pl_marker_spark.pipeline.scoring import ner_metrics, re_metrics

N_CONVS = 20


@pytest.fixture(scope="module")
def everything(spark):
    corpus = synth.local_corpus(N_CONVS)
    oracle = run_oracle(corpus[0], DEFAULT_CONFIG)
    transcripts = synth.transcripts_df(spark, N_CONVS)
    out = run_extraction(spark, transcripts, DEFAULT_CONFIG)
    return corpus, oracle, out


def test_metrics_match_oracle(spark, everything):
    corpus, oracle, out = everything
    _, gms, grs = corpus
    gold_m = spark.createDataFrame(
        gms, schema="conv_id string, turn_idx int, start int, end int, label string"
    )
    gold_r = spark.createDataFrame(
        grs,
        schema="conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, label string",
    )
    gold_types = {(c, t, s, e): l for c, t, s, e, l in gms}
    want = oracle_metrics(
        oracle["mentions"], oracle["raw"], oracle["triples"], gms, grs, gold_types
    )
    got = ner_metrics(out["mentions"], out["span_scores"], gold_m)
    got.update(re_metrics(out["triples"], gold_r, gold_m))
    for k in ("ner_precision", "ner_recall", "ner_f1", "ner_f1_overlap",
              "re_precision", "re_recall", "re_f1", "re_f1_with_ner",
              "ner_tot_recall", "re_tot_recall", "re_tot_pred", "re_cor"):
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # recall-set consistency assertion (run_re.py:1005)
    assert got["golden_size"] == want["re_tot_recall"]


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9), (7, 3)], "src long, dst long"
    )
    assign = {r.sid: r.component for r in connected_components(edges).collect()}
    assert assign[1] == assign[2] == assign[3] == assign[7] == 1
    assert assign[5] == assign[6] == 5


def test_cc_local_matches_distributed(spark):
    """The size-gated driver union-find and the alternating-star path label
    identically (min node id per component) — on longs and on strings
    (entity keys), chains + cliques + singles-by-edge."""
    cases = [
        ([(1, 2), (2, 3), (5, 6), (9, 9), (7, 3)], "src long, dst long"),
        ([(i, i + 1) for i in range(50)]
         + [(100 + i, 100 + (i + 1) % 5) for i in range(5)],
         "src long, dst long"),
        ([("b", "a"), ("c", "b"), ("x", "x"), ("m", "z")],
         "src string, dst string"),
    ]
    for rows, schema in cases:
        edges = spark.createDataFrame(rows, schema)
        local = {(r.sid, r.component)
                 for r in connected_components(edges).collect()}
        dist = {(r.sid, r.component)
                for r in connected_components(
                    edges, local_threshold=0).collect()}
        assert local == dist and local


def test_graph_build(spark, everything):
    _, _, out = everything
    g = build_graph(out["mentions_refined"], out["triples"], out["turns_tok"])
    nodes = g["nodes"]
    edges = g["edges"]
    assert nodes.count() > 10
    assert edges.count() > 5
    # every edge endpoint is a node
    ids = {r.entity_id for r in nodes.collect()}
    for r in edges.collect():
        assert r.src_id in ids and r.dst_id in ids
    # surfaces reconstructed correctly: every surface is in the gazetteer
    from pl_marker_spark.world import GAZETTEER
    for r in g["surfaces"].select("surface", "label").distinct().collect():
        assert GAZETTEER.get(r.surface) is not None
    # exact-duplicate surfaces collapse to one entity
    dup = (
        g["entity_vocab"].groupBy("label", "norm")
        .agg(F.countDistinct("entity_id").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert dup.count() == 0

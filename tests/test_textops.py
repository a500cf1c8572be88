"""Dedup / similarity operators with planted duplicates, plus multimodal
plumbing."""

import pytest
from pyspark.sql import functions as F

from pl_marker_spark import multimodal, textops


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog near the river edge"),  # near dup
        (4, "completely different content about spark shuffles and joins here"),
        (5, "another unrelated document mentioning catalyst and tungsten engines"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_minhash_finds_planted_dups(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in textops.minhash_candidates(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (4, 5) not in pairs


def test_simhash_buckets_exact_dups(docs):
    fps = {r.doc_id: r.simhash for r in textops.simhash_docs(docs).collect()}
    assert fps[1] == fps[2]
    nd = textops.simhash_neardup(docs).collect()
    groups = [set(r.members) for r in nd]
    assert any({1, 2} <= g for g in groups)


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in textops.embedding_neardup(emb).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synthetic_media(spark, 30)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5
        assert r.n_bytes > 0
    # determinism across runs
    again = {r.media_id: tuple(r.feature) for r in multimodal.extract_features(media).collect()}
    assert {r.media_id: tuple(r.feature) for r in rows} == again


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, 30)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    vids = media.filter(F.col("kind") == "video").collect()
    got = plan.groupBy("media_id").count().collect()
    want = {v.media_id: v.duration_ms // 500 + 1 for v in vids}
    assert {r.media_id: r["count"] for r in got} == want


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(b"xx")

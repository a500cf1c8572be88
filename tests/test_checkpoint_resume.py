"""Resume test (SURVEY.md §5): kill after stage k, rerun, byte-identical
final tables; plus manifest/lineage records."""

import json
import shutil

from pl_marker_spark import synth
from pl_marker_spark.checkpoint import CheckpointStore
from pl_marker_spark.config import DEFAULT_CONFIG
from pl_marker_spark.pipeline.runner import run_extraction


def _triples_set(df):
    return {
        (r.conv_id, r.turn_idx, r.s1, r.e1, r.s2, r.e2, r.pred, round(r.score, 9))
        for r in df.collect()
    }


def test_resume_idempotent(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt"))
    transcripts = synth.transcripts_df(spark, 6)

    store = CheckpointStore(spark, base, run_id="r1")
    out1 = run_extraction(spark, transcripts, DEFAULT_CONFIG, store)
    t1 = _triples_set(out1["triples"])

    # simulate failure after the NER stage: wipe everything downstream
    for stage in ("packed_re", "pair_scores", "triples_raw", "triples",
                  "mentions_refined"):
        shutil.rmtree(f"{base}/{stage}", ignore_errors=True)

    store2 = CheckpointStore(spark, base, run_id="r2")
    out2 = run_extraction(spark, transcripts, DEFAULT_CONFIG, store2)
    t2 = _triples_set(out2["triples"])
    assert t1 == t2

    # upstream stages were resumed, not recomputed
    resumed = {e["stage"] for e in store2.events if e["resumed"]}
    assert {"turns_tok", "packed_ner", "span_scores", "mentions"} <= resumed
    recomputed = {e["stage"] for e in store2.events if not e["resumed"]}
    assert "triples" in recomputed and "packed_re" in recomputed

    # manifest + lineage exist
    with open(f"{base}/_manifest.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert any(l["stage"] == "triples" and l["rows"] is not None for l in lines)
    with open(f"{base}/_lineage/triples.json") as f:
        lineage = json.load(f)
    assert len(lineage["partitions"]) >= 1
    assert lineage["rows"] == len(t1)


def test_fingerprint_gates_resume(spark, tmp_path):
    """A checkpoint written under one (config, input) fingerprint must NOT be
    resumed under another — changed config recomputes instead of silently
    reusing stale outputs (round-1 ADVICE, medium)."""
    from dataclasses import replace as _replace

    from pl_marker_spark.checkpoint import run_fingerprint

    base = str(tmp_path / "ck_fp")
    transcripts = synth.transcripts_df(spark, 4)

    fp1 = run_fingerprint(DEFAULT_CONFIG, "synthetic:4")
    store1 = CheckpointStore(spark, base, run_id="a", fingerprint=fp1)
    run_extraction(spark, transcripts, DEFAULT_CONFIG, store1)

    # same config + input -> full resume
    store2 = CheckpointStore(spark, base, run_id="b", fingerprint=fp1)
    run_extraction(spark, transcripts, DEFAULT_CONFIG, store2)
    assert all(e["resumed"] for e in store2.events)

    # changed config -> different fingerprint -> nothing resumed
    cfg3 = _replace(DEFAULT_CONFIG, max_seq_length_re=128)
    fp3 = run_fingerprint(cfg3, "synthetic:4")
    assert fp3 != fp1
    store3 = CheckpointStore(spark, base, run_id="c", fingerprint=fp3)
    run_extraction(spark, transcripts, cfg3, store3)
    assert not any(e["resumed"] for e in store3.events)

"""Two-stage BIO path: unit tests for P8/P9/P10 conversions and equivalence
of candidate-restricted scoring with the exhaustive path on gazetteer data."""

import pytest

from pl_marker_spark import synth
from pl_marker_spark.config import DEFAULT_CONFIG
from pl_marker_spark.pipeline.assemble import assemble
from pl_marker_spark.pipeline.bio import (
    bio_to_spans,
    candidates_from_bio,
    iob2_to_iob1,
    spans_to_bio,
    tag_words_bio,
    two_stage_mentions,
)
from pl_marker_spark.pipeline.ner import infer_ner, suppress_mentions
from pl_marker_spark.pipeline.spanpack import spanpack_ner
from pl_marker_spark.world import GAZ_BY_LABEL


def test_bio_roundtrip():
    tags = ["O", "B-PER", "I-PER", "O", "B-ORG", "B-ORG", "I-LOC", "O"]
    spans = bio_to_spans(tags)
    # I-LOC after B-ORG starts a new span (type change closes the run)
    assert spans == [(1, 2, "PER"), (4, 4, "ORG"), (5, 5, "ORG"), (6, 6, "LOC")]
    # P9: reconstruct from scored spans; overlap loses to higher score
    rec = spans_to_bio(8, [(1, 2, "PER", 0.9), (4, 5, "ORG", 0.8), (5, 6, "LOC", 0.7)])
    assert rec == ["O", "B-PER", "I-PER", "O", "B-ORG", "I-ORG", "O", "O"]
    # P10: IOB2 -> IOB1
    assert iob2_to_iob1(["B-PER", "I-PER", "B-PER", "O", "B-ORG"]) == [
        "I-PER", "I-PER", "B-PER", "O", "I-ORG"]


def test_tagger_finds_planted_phrases():
    surf = GAZ_BY_LABEL["ORG"][0]
    words = ["hello", *surf.split(), "world"]
    tags = tag_words_bio(words)
    assert tags[0] == "O" and tags[-1] == "O"
    assert tags[1] == "B-ORG"
    assert all(t == "I-ORG" for t in tags[2 : 1 + len(surf.split())])
    assert bio_to_spans(tags) == [(1, len(surf.split()), "ORG")]


@pytest.fixture(scope="module")
def turns_tok(spark):
    return assemble(synth.transcripts_df(spark, 12)).localCheckpoint()


def test_candidates_cover_mentions(spark, turns_tok):
    cfg = DEFAULT_CONFIG
    cands = {
        (r.conv_id, r.turn_idx, r.start, r.end)
        for r in candidates_from_bio(turns_tok).collect()
    }
    exhaustive = suppress_mentions(
        infer_ner(spanpack_ner(turns_tok, cfg), cfg), cfg
    )
    ment = [(r.conv_id, r.turn_idx, r.start, r.end) for r in exhaustive.collect()]
    covered = sum(1 for m in ment if m in cands)
    # greedy longest-match tagging misses nested/overlapping variants by
    # design; everything else must be covered
    assert covered / len(ment) > 0.9


def test_two_stage_matches_exhaustive_on_candidates(spark, turns_tok):
    cfg = DEFAULT_CONFIG
    two = {
        (r.conv_id, r.turn_idx, r.start, r.end, r.label, round(r.score, 9))
        for r in two_stage_mentions(turns_tok, cfg).collect()
    }
    exhaustive = {
        (r.conv_id, r.turn_idx, r.start, r.end, r.label, round(r.score, 9))
        for r in suppress_mentions(
            infer_ner(spanpack_ner(turns_tok, cfg), cfg), cfg
        ).collect()
    }
    # spans present in both paths agree bit-for-bit on (label, score);
    # the symmetric difference is only the nested-surface cases where the
    # greedy longest-match tagger proposes a different overlap set than
    # exhaustive enumeration (so the suppression contest differs)
    two_by_span = {t[:4]: t[4:] for t in two}
    ex_by_span = {t[:4]: t[4:] for t in exhaustive}
    common = set(two_by_span) & set(ex_by_span)
    assert all(two_by_span[k] == ex_by_span[k] for k in common)
    assert len(common) / len(ex_by_span) > 0.9
    assert len(two ^ exhaustive) / len(exhaustive) < 0.15

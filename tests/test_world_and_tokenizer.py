"""World / tokenizer / synth determinism and invariants."""

from pl_marker_spark import synth, world
from pl_marker_spark.tokenizer import (
    detokenize,
    split_words,
    surface_of_span,
    tokenize_words,
)


def test_world_deterministic_and_injective():
    assert len(world.GAZETTEER) > 150
    # injective: one label per surface by construction
    assert len(set(world.GAZETTEER)) == len(world.GAZETTEER)
    # no (a,b) and (b,a) both present in the relation table
    for a, b in world.REL_TABLE:
        assert (b, a) not in world.REL_TABLE
    assert world.REL_LOGIT_DIM == 12


def test_tokenize_roundtrip():
    words = ["Alice", "of", "Acmecorporation", "met", "Bob", ",", "("]
    sub, counts = tokenize_words(words)
    assert sum(counts) == len(sub)
    assert detokenize(sub) == words
    # multi-subword words exist
    assert counts[2] > 1
    assert surface_of_span(sub, 0, counts[0] - 1) == "Alice"


def test_ptb_unescape():
    assert split_words("a -LRB- b -RRB- .") == ["a", "(", "b", ")", "."]


def test_gen_conv_deterministic_and_bounded():
    t1 = synth.gen_conv(3)
    t2 = synth.gen_conv(3)
    assert t1 == t2
    turns, gms, grs = t1
    assert all(len(t[3].split()) <= 60 for t in turns)
    # gold mention offsets index the turn words correctly (conversation-level)
    offs = {}
    run = 0
    for cid, tid, _r, text, _tool, _ts in turns:
        offs[tid] = run
        run += len(text.split())
    allwords = []
    for cid, tid, _r, text, _tool, _ts in turns:
        allwords.extend(split_words(text))
    for cid, tid, s, e, label in gms:
        surf = " ".join(allwords[s : e + 1])
        assert world.GAZETTEER[surf] == label
    for cid, tid, s1, e1, s2, e2, label in grs:
        a = " ".join(allwords[s1 : e1 + 1])
        b = " ".join(allwords[s2 : e2 + 1])
        assert world.REL_TABLE[(a, b)] == label


def test_heavy_tail_conv():
    turns, _, _ = synth.gen_conv(0)
    assert len(turns) == 400


def test_is_punctuation_matches_hf_rule():
    """P2 — replicated from run_acener.py:124-133 (HF _is_punctuation)."""
    import unicodedata

    from pl_marker_spark.tokenizer import is_punctuation

    for ch in "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~":
        assert is_punctuation(ch)
    for ch in "aZ09 \t":
        assert not is_punctuation(ch)
    assert is_punctuation("—")  # em dash, category Pd
    assert is_punctuation("¿")  # inverted question mark, Po
    assert not is_punctuation("é")  # é, letter


def test_roberta_family_tokenize_round_trip():
    from pl_marker_spark.tokenizer import detokenize, tokenize_word, tokenize_words

    # prefix-space rule: normal words get the Ġ head
    assert tokenize_word("Nabovu", "roberta")[0].startswith("Ġ")
    # apostrophe words and single punctuation do NOT (run_acener.py:155-162)
    assert tokenize_word("'s", "roberta") == ["'s"]
    assert tokenize_word(",", "roberta") == [","]
    # alignment genuinely differs from the bert family
    assert len(tokenize_word("word", "bert")) == 1
    assert len(tokenize_word("word", "roberta")) == 2
    # round trip
    words = ["Nabovu", "Tower", ",", "'s", "(", "filler", "."]
    subwords, counts = tokenize_words(words, "roberta")
    assert detokenize(subwords, "roberta") == words
    assert sum(counts) == len(subwords)


def test_roberta_pipeline_matches_oracle(spark):
    """Full extraction equality on the roberta tokenizer family — the
    prefix-space alignment flows through windowing, packing and marker
    arithmetic identically on both engines."""
    from dataclasses import replace as _replace

    from pl_marker_spark import synth
    from pl_marker_spark.config import DEFAULT_CONFIG
    from pl_marker_spark.oracle_ref import run_oracle
    from pl_marker_spark.pipeline.runner import run_extraction

    cfg = _replace(DEFAULT_CONFIG, tokenizer_family="roberta")
    out = run_extraction(spark, synth.transcripts_df(spark, 8), cfg)
    o = run_oracle(synth.local_corpus(8)[0], cfg)
    got = {
        (r.conv_id, r.turn_idx, r.s1, r.e1, r.s2, r.e2, r.pred,
         round(r.score, 9), r.subj_type, r.obj_type)
        for r in out["triples"].collect()
    }
    want = {
        (c, t, s1, e1, s2, e2, p, round(sc, 9), n1, n2)
        for c, t, s1, e1, s2, e2, p, sc, n1, n2 in o["triples"]
    }
    assert got == want
    assert len(got) > 5
    got_m = {(r.conv_id, r.turn_idx, r.start, r.end, r.label)
             for r in out["mentions"].collect()}
    want_m = {(c, t, s, e, l) for c, t, s, e, l, _p in o["mentions"]}
    assert got_m == want_m

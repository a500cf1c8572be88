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

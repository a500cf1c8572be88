"""Hand-computed kernel tests: alignment (P4/P5), windowing (P6/P7), span
enumeration (C1), packing (K1/K2), subject packing (C3/K3/K4), K5 tensors.

The hand-check example follows FIXTURES.md §6.
"""

import numpy as np

from pl_marker_spark.config import PipelineConfig
from pl_marker_spark.kernels import (
    assemble_ner_tensors,
    build_conv_index,
    context_window,
    enumerate_spans,
    pack_groups,
    subject_instances,
)
from pl_marker_spark.tokenizer import CLS, SEP, SUB_L, SUB_R

CFG = PipelineConfig(
    max_seq_length_ner=32, max_pair_length_ner=4, max_mention_ori_length=3,
    max_seq_length_re=32, max_pair_length_re=2, assemble_tensors=True,
)

# 2 turns: words of lengths <=4 stay single-piece, longer split every 4 chars
TURNS = [["Alice", "of", "Acme", "met", "Bob"], ["Bob", "nodded", "."]]


def test_alignment():
    idx = build_conv_index(TURNS)
    # Alice -> 2 pieces; nodded -> 2 pieces
    assert idx.subwords[:3] == ["Alic", "##e", "of"]
    assert idx.token2subword == [0, 2, 3, 4, 5, 6, 7, 9, 10]
    assert idx.subword2token == [0, 0, 1, 2, 3, 4, 5, 6, 6, 7]
    assert idx.sent_word_bounds == [0, 5, 8]
    assert idx.sent_subword_bounds == [0, 6, 10]


def test_context_window_fits_all():
    idx = build_conv_index(TURNS)
    win = context_window(idx, 0, budget=30, truncate=False)
    # whole conversation fits: right context = all 4 remaining subwords
    assert win.tokens == [CLS] + idx.subwords + [SEP]
    assert win.doc_offset == 0
    win1 = context_window(idx, 1, budget=30, truncate=False)
    assert win1.tokens == [CLS] + idx.subwords + [SEP]
    assert win1.doc_offset == 0


def test_context_window_balanced_truncation():
    idx = build_conv_index(TURNS)
    # budget 8, sentence 0 is 6 subwords -> half=(8-6)//2=1; left=0 < right=4
    # -> left_ctx=0, right_ctx=min(4, 8-0-6)=2
    win = context_window(idx, 0, budget=8, truncate=False)
    assert win.tokens == [CLS] + idx.subwords[:8] + [SEP]
    # sentence 1 (4 subwords): left=6 >= right=0 -> right_ctx=0,
    # left_ctx=min(6, 8-0-4)=4
    win1 = context_window(idx, 1, budget=8, truncate=False)
    assert win1.doc_offset == 2
    assert win1.tokens == [CLS] + idx.subwords[2:10] + [SEP]


def test_enumerate_spans():
    idx = build_conv_index(TURNS)
    win = context_window(idx, 1, budget=30, truncate=False)
    spans = enumerate_spans(idx, 1, win, max_mention_len=2)
    # sentence 1 words: Bob(5) nodded(6) .(7); max len 2
    assert [(s[2], s[3]) for s in spans] == [(5, 5), (5, 6), (6, 6), (6, 7), (7, 7)]
    # window coords: CLS-shifted inclusive; Bob at conv subword 6
    lo, hi, ws, we = spans[0]
    assert (lo, hi) == (6 - win.doc_offset + 1, 7 - win.doc_offset)
    # nodded spans two subwords
    lo2, hi2, _, _ = spans[2]
    assert hi2 - lo2 == 1


def test_pack_groups_k1():
    spans = list(range(10))
    groups = pack_groups(spans, CFG)
    assert [len(g) for g in groups] == [4, 4, 2]
    assert groups[0] == [0, 1, 2, 3]


def test_pack_groups_k2_edge():
    cfg = PipelineConfig(max_pair_length_ner=3, group_edge=True, group_axis=0)
    spans = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (2, 0)]
    groups = pack_groups(spans, cfg)
    # run of start=0 exceeds budget 3 -> hard cut; then never split runs
    assert groups[0] == [(0, 0), (0, 1), (0, 2)]
    assert groups[1] == [(0, 3), (1, 0), (2, 0)]

    spans2 = [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0)]
    groups2 = pack_groups(cfg=cfg, spans=spans2)
    # budget 3 would split the (1,*) run -> back off to boundary
    assert groups2[0] == [(0, 0), (0, 1)]
    assert groups2[1] == [(1, 0), (1, 1), (2, 0)]


def test_subject_instances_marker_math():
    idx = build_conv_index(TURNS)
    win = context_window(idx, 0, budget=28, truncate=True)
    mentions = [(0, 0, "PER"), (2, 2, "ORG"), (4, 4, "PER")]
    insts = subject_instances(idx, 0, win, mentions, CFG)
    # 3 subjects x ceil(3/2) chunks = 6 instances
    assert len(insts) == 6
    first = insts[0]
    assert first.sub_word == (0, 0)
    # subject Alice = subwords[0..1]; CLS-shifted -> sub_s=1, marker-end=+2
    assert first.sub_win == (1, 4)
    assert first.tokens[:5] == [CLS, SUB_L, "Alic", "##e", SUB_R]
    # object window coords get the +1/+2 shifts past the subject markers
    # (run_re.py:323-331): obj Acme (word 2, subword 3) start>sub -> left+2
    left, right, label, ws, we = first.objects[1]
    assert (ws, we, label) == (2, 2, "ORG")
    assert left == 3 - win.doc_offset + 1 + 2
    assert right == 4 - win.doc_offset + 2
    # subject in the middle: objects before it unshifted
    mid = [i for i in insts if i.sub_word == (2, 2)][0]
    l0, r0, _, ws0, _ = mid.objects[0]
    assert ws0 == 0 and l0 == 0 - win.doc_offset + 1 and r0 == 2 - win.doc_offset


def test_assemble_ner_tensors_shapes():
    window = [CLS, "Alic", "##e", "of", SEP]
    ids, pos, att = assemble_ner_tensors(window, [(1, 2), (3, 3)], 16, 4)
    assert ids.shape == (20,) and att.shape == (20, 20)
    assert pos[16] == 1 and pos[18] == 2  # start marker copies span start
    assert pos[17] == 3 and pos[19] == 3
    assert att[:5, :5].all()
    assert att[16, 18] == 1 and att[16, 17] == 0
    assert int(att[16, :5].sum()) == 5
    assert not att[5:16].any()


def test_enumerate_spans_np_equivalence():
    import numpy as np
    from pl_marker_spark.kernels import enumerate_spans_np

    idx = build_conv_index(TURNS)
    for n in (0, 1):
        win = context_window(idx, n, budget=30, truncate=False)
        ref = enumerate_spans(idx, n, win, max_mention_len=3)
        ws, we, s, e = enumerate_spans_np(
            np.asarray(idx.token2subword), idx.sent_word_bounds[n],
            idx.sent_word_bounds[n + 1], win.doc_offset, 3,
        )
        assert list(zip(ws.tolist(), we.tolist(), s.tolist(), e.tolist())) == ref


def test_ner_fast_scores_equivalence():
    """The fast gazetteer-scan scorer must be bit-identical to scoring every
    span surface (NIL rows excluded)."""
    import numpy as np
    from pl_marker_spark.surrogate import (
        ner_decode, ner_fast_scores, ner_logits_for_surfaces,
    )
    from pl_marker_spark.tokenizer import surface_of_span, tokenize_words
    from pl_marker_spark.world import GAZ_BY_LABEL

    words = (["start"] + GAZ_BY_LABEL["PER"][0].split() + ["of"]
             + GAZ_BY_LABEL["ORG"][-1].split() + ["met", "."]
             + GAZ_BY_LABEL["GPE"][2].split())
    sub, _ = tokenize_words(words)
    window = ["[CLS]"] + sub + ["[SEP]"]
    idx = build_conv_index([words])
    win = context_window(idx, 0, budget=200, truncate=False)
    spans = enumerate_spans(idx, 0, win, max_mention_len=8)
    los = [s[0] for s in spans]; his = [s[1] for s in spans]

    slow_surfaces = [surface_of_span(win.tokens, lo, hi) for lo, hi in zip(los, his)]
    probs, preds = ner_decode(ner_logits_for_surfaces(slow_surfaces))
    slow = {(i, int(p)): float(pr) for i, (p, pr) in enumerate(zip(preds, probs))
            if p != 0}
    kept, fprobs, fpreds = ner_fast_scores(win.tokens, los, his)
    fast = {(int(i), int(p)): float(pr)
            for i, p, pr in zip(kept, fpreds, fprobs)}
    assert fast == slow and len(fast) >= 3


def test_assemble_re_tensors_shapes():
    from pl_marker_spark.kernels import assemble_re_tensors

    tokens = [CLS, SUB_L, "Alic", "##e", SUB_R, "of", "Acme", SEP]
    ids, pos, att, subp = assemble_re_tensors(
        tokens, sub_win=(1, 4), objects=[(7 + 2, 7 + 2)], max_seq=16, max_pairs=4
    )
    assert ids.shape == (18,) and att.shape == (18, 18)
    assert (subp == [1, 4]).all()
    assert pos[16] == 9 and pos[17] == 9  # object marker pair copies its span
    assert att[16, :8].all() and att[16, 17] == 1 and not att[8:16].any()


def test_slim_reconstruction_roundtrip():
    """reconstruct_spans over the window's own word-boundary scan must
    reproduce enumerate_spans_np exactly — per group slice, both tokenizer
    families, including windows whose context truncates mid-word."""
    import numpy as np
    from pl_marker_spark import synth
    from pl_marker_spark.kernels import (
        build_conv_index, context_window, enumerate_spans_np,
        n_spans_exhaustive, reconstruct_spans,
    )
    from pl_marker_spark.surrogate import window_word_bounds
    from pl_marker_spark.tokenizer import split_words

    for family in ("bert", "roberta"):
        checked = 0
        for conv_idx in range(12):
            turn_rows, _, _ = synth.gen_conv(conv_idx)
            if conv_idx == 0:
                turn_rows = turn_rows[:40]
            turn_words = [split_words(t[3]) for t in turn_rows]
            idx = build_conv_index_family(turn_words, family)
            maxlen, budget, dL = 8, 62, 16
            for n in range(len(turn_words)):
                win = context_window(idx, n, budget, truncate=False)
                ws0, ws1 = idx.sent_word_bounds[n], idx.sent_word_bounds[n + 1]
                ref = enumerate_spans_np(
                    np.asarray(idx.token2subword), ws0, ws1, win.doc_offset,
                    maxlen)
                nw = ws1 - ws0
                total = n_spans_exhaustive(nw, maxlen)
                assert total == len(ref[0])
                if total == 0:
                    continue
                sent_off = idx.sent_subword_bounds[n] - win.doc_offset + 1
                _, fs, ls = window_word_bounds(win.tokens, family)
                got = reconstruct_spans(
                    np.asarray(fs), np.asarray(ls), sent_off, nw, ws0, maxlen)
                for a, b in zip(got, ref):
                    assert a.tolist() == b.tolist()
                checked += 1
        assert checked > 100


def build_conv_index_family(turn_words, family):
    """build_conv_index with an explicit tokenizer family (the production
    kernel binds the family via assemble; tests pass it directly)."""
    from pl_marker_spark.kernels import ConvIndex
    import itertools
    from pl_marker_spark.tokenizer import tokenize_word

    words = [w for tw in turn_words for w in tw]
    pieces = [tokenize_word(w, family) for w in words]
    subwords = [p for pl in pieces for p in pl]
    lens = [len(pl) for pl in pieces]
    token2subword = [0] + list(itertools.accumulate(lens))
    subword2token = [i for i, n in enumerate(lens) for _ in range(n)]
    swb = [0] + list(itertools.accumulate(len(tw) for tw in turn_words))
    ssb = [token2subword[b] for b in swb]
    return ConvIndex(words, subwords, token2subword, subword2token, swb, ssb)

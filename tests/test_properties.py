"""Property-based tests (hypothesis) for the pure kernels, plus the O12
seqeval-equivalence property (SURVEY.md §2.6: BIO-roundtrip chunk scoring
equals span-set scoring)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pl_marker_spark.config import PipelineConfig
from pl_marker_spark.kernels import build_conv_index, context_window, pack_groups
from pl_marker_spark.pipeline.bio import bio_to_spans, iob2_to_iob1, spans_to_bio
from pl_marker_spark.tokenizer import detokenize, tokenize_words
from pl_marker_spark.world import NER_LABELS

words_st = st.lists(
    st.text(alphabet=string.ascii_letters, min_size=1, max_size=12),
    min_size=1, max_size=30,
)
turns_st = st.lists(words_st, min_size=1, max_size=6)


@given(words_st)
def test_tokenize_roundtrip_property(words):
    sub, counts = tokenize_words(words)
    assert detokenize(sub) == words
    assert sum(counts) == len(sub) and len(counts) == len(words)


@given(turns_st, st.integers(min_value=8, max_value=64))
@settings(max_examples=60)
def test_window_budget_and_containment(turns, budget):
    idx = build_conv_index(turns)
    for n in range(len(turns)):
        s0, s1 = idx.sent_subword_bounds[n], idx.sent_subword_bounds[n + 1]
        if s1 - s0 > budget:
            continue  # NER path asserts; RE path truncates
        win = context_window(idx, n, budget, truncate=False)
        body = win.tokens[1:-1]
        # budget respected, window is a contiguous conversation slice,
        # and the center sentence is fully inside it
        assert len(body) <= budget
        assert body == idx.subwords[win.doc_offset : win.doc_offset + len(body)]
        assert win.doc_offset <= s0 and s1 <= win.doc_offset + len(body)


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), max_size=40),
       st.integers(min_value=1, max_value=7), st.booleans())
@settings(max_examples=60)
def test_pack_groups_partition_property(spans, dl, edge):
    cfg = PipelineConfig(max_pair_length_ner=dl, group_edge=edge, group_axis=0)
    groups = pack_groups(spans, cfg)
    flat = [s for g in groups for s in g]
    if edge:
        assert sorted(flat) == sorted(spans)  # K2 sorts; multiset preserved
    else:
        assert flat == spans                  # K1 preserves order
    assert all(groups) or not spans
    if not edge:
        assert all(len(g) <= dl for g in groups)
    else:
        # K2 may exceed dl only for a single run of equal group-axis values
        for g in groups:
            if len(g) > dl:
                assert len({x[0] for x in g}) == 1


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), max_size=40),
       st.integers(min_value=1, max_value=7), st.booleans(), st.booleans(),
       st.booleans(), st.integers(0, 2**31 - 1))
@settings(max_examples=60)
def test_pack_groups_randomized_knobs(spans, dl, shuf, gsort, edge, seed):
    """The seeded shuffle / group_sort / random-axis knobs
    (run_acener.py:266-315) repartition, never drop or duplicate, and are
    a pure function of the seed."""
    ax = -1 if edge else 0
    cfg = PipelineConfig(max_pair_length_ner=dl, shuffle=shuf,
                         group_sort=gsort, group_edge=edge, group_axis=ax)
    groups = pack_groups(spans, cfg, seed=seed)
    flat = [s for g in groups for s in g]
    assert sorted(flat) == sorted(spans)
    if not edge:
        assert all(len(g) <= dl for g in groups)
    assert groups == pack_groups(spans, cfg, seed=seed)  # seed-deterministic


@given(st.lists(st.sampled_from(
    ["O"] + [p + l for p in ("B-", "I-") for l in NER_LABELS[1:4]]),
    max_size=25))
@settings(max_examples=80)
def test_bio_span_roundtrip_property(tags):
    """O12 equivalence: spans from a BIO sequence, repainted as BIO and
    re-extracted, yield the same span set — so chunk-level (seqeval) scoring
    over reconstructed BIO equals span-set scoring (scores distinct)."""
    spans = bio_to_spans(tags)
    # spans are valid, non-overlapping, ordered
    for i, (s, e, lab) in enumerate(spans):
        assert 0 <= s <= e < len(tags)
        if i:
            assert spans[i - 1][1] < s
    painted = spans_to_bio(len(tags), [(s, e, l, 1.0 - 0.001 * i)
                                       for i, (s, e, l) in enumerate(spans)])
    assert bio_to_spans(painted) == spans
    # IOB1 conversion never changes chunk extents
    assert bio_to_spans(iob2_to_iob1(painted)) == spans


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 5),
                          st.sampled_from(NER_LABELS[1:]),
                          st.floats(0.1, 1.0, allow_nan=False)), max_size=20))
@settings(max_examples=60)
def test_suppression_invariants(raw):
    """O3 invariants: kept spans never same-label-overlap; every dropped
    span overlaps a kept same-label span with ≥ score."""
    import pandas as pd

    from pl_marker_spark.config import DEFAULT_CONFIG
    from pl_marker_spark.pipeline.ner import make_suppress_fn

    rows = [
        {"conv_id": "c", "turn_idx": 0, "start": s, "end": s + ln,
         "label": lab, "score": round(sc, 6)}
        for s, ln, lab, sc in raw
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "start", "end",
                                      "label", "score"])
    kept = make_suppress_fn(DEFAULT_CONFIG)(pdf)
    k = [(r.start, r.end, r.label, r.score) for r in kept.itertuples()]

    def ov(a, b):
        return a[0] <= b[1] and b[0] <= a[1]

    for i, a in enumerate(k):
        for b in k[i + 1:]:
            assert not (ov(a, b) and a[2] == b[2])
    dropped = [t for t in ((r["start"], r["end"], r["label"], r["score"])
               for r in rows) if t not in k]
    for d in dropped:
        assert any(ov(d, a) and a[2] == d[2] and a[3] >= d[3] for a in k)


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 12),
                          st.integers(0, 4),
                          st.sampled_from(NER_LABELS[1:]),
                          st.floats(0.1, 1.0, allow_nan=False)), max_size=40))
@settings(max_examples=60)
def test_suppression_batch_equals_per_group(raw):
    """The flat batch kernel (make_suppress_batch_fn) is row-identical to
    the per-group reference (make_suppress_fn) on multi-group frames —
    including groups interleaved in arrival order."""
    import pandas as pd

    from pl_marker_spark.config import DEFAULT_CONFIG
    from pl_marker_spark.pipeline.ner import (
        make_suppress_batch_fn,
        make_suppress_fn,
    )

    rows = [
        {"conv_id": f"c{g % 2}", "turn_idx": g, "start": s, "end": s + ln,
         "label": lab, "score": round(sc + 1e-4 * i, 6)}
        for i, (g, s, ln, lab, sc) in enumerate(raw)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "start", "end",
                                      "label", "score"])
    # per-group reference over key-sorted groups (the shuffle's layout)
    ordered = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    per_group = [
        make_suppress_fn(DEFAULT_CONFIG)(g)
        for _, g in ordered.groupby(["conv_id", "turn_idx"], sort=False)
    ]
    ref = (pd.concat(per_group, ignore_index=True)
           if per_group else pdf.iloc[0:0])
    got = make_suppress_batch_fn(DEFAULT_CONFIG)(pdf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.reset_index(drop=True))


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 8),
                          st.integers(0, 3), st.integers(0, 8),
                          st.integers(0, 3),
                          st.floats(0.1, 1.0, allow_nan=False)), max_size=30))
@settings(max_examples=60)
def test_re_suppression_batch_equals_per_group(raw):
    """_suppress_re_batch ≡ _suppress_re per group (O6)."""
    import pandas as pd

    from pl_marker_spark.pipeline.rel import _suppress_re, _suppress_re_batch
    from pl_marker_spark.world import REL_LABELS

    rows = [
        {"conv_id": f"c{g % 2}", "turn_idx": g,
         "s1": s1, "e1": s1 + l1, "s2": s2, "e2": s2 + l2,
         "pred": REL_LABELS[1 + (i % (len(REL_LABELS) - 1))],
         "score": round(sc + 1e-4 * i, 6),
         "m1_ner": "PER", "m2_ner": "ORG"}
        for i, (g, s1, l1, s2, l2, sc) in enumerate(raw)
    ]
    cols = ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred", "score",
            "m1_ner", "m2_ner"]
    pdf = pd.DataFrame(rows, columns=cols)
    ordered = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    per_group = [_suppress_re(g)
                 for _, g in ordered.groupby(["conv_id", "turn_idx"], sort=False)]
    ref = (pd.concat(per_group, ignore_index=True)
           if per_group else pdf.iloc[0:0])
    got = _suppress_re_batch(pdf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.reset_index(drop=True))


def test_o8_inverse_gold_ord_semantics(spark):
    """O8 with duplicate ordered pair keys + an order column reproduces
    the reference's dict-write semantics exactly (run_re.py:263-281):
    the forward loop overwrites (LAST write wins), the inverse loop
    guards with `if w not in pos2label` (FIRST write wins), and any
    forward key suppresses its inverse regardless of order. Verified by
    replaying the literal reference loop in Python."""
    from pl_marker_spark.queries_catalog import inverse_gold_augment
    from pl_marker_spark.world import NUM_REL, NUM_SYM, REL_LABELS, SYM_LABELS

    sym_lab = SYM_LABELS[1]
    nonsym = [l for l in REL_LABELS[1:] if l not in SYM_LABELS]
    # (s1, e1, s2, e2, label) in sentence_relations order:
    #  - rows 0/1 duplicate one forward key with different labels
    #    (fwd keeps row 1's label; the shared inverse keeps row 0's)
    #  - row 2 is symmetric; row 3's forward key equals row 2's inverse
    #    key, so that inverse is suppressed
    rels = [
        (1, 2, 5, 6, nonsym[0]),
        (1, 2, 5, 6, nonsym[1]),
        (7, 8, 9, 10, sym_lab),
        (9, 10, 7, 8, nonsym[2]),
    ]

    # --- literal reference replay ---------------------------------------
    label_map = {l: i for i, l in enumerate(REL_LABELS)}
    pos2label: dict[tuple, int] = {}
    for x in rels:
        pos2label[(x[0], x[1], x[2], x[3])] = label_map[x[4]]
    fwd_keys = set(pos2label)
    for x in rels:
        w = (x[2], x[3], x[0], x[1])
        if w not in pos2label:
            if x[4] in SYM_LABELS[1:]:
                pos2label[w] = label_map[x[4]]  # the reference's `# bug` branch
            else:
                pos2label[w] = label_map[x[4]] + NUM_REL - NUM_SYM
    want = {
        ("c0", 0, *k, lab, "fwd" if k in fwd_keys else "inv")
        for k, lab in pos2label.items()
    }

    df = spark.createDataFrame(
        [("c0", 0, s1, e1, s2, e2, lab, i)
         for i, (s1, e1, s2, e2, lab) in enumerate(rels)],
        "conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, "
        "label string, rel_ord int",
    )
    got = {
        (r.conv_id, r.turn_idx, r.s1, r.e1, r.s2, r.e2, r.lab_id, r.src)
        for r in inverse_gold_augment(df, ord_col="rel_ord").collect()
    }
    assert got == want

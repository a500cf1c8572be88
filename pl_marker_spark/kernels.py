"""Pure per-conversation kernels: token alignment, context windowing, span
enumeration, and packing. These run *inside* Arrow-batched grouped-map UDFs
on executors (never on the driver) and are also unit-tested against
hand-computed examples.

Semantics (with reference citations; all /root/reference):
- P4/P5 alignment prefix sums: run_acener.py:187-201
- P6/P7 balanced context window + CLS/SEP wrap: run_acener.py:212-231
  (RE variant budgets -4 and hard-truncates: run_re.py:242-262)
- C1 exhaustive span enumeration with word-alignment + length cap:
  run_acener.py:233-249
- K1 neighborhood packing / K2 edge-aware packing: run_acener.py:266-315
- C3/K3/K4 subject-oriented packing with solid markers and the +1/+2
  levitated-offset arithmetic: run_re.py:286-355
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np

from .config import PipelineConfig
from .tokenizer import CLS, SEP, SUB_L, SUB_R, tokenize_word
from .world import stable_hash


@dataclass
class ConvIndex:
    """Conversation-level token/subword alignment (one conversation)."""

    words: list[str]                      # conversation-level word stream
    subwords: list[str]
    token2subword: list[int]              # word i -> first subword index (+ total at end)
    subword2token: list[int]              # subword -> word index
    sent_word_bounds: list[int]           # prefix sums of per-turn word counts
    sent_subword_bounds: list[int]        # prefix sums of per-turn subword counts

    @property
    def n_sents(self) -> int:
        return len(self.sent_word_bounds) - 1


def build_conv_index(turn_words: list[list[str]]) -> ConvIndex:
    words = [w for tw in turn_words for w in tw]
    pieces = [tokenize_word(w) for w in words]
    subwords = [p for pl in pieces for p in pl]
    lens = [len(pl) for pl in pieces]
    token2subword = [0] + list(itertools.accumulate(lens))
    subword2token = [i for i, n in enumerate(lens) for _ in range(n)]
    sent_word_bounds = [0] + list(itertools.accumulate(len(tw) for tw in turn_words))
    sent_subword_bounds = [token2subword[b] for b in sent_word_bounds]
    return ConvIndex(words, subwords, token2subword, subword2token,
                     sent_word_bounds, sent_subword_bounds)


@dataclass
class Window:
    """One turn's context window."""

    tokens: list[str]       # [CLS] + context/sentence subwords + [SEP]
    doc_offset: int         # conversation-subword index of tokens[1]
    sent_sub_start: int     # conversation-subword range of the center sentence
    sent_sub_end: int


def context_window(
    idx: ConvIndex, n: int, budget: int, truncate: bool,
    left_total: int | None = None, right_total: int | None = None,
    materialize: bool = True,
) -> Window:
    """Balanced greedy context fill around sentence ``n``; smaller side is
    capped at half first (run_acener.py:212-231). ``truncate`` selects the
    RE behavior (hard slice to budget, run_re.py:261) instead of the NER
    assertion.

    ``left_total``/``right_total`` override the available-context lengths
    with the *full-conversation* values when ``idx`` covers only a segment
    (spanpack_ner_segmented): the fill decisions depend on them, and a
    segment margin ≥ budget guarantees any resulting slice fits locally.

    ``materialize=False`` computes coordinates only (``tokens`` empty) —
    for consumers that never read window *content* (the surrogate RE path
    scores span surfaces; only the K5 tensor/splice paths need tokens), so
    the caller can skip shipping the ``subwords`` strings entirely."""
    s0, s1 = idx.sent_subword_bounds[n], idx.sent_subword_bounds[n + 1]
    total = idx.sent_subword_bounds[-1]
    left_len = s0 if left_total is None else left_total
    right_len = (total - s1) if right_total is None else right_total
    sent_len = s1 - s0
    half = (budget - sent_len) // 2
    left_ctx = right_ctx = 0
    if sent_len < budget or not truncate:
        if left_len < right_len:
            left_ctx = min(left_len, half)
            right_ctx = min(right_len, budget - left_ctx - sent_len)
        else:
            right_ctx = min(right_len, half)
            left_ctx = min(left_len, budget - right_ctx - sent_len)
    doc_offset = s0 - left_ctx
    if not materialize:
        if not truncate and left_ctx + sent_len + right_ctx > budget:
            raise ValueError(
                f"sentence {n} ({sent_len} subwords) exceeds window budget {budget}"
            )
        return Window([], doc_offset, s0, s1)
    target = idx.subwords[doc_offset : s1 + right_ctx]
    if truncate:
        target = target[:budget]
    elif len(target) > budget:
        raise ValueError(
            f"sentence {n} ({sent_len} subwords) exceeds window budget {budget}"
        )
    return Window([CLS] + target + [SEP], doc_offset, s0, s1)


def enumerate_spans(
    idx: ConvIndex, n: int, win: Window, max_mention_len: int
) -> list[tuple[int, int, int, int]]:
    """All candidate spans of sentence ``n``: subword-aligned, word-length
    capped (C1). Returns (win_start, win_end, word_start, word_end) where
    win_* are CLS-shifted inclusive window-subword coords — identical to the
    reference's ``(entity_start+1, entity_end)`` encoding
    (run_acener.py:249) — and word_* are conversation-level word indices.
    Enumeration order is (start asc, end asc), the reference's order."""
    ws0 = idx.sent_word_bounds[n]
    ws1 = idx.sent_word_bounds[n + 1]  # exclusive
    out = []
    for ws in range(ws0, ws1):
        lo = idx.token2subword[ws] - win.doc_offset + 1
        for we in range(ws, min(ws + max_mention_len, ws1)):
            hi = idx.token2subword[we + 1] - win.doc_offset  # inclusive (CLS-shifted)
            out.append((lo, hi, ws, we))
    return out


def enumerate_spans_np(
    t2s: np.ndarray, ws0: int, ws1: int, doc_offset: int, max_mention_len: int
):
    """Vectorized C1 enumeration: same spans and the same (start asc, end
    asc) order as enumerate_spans, as four int arrays (win_s, win_e,
    word_s, word_e). ``t2s`` = token2subword prefix array."""
    starts = np.arange(ws0, ws1)
    grid_e = starts[:, None] + np.arange(max_mention_len)[None, :]
    mask = grid_e < ws1
    word_s = np.repeat(starts, mask.sum(axis=1))
    word_e = grid_e[mask]
    win_s = t2s[word_s] - doc_offset + 1
    win_e = t2s[word_e + 1] - doc_offset
    return win_s, win_e, word_s, word_e


def n_spans_exhaustive(n_words: int, max_mention_len: int) -> int:
    """Closed form of len(enumerate_spans(...)) for the exhaustive C1 path:
    sum over word k of min(max_mention_len, n_words - k)."""
    m = min(max_mention_len, n_words)
    return m * n_words - m * (m - 1) // 2


def reconstruct_spans(
    first_sub: np.ndarray, last_sub: np.ndarray,
    sent_off: int, n_words: int, word_off: int, max_mention_len: int,
):
    """Inverse of the slim packed_ner encoding: rebuild the exhaustive C1
    enumeration (win_s, win_e, word_s, word_e) from the window's own
    word-boundary arrays plus three scalars.

    ``first_sub``/``last_sub`` are the window-token indices of each window
    word's first/last subword (CLS included as word 0 — the same scan
    ner_fast_scores performs); ``sent_off`` is the CLS-shifted window-token
    index of the center sentence's first subword, ``n_words`` the sentence
    word count, ``word_off`` the conversation-level word index of the
    sentence's first word. Identical output (values and enumeration order)
    to enumerate_spans_np over the original conversation index — the
    round-trip is pytest-gated (test_kernels.test_slim_reconstruction)."""
    f = int(np.searchsorted(first_sub, sent_off))
    ks = np.arange(n_words)
    grid = ks[:, None] + np.arange(max_mention_len)[None, :]
    mask = grid < n_words
    rel_s = np.repeat(ks, mask.sum(axis=1))
    rel_e = grid[mask]
    return (
        first_sub[f + rel_s],
        last_sub[f + rel_e],
        rel_s + word_off,
        rel_e + word_off,
    )


def pack_groups(spans: list, cfg: PipelineConfig, seed: int | None = None) -> list[list]:
    """K1 fixed-size chunking, or K2 edge-aware packing that never splits a
    run of equal group-axis values (run_acener.py:287-315).

    The reference's randomized knobs — ``shuffle`` (run_acener.py:268-269),
    ``group_sort`` (random axis + direction sort, :270-272), and edge mode's
    random axis (``group_axis=-1``) / always-random direction (:288-292) —
    are reproduced from a caller-supplied ``seed`` (stable per turn), not
    global random state: deterministic, partitioning-independent packing
    with the same geometry distribution. Draw ORDER mirrors the reference
    (shuffle, then axis, then direction). With all knobs off the default
    deterministic ascending sort is byte-identical to previous rounds."""
    dL = cfg.max_pair_length_ner
    rng = None
    if cfg.shuffle or cfg.group_sort or cfg.group_edge:
        rng = np.random.RandomState((seed or 0) & 0x7FFFFFFF)
    if rng is not None and cfg.shuffle:
        spans = list(spans)
        rng.shuffle(spans)
    if not cfg.group_edge:
        if rng is not None and cfg.group_sort:
            ax = int(rng.randint(2))
            rev = bool(rng.randint(2))
            spans = sorted(spans, key=lambda x: (x[ax], x[1 - ax]), reverse=rev)
        return [spans[i : i + dL] for i in range(0, len(spans), dL)]
    ax = cfg.group_axis
    if ax == -1:
        ax = int(rng.randint(2))
    # edge mode draws the sort direction UNCONDITIONALLY (run_acener.py:291
    # `sort_dir = bool(np.random.randint(2))` sits outside the axis==-1
    # branch) — fixed-axis edge mode is still randomly-directed (round-3
    # ADVICE: the previous code kept rev=False there and the docstring
    # overclaimed fidelity)
    rev = bool(rng.randint(2))
    ordered = sorted(spans, key=lambda x: (x[ax], x[1 - ax]), reverse=rev)
    groups = []
    start = 0
    while start < len(ordered):
        end = start + dL
        if end >= len(ordered):
            end = len(ordered)
        else:
            while end > start and ordered[end - 1][ax] == ordered[end][ax]:
                end -= 1
            if end == start:
                end = start + dL
        groups.append(ordered[start:end])
        start = end
    return groups


@dataclass
class SubjectInstance:
    """One packed RE instance: a marked subject and ≤max_pair_length objects."""

    sub_word: tuple[int, int]        # subject (word_start, word_end)
    sub_label: str
    sub_win: tuple[int, int]         # subject window coords after marker insertion
    tokens: list[str]                # window with solid markers spliced in
    # objects: (win_left, win_right, obj_label, word_start, word_end)
    objects: list[tuple[int, int, str, int, int]]


def subject_instances(
    idx: ConvIndex,
    n: int,
    win: Window,
    mentions: list[tuple[int, int, str]],  # (word_start, word_end, label) sorted
    cfg: PipelineConfig,
) -> list[SubjectInstance]:
    """C3 pair generation + K3/K4 subject-oriented packing.

    Faithful to run_re.py:286-355: solid markers splice around the subject
    (sub_e += 2), object window coords get +1/+2 shifts past the inserted
    markers, and objects whose right edge falls outside the sequence budget
    are dropped (as are subjects whose own markers do)."""
    from .world import NER_INDEX, NUM_NER

    max_seq = cfg.max_seq_length_re
    out: list[SubjectInstance] = []
    for sub in mentions:
        sub_s = idx.token2subword[sub[0]] - win.doc_offset + 1
        sub_e = idx.token2subword[sub[1] + 1] - win.doc_offset
        if cfg.needs_spliced_tokens():
            # the spliced token stream is consumed only by the K5 tensor
            # parity path; skip the splice otherwise (the coordinate
            # arithmetic below carries all result semantics)
            if cfg.use_typemarker:
                # typed solid markers [unused(2+type)] / [unused(2+type+|L|)]
                # (run_re.py:294-296)
                ti = NER_INDEX[sub[2]]
                l_m, r_m = f"[unused{2 + ti}]", f"[unused{2 + ti + NUM_NER}]"
            else:
                l_m, r_m = SUB_L, SUB_R
            tokens = (
                win.tokens[:sub_s] + [l_m] + win.tokens[sub_s : sub_e + 1]
                + [r_m] + win.tokens[sub_e + 1 :]
            )
        else:
            tokens = []
        sub_e += 2
        if sub_e >= max_seq - 1:
            continue
        objs: list[tuple[int, int, str, int, int]] = []
        for obj in mentions:
            left = idx.token2subword[obj[0]] - win.doc_offset + 1
            right = idx.token2subword[obj[1] + 1] - win.doc_offset
            if obj[0] >= sub[0]:
                left += 1
                if obj[0] > sub[1]:
                    left += 1
            if obj[1] >= sub[0]:
                right += 1
                if obj[1] > sub[1]:
                    right += 1
            if right >= max_seq - 1:
                continue
            objs.append((left, right, obj[2], obj[0], obj[1]))
        dL = cfg.max_pair_length_re
        # zero surviving objects -> zero packed rows, as in the reference's
        # per-chunk loop over an empty candidate list
        for i in range(0, len(objs), dL):
            out.append(
                SubjectInstance(
                    sub_word=(sub[0], sub[1]),
                    sub_label=sub[2],
                    sub_win=(sub_s, sub_e),
                    tokens=tokens,
                    objects=objs[i : i + dL],
                )
            )
    return out


def _token_id(tok: str) -> int:
    """Deterministic vocab stand-in for tokenizer.convert_tokens_to_ids."""
    return stable_hash(tok) % 30000 + 10


def assemble_ner_tensors(
    window: list[str], spans: list[tuple[int, int]], max_seq: int, max_pairs: int
):
    """K5 levitated-marker tensor assembly (parity demo for the real-encoder
    path; the surrogate does not consume these).

    Reference run_acener.py:326-400: input_ids padded to max_seq followed by
    interleaved start/end marker ids; each marker pair copies its span's
    position ids; the 2D attention mask lets the text block attend to itself
    and each marker pair attend to (text + itself + its partner)."""
    L = len(window)
    P = min(len(spans), max_pairs)
    width = max_seq + 2 * P
    input_ids = np.zeros(width, dtype=np.int64)
    input_ids[:L] = [_token_id(t) for t in window]
    position_ids = np.zeros(width, dtype=np.int64)
    position_ids[:L] = np.arange(L)
    attention = np.zeros((width, width), dtype=np.int8)
    attention[:L, :L] = 1
    for k, (lo, hi) in enumerate(spans[:P]):
        m1 = max_seq + k
        m2 = max_seq + P + k
        input_ids[m1] = 1  # start-marker id ([unused1]-style slot)
        input_ids[m2] = 2  # end-marker id
        position_ids[m1] = lo
        position_ids[m2] = hi
        attention[m1, :L] = 1
        attention[m2, :L] = 1
        attention[m1, m1] = attention[m1, m2] = 1
        attention[m2, m1] = attention[m2, m2] = 1
    return input_ids, position_ids, attention


def assemble_ner_tensors_batch(
    windows: list[list[str]], spans_list: list[list[tuple[int, int]]],
    max_seq: int, max_pairs: int,
):
    """Batched K5 assembly across packed groups (round-2 VERDICT item #1):
    every group's tensors are written into ONE stacked buffer set
    (ids/positions (B, Wmax), attention (B, Wmax, Wmax) int8) instead of a
    fresh (S+2P)² allocation per group. Each group keeps its own layout —
    markers at max_seq+k / max_seq+P_g+k — and the padded tail is all-zero
    attention, so the batched masked-mean contributes exactly +0 terms
    there. Returns (input_ids, position_ids, attention, widths)."""
    B = len(windows)
    Ps = [min(len(s), max_pairs) for s in spans_list]
    widths = np.array([max_seq + 2 * p for p in Ps], dtype=np.int64)
    Wmax = int(widths.max()) if B else max_seq
    input_ids = np.zeros((B, Wmax), dtype=np.int64)
    position_ids = np.zeros((B, Wmax), dtype=np.int64)
    attention = np.zeros((B, Wmax, Wmax), dtype=np.int8)
    for b, (window, spans) in enumerate(zip(windows, spans_list)):
        L = len(window)
        P = Ps[b]
        input_ids[b, :L] = [_token_id(t) for t in window]
        position_ids[b, :L] = np.arange(L)
        attention[b, :L, :L] = 1
        if P == 0:
            continue
        lo = np.fromiter((s[0] for s in spans[:P]), dtype=np.int64, count=P)
        hi = np.fromiter((s[1] for s in spans[:P]), dtype=np.int64, count=P)
        m1 = max_seq + np.arange(P)
        m2 = max_seq + P + np.arange(P)
        input_ids[b, m1] = 1
        input_ids[b, m2] = 2
        position_ids[b, m1] = lo
        position_ids[b, m2] = hi
        attention[b, m1, :L] = 1
        attention[b, m2, :L] = 1
        attention[b, m1, m1] = attention[b, m1, m2] = 1
        attention[b, m2, m1] = attention[b, m2, m2] = 1
    return input_ids, position_ids, attention, widths


def assemble_re_tensors_batch(
    tokens_list: list[list[str]],
    sub_wins: list[tuple[int, int]],
    objects_list: list[list[tuple[int, int]]],
    max_seq: int,
    max_pairs: int,
    att_left: bool = False,
    att_right: bool = False,
):
    """Batched RE-variant K5 assembly (see assemble_ner_tensors_batch).
    Returns (input_ids, position_ids, attention, sub_positions (B,2),
    widths). ``att_left``/``att_right`` are the K6 group-attention knobs
    (run_re.py:420-424): all start markers (resp. all end markers) of a
    packed group additionally attend to each other — breaking packing
    independence by design (the reference's ablation)."""
    B = len(tokens_list)
    Ps = [min(len(o), max_pairs) for o in objects_list]
    widths = np.array([max_seq + 2 * p for p in Ps], dtype=np.int64)
    Wmax = int(widths.max()) if B else max_seq
    input_ids = np.zeros((B, Wmax), dtype=np.int64)
    position_ids = np.zeros((B, Wmax), dtype=np.int64)
    attention = np.zeros((B, Wmax, Wmax), dtype=np.int8)
    sub_positions = np.zeros((B, 2), dtype=np.int64)
    for b, (tokens, sub_win, objects) in enumerate(
        zip(tokens_list, sub_wins, objects_list)
    ):
        L = len(tokens)
        P = Ps[b]
        input_ids[b, :L] = [_token_id(t) for t in tokens]
        position_ids[b, :L] = np.arange(L)
        attention[b, :L, :L] = 1
        sub_positions[b] = sub_win
        if P == 0:
            continue
        left = np.fromiter((o[0] for o in objects[:P]), dtype=np.int64, count=P)
        right = np.fromiter((o[1] for o in objects[:P]), dtype=np.int64, count=P)
        m1 = max_seq + np.arange(P)
        m2 = max_seq + P + np.arange(P)
        input_ids[b, m1] = 3
        input_ids[b, m2] = 4
        position_ids[b, m1] = left
        position_ids[b, m2] = right
        attention[b, m1, :L] = attention[b, m2, :L] = 1
        attention[b, m1, m1] = attention[b, m1, m2] = 1
        attention[b, m2, m1] = attention[b, m2, m2] = 1
        if att_left:     # K6: start-marker block attends to itself
            attention[b, max_seq : max_seq + P, max_seq : max_seq + P] = 1
        if att_right:    # K6: end-marker block attends to itself
            attention[b, max_seq + P : max_seq + 2 * P,
                      max_seq + P : max_seq + 2 * P] = 1
    return input_ids, position_ids, attention, sub_positions, widths


def assemble_re_tensors(
    tokens_with_markers: list[str],
    sub_win: tuple[int, int],
    objects: list[tuple[int, int]],
    max_seq: int,
    max_pairs: int,
    att_left: bool = False,
    att_right: bool = False,
):
    """K5, RE variant (reference run_re.py:362-438): the subject's solid
    markers are already spliced into the token stream; each object gets a
    levitated marker pair whose position ids copy the object's (CLS-shifted,
    marker-adjusted) span, attending to the text block and its partner.
    ``att_left``/``att_right``: K6 group-attention variants
    (run_re.py:420-424) — the start-marker (resp. end-marker) block of the
    group also attends to itself, so pair logits become packing-dependent
    (single-pair groups are invariant: the extra cell is already 1).
    Returns (input_ids, position_ids, attention, sub_positions)."""
    L = len(tokens_with_markers)
    P = min(len(objects), max_pairs)
    width = max_seq + 2 * P
    input_ids = np.zeros(width, dtype=np.int64)
    input_ids[:L] = [_token_id(t) for t in tokens_with_markers]
    position_ids = np.zeros(width, dtype=np.int64)
    position_ids[:L] = np.arange(L)
    attention = np.zeros((width, width), dtype=np.int8)
    attention[:L, :L] = 1
    for k, (left, right) in enumerate(objects[:P]):
        m1 = max_seq + k
        m2 = max_seq + P + k
        input_ids[m1] = 3  # object start marker slot ([unused2]-style)
        input_ids[m2] = 4
        position_ids[m1] = left
        position_ids[m2] = right
        attention[m1, :L] = attention[m2, :L] = 1
        attention[m1, m1] = attention[m1, m2] = 1
        attention[m2, m1] = attention[m2, m2] = 1
    if att_left:
        attention[max_seq : max_seq + P, max_seq : max_seq + P] = 1
    if att_right:
        attention[max_seq + P : max_seq + 2 * P,
                  max_seq + P : max_seq + 2 * P] = 1
    sub_positions = np.array(sub_win, dtype=np.int64)
    return input_ids, position_ids, attention, sub_positions

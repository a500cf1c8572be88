"""Two-stage NER path: cheap BIO tagger → candidates table → packed-marker
scoring restricted to candidates.

Reference semantics:
- I4 BIO token classifier as the candidate generator
  (run_ner_BIO.py:199-222, 933)
- P8 BIO→span conversion, stateful scan (run_ner.py:193-219)
- P9 span→BIO reconstruction, highest score first (run_ner.py:1042-1054)
- P10 IOB2→IOB1 (run_ner.py:1066-1071)
- O13 top-k candidates per sentence by 1-P(NIL) (run_ner.py:1014,1057-1062)
- C2 candidate-restricted enumeration (run_ner.py:244-260)
- S6 candidates sink/source (run_ner.py:1088-1090, 244-260)

This is the scale plan for 10^12-turn inputs (SURVEY.md §3.3): a cheap
linear tagger prunes the O(L·8) span space before the expensive packed
encoder runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..kernels import context_window, pack_groups
from ..world import GAZETTEER, jitter, stable_hash

BIO_SCHEMA = (
    "conv_id string, turn_idx int, tags array<string>, word_off int"
)
CANDIDATES_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, notnil_prob double"
)

# cheap-tagger gazetteer index: first word -> [(word tuple, label)]
_PHRASE_INDEX: dict[str, list[tuple[tuple[str, ...], str]]] = {}
for _surf, _label in GAZETTEER.items():
    _ws = tuple(_surf.split())
    _PHRASE_INDEX.setdefault(_ws[0], []).append((_ws, _label))
for _v in _PHRASE_INDEX.values():
    _v.sort(key=lambda x: -len(x[0]))  # longest match first

# candidate confidence per phrase: the surface of an exact gazetteer match
# IS the phrase, so 0.9 + jitter(surface) is a constant per phrase —
# precomputed once instead of hashed per occurrence
_PHRASE_PROB: dict[tuple[str, ...], float] = {
    tuple(_surf.split()): 0.9 + jitter("cand|" + _surf) for _surf in GAZETTEER
}


def tag_words_bio(words: list[str]) -> list[str]:
    """I4 surrogate: greedy longest-match gazetteer tagging → BIO tags."""
    n = len(words)
    tags = ["O"] * n
    i = 0
    while i < n:
        hit = None
        for ws, label in _PHRASE_INDEX.get(words[i], ()):
            if tuple(words[i : i + len(ws)]) == ws:
                hit = (len(ws), label)
                break
        if hit:
            k, label = hit
            tags[i] = "B-" + label
            for j in range(i + 1, i + k):
                tags[j] = "I-" + label
            i += k
        else:
            i += 1
    return tags


def bio_to_spans(tags: list[str]) -> list[tuple[int, int, str]]:
    """P8: stateful scan — B starts, I continues (or starts after O/boundary),
    O closes (run_ner.py:193-219 semantics)."""
    spans = []
    start, cur = -1, None
    for i, t in enumerate(tags):
        if t == "O":
            if cur is not None:
                spans.append((start, i - 1, cur))
                cur = None
        else:
            prefix, label = t[0], t[2:]
            if prefix == "B" or cur is None or label != cur:
                if cur is not None:
                    spans.append((start, i - 1, cur))
                start, cur = i, label
    if cur is not None:
        spans.append((start, len(tags) - 1, cur))
    return spans


def spans_to_bio(n: int, spans: list[tuple[int, int, str, float]]) -> list[str]:
    """P9: paint B-/I- over an O sequence, highest score first, skipping
    spans that collide with already-painted tokens (run_ner.py:1042-1054)."""
    tags = ["O"] * n
    for s, e, label, _score in sorted(spans, key=lambda x: -x[3]):
        if any(tags[i] != "O" for i in range(s, e + 1)):
            continue
        tags[s] = "B-" + label
        for i in range(s + 1, e + 1):
            tags[i] = "I-" + label
    return tags


def iob2_to_iob1(tags: list[str]) -> list[str]:
    """P10: B-X → I-X unless preceded by a same-type chunk
    (run_ner.py:1066-1071)."""
    out = list(tags)
    for i, t in enumerate(out):
        if t.startswith("B-"):
            if i == 0 or out[i - 1][2:] != t[2:] or out[i - 1] == "O":
                out[i] = "I-" + t[2:]
    return out


def bio_tag_stage(turns_tok: DataFrame) -> DataFrame:
    """I4 as a shuffle-free mapInPandas over turns; emits per-turn BIO tags
    plus the turn's conversation-level word offset (computed downstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["conv_id", "turn_idx"]].copy()
            out["tags"] = [tag_words_bio(list(ws)) for ws in pdf["words"]]
            out["word_off"] = 0
            yield out

    return turns_tok.mapInPandas(run, schema=BIO_SCHEMA)


def candidates_from_bio(turns_tok: DataFrame, top_k: int = 256) -> DataFrame:
    """BIO tags → conversation-level candidate spans with a deterministic
    not-NIL confidence; O13 rank-based top-k per turn (run_ner.py:1057-1062).

    Word offsets come from the P4 prefix-sum window over turn word counts."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    offs = turns_tok.select(
        "conv_id", "turn_idx", "words",
        (F.sum(F.size("words")).over(w) - F.size("words")).alias("word_off"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-flattened scan (the fused-NER discipline, round-4 VERDICT
        # item #5): the whole Arrow batch's words become ONE flat stream;
        # first-word gazetteer hits are found via a single factorize +
        # vectorized table lookup, and the only Python loop left runs over
        # those sparse hits — never over rows or words. Semantics are pinned
        # to tag_words_bio→bio_to_spans (greedy left-to-right, longest
        # match first, non-overlapping; a BIO round-trip maps matches to
        # spans 1:1 because every match opens with B-) and equality-gated
        # by test_bio_two_stage.
        for pdf in batches:
            empty = pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "turn_idx": pd.Series([], dtype="int32"),
                "start": pd.Series([], dtype="int32"),
                "end": pd.Series([], dtype="int32"),
                "notnil_prob": pd.Series([], dtype="float64"),
            })
            if pdf.empty:
                yield empty
                continue
            word_col = list(pdf["words"])
            lens = np.fromiter((len(w) for w in word_col), dtype=np.int64,
                               count=len(word_col))
            total = int(lens.sum())
            if total == 0:
                yield empty
                continue
            w_all = np.concatenate(
                [np.asarray(w, dtype=object) for w in word_col])
            offs = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            row_end_of = np.repeat(offs[1:], lens)   # exclusive row end
            row_start_of = np.repeat(offs[:-1], lens)
            # sparse first-word hits: one factorize over the stream, then a
            # boolean table over the (small) unique-word vocabulary
            codes, uniq = pd.factorize(w_all)
            is_first = np.fromiter((u in _PHRASE_INDEX for u in uniq),
                                   dtype=bool, count=len(uniq))
            hits = np.nonzero(is_first[codes])[0]
            # greedy left-to-right over hits only; matches never cross a row
            # boundary, so one scalar frontier reproduces the per-row scan
            pos_l: list[int] = []
            len_l: list[int] = []
            prob_l: list[float] = []
            nxt = 0
            for h in hits:
                if h < nxt:
                    continue
                end_row = row_end_of[h]
                for ws, _label in _PHRASE_INDEX[w_all[h]]:
                    k = len(ws)
                    if h + k <= end_row and tuple(w_all[h:h + k]) == ws:
                        pos_l.append(h)
                        len_l.append(k)
                        prob_l.append(_PHRASE_PROB[ws])
                        nxt = h + k
                        break
            if not pos_l:
                yield empty
                continue
            pos = np.asarray(pos_l, dtype=np.int64)
            klen = np.asarray(len_l, dtype=np.int64)
            rows = np.searchsorted(offs[1:], pos, side="right")
            start = (pdf["word_off"].to_numpy()[rows]
                     + pos - row_start_of[pos])
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[rows],
                    "turn_idx": pd.Series(
                        pdf["turn_idx"].to_numpy()[rows], dtype="int32"),
                    "start": pd.Series(start, dtype="int32"),
                    "end": pd.Series(start + klen - 1, dtype="int32"),
                    "notnil_prob": pd.Series(prob_l, dtype="float64"),
                }
            )

    cands = offs.mapInPandas(run, schema=CANDIDATES_SCHEMA)
    wk = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("notnil_prob"), "start", "end"
    )
    return (
        cands.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= top_k)
        .drop("rk")
    )


def spanpack_from_candidates(turns_tok: DataFrame, candidates: DataFrame,
                             cfg: PipelineConfig) -> DataFrame:
    """C2: packed NER groups restricted to the candidates table — a cogroup
    join instead of exhaustive enumeration (run_ner.py:244-260)."""
    from .spanpack import PACKED_NER_COLS, PACKED_NER_SCHEMA, _conv_index_from_rows

    budget = cfg.budget_ner()

    def repack(key, turns_pdf: pd.DataFrame, cands_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = PACKED_NER_COLS
        if turns_pdf.empty or cands_pdf.empty:
            return pd.DataFrame(columns=cols)
        turns_pdf, idx = _conv_index_from_rows(turns_pdf)
        tid_to_ord = {int(t): n for n, t in enumerate(turns_pdf["turn_idx"])}
        from .repack import _mentions_by_turn

        rows = []
        for tid, spans_w in _mentions_by_turn(cands_pdf, with_label=False):
            n = tid_to_ord[tid]
            win = context_window(idx, n, budget, truncate=False)
            spans = []
            for ws, we in spans_w:
                lo = idx.token2subword[ws] - win.doc_offset + 1
                hi = idx.token2subword[we + 1] - win.doc_offset
                spans.append((lo, hi, ws, we))
            groups = pack_groups(spans, cfg,
                                 seed=stable_hash(f"{key[0]}:{tid}"))
            for gid, group in enumerate(groups):
                rows.append(
                    (key[0], tid, gid, " ".join(win.tokens),
                     [s[0] for s in group], [s[1] for s in group],
                     [s[2] for s in group], [s[3] for s in group], len(spans),
                     None, None, None)
                )
        return pd.DataFrame(rows, columns=cols)

    return (
        turns_tok.groupBy("conv_id")
        .cogroup(candidates.groupBy("conv_id"))
        .applyInPandas(repack, schema=PACKED_NER_SCHEMA)
    )


def two_stage_mentions(turns_tok: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Full two-stage NER: BIO candidates → C2 packing → packed-head scoring
    → suppression. The scalable default for huge corpora."""
    from .ner import infer_ner, suppress_mentions

    cands = candidates_from_bio(turns_tok)
    packed = spanpack_from_candidates(turns_tok, cands, cfg)
    return suppress_mentions(infer_ner(packed, cfg), cfg)

"""C4 — all-pairs levitated-pair RE variant (run_levitatedpair.py:282-322).

Differences from the subject-oriented default (repack.py / rel.py):
- no solid subject markers: BOTH mentions of a pair get levitated marker
  pairs, so window coords carry no +1/+2 splice shifts and the window
  budget reserves only CLS/SEP (max_seq - 2, run_levitatedpair.py:161);
- the pair list is the full subject×object product *including self-pairs*
  (the reference's skip is commented out, :293-294), chunked subject-major
  into groups of ``max_pair_length_re``;
- decode is forward-only: argmax over the NUM_REL label head — no
  bidirectional fusion, no inverse block (evaluate(), :700-720). A
  relation the model only scores in the reverse orientation is therefore
  not predicted — that IS the variant's semantics;
- both endpoint types come from the aux NER heads (:712-714), which for
  the surrogate is the gazetteer lookup.

Deviation noted: pairs whose (unshifted) right coordinate falls outside
``max_seq - 1`` are dropped — the reference builds them and would index a
position embedding out of range; its eval data never hits this.

Output rows are TRIPLES_RAW-shaped, so O6 suppression and O7 refinement
are shared with the default path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..kernels import context_window
from ..pipeline.repack import _mentions_by_turn
from ..pipeline.spanpack import _conv_index_from_rows
from ..surrogate import aux_obj_ner, re_logits_for_pair
from ..world import NUM_REL, REL_LABELS

PACKED_LEV_SCHEMA = (
    "conv_id string, turn_idx int, group_id int, "
    "s1 array<int>, e1 array<int>, s2 array<int>, e2 array<int>, "
    "sub_surface array<string>, obj_surface array<string>"
)
DECODED_SCHEMA = (
    "conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, "
    "pred string, score double, m1_ner string, m2_ner string"
)


def levitated_pair_instances(idx, n, win, mentions, cfg: PipelineConfig):
    """All (subject, object) pairs of sentence ``n`` with in-budget
    levitated coords, chunked subject-major. Returns a list of chunks of
    (sub, obj) word-span pairs."""
    max_seq = cfg.max_seq_length_re
    pairs = []
    for sub in mentions:
        sub_right = idx.token2subword[sub[1] + 1] - win.doc_offset
        if sub_right >= max_seq - 1:
            continue
        for obj in mentions:
            obj_right = idx.token2subword[obj[1] + 1] - win.doc_offset
            if obj_right >= max_seq - 1:
                continue
            pairs.append((sub, obj))
    dL = cfg.max_pair_length_re
    return [pairs[i : i + dL] for i in range(0, len(pairs), dL)]


def repack_levitated(turns_tok: DataFrame, mentions: DataFrame,
                     cfg: PipelineConfig) -> DataFrame:
    budget = cfg.budget_lev()

    def repack(key, turns_pdf: pd.DataFrame, mentions_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "turn_idx", "group_id", "s1", "e1", "s2", "e2",
                "sub_surface", "obj_surface"]
        if mentions_pdf.empty or turns_pdf.empty:
            return pd.DataFrame(columns=cols)
        turns_pdf, idx = _conv_index_from_rows(turns_pdf)
        cid = key[0]
        tid_to_ord = {int(t): n for n, t in enumerate(turns_pdf["turn_idx"])}
        rows = []
        for tid, ments in _mentions_by_turn(mentions_pdf):
            n = tid_to_ord[tid]
            win = context_window(idx, n, budget, truncate=True)
            for gid, chunk in enumerate(
                levitated_pair_instances(idx, n, win, ments, cfg)
            ):
                rows.append(
                    (cid, tid, gid,
                     [p[0][0] for p in chunk], [p[0][1] for p in chunk],
                     [p[1][0] for p in chunk], [p[1][1] for p in chunk],
                     [" ".join(idx.words[p[0][0] : p[0][1] + 1]) for p in chunk],
                     [" ".join(idx.words[p[1][0] : p[1][1] + 1]) for p in chunk])
                )
        return pd.DataFrame(rows, columns=cols)

    return (
        turns_tok.groupBy("conv_id")
        .cogroup(mentions.groupBy("conv_id"))
        .applyInPandas(repack, schema=PACKED_LEV_SCHEMA)
    )


def repack_levitated_segmented(
    turns_tok: DataFrame, mentions: DataFrame, cfg: PipelineConfig,
    seg_turns: int = 64,
) -> DataFrame:
    """Segmented C4 packing (unbounded-conversation path composed with the
    levitated-pair variant — round-2 VERDICT item #5): turns replicate into
    reachable segments, mentions cogroup by center segment, windows use
    full-conversation context totals, word coords shift back to
    conversation level. Output equals the unsegmented repack_levitated
    exactly (tests/test_segmented.py::test_segmented_levpair)."""
    from .repack import _segmented_repack_inputs

    budget = cfg.budget_lev()
    assigned, m_seg = _segmented_repack_inputs(turns_tok, mentions, budget,
                                               seg_turns)

    def repack(key, turns_pdf: pd.DataFrame, mentions_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "turn_idx", "group_id", "s1", "e1", "s2", "e2",
                "sub_surface", "obj_surface"]
        if mentions_pdf.empty or turns_pdf.empty:
            return pd.DataFrame(columns=cols)
        turns_pdf = turns_pdf.sort_values("turn_idx").reset_index(drop=True)
        _, idx = _conv_index_from_rows(
            turns_pdf[["conv_id", "turn_idx", "words", "subwords", "sw_counts"]]
        )
        cid = key[0]
        word_off = int(turns_pdf["word_off"].iloc[0])
        tid_to_ord = {int(t): n for n, t in enumerate(turns_pdf["turn_idx"])}
        rows = []
        for tid, ments in _mentions_by_turn(mentions_pdf, word_off):
            n = tid_to_ord[tid]
            win = context_window(
                idx, n, budget, truncate=True,
                left_total=int(turns_pdf["cum_start"].iloc[n]),
                right_total=int(turns_pdf["conv_total"].iloc[n]
                                - turns_pdf["cum_end"].iloc[n]),
            )
            for gid, chunk in enumerate(
                levitated_pair_instances(idx, n, win, ments, cfg)
            ):
                rows.append(
                    (cid, tid, gid,
                     [p[0][0] + word_off for p in chunk],
                     [p[0][1] + word_off for p in chunk],
                     [p[1][0] + word_off for p in chunk],
                     [p[1][1] + word_off for p in chunk],
                     [" ".join(idx.words[p[0][0] : p[0][1] + 1]) for p in chunk],
                     [" ".join(idx.words[p[1][0] : p[1][1] + 1]) for p in chunk])
                )
        return pd.DataFrame(rows, columns=cols)

    return (
        assigned.groupBy("conv_id", "seg_id")
        .cogroup(m_seg.groupBy("conv_id", "seg_id"))
        .applyInPandas(repack, schema=PACKED_LEV_SCHEMA)
    )


def decode_levitated(packed_lev: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Forward-only decode per pair: argmax over the NUM_REL head, keep
    pred > 0, endpoint types from the aux NER lookup."""

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # flattened batch decode: pairs explode via repeat/concatenate,
            # forward-only argmax vectorized over the stacked logit matrix
            n = len(pdf)
            c_s1 = pdf["s1"].to_numpy()
            counts = np.fromiter((len(x) for x in c_s1), dtype=np.int64,
                                 count=n)
            rep = np.repeat(np.arange(n), counts)
            total = int(counts.sum())

            def flat(col):
                arrs = pdf[col].to_numpy()
                return (np.concatenate([np.asarray(a) for a in arrs])
                        if total else np.empty(0, dtype=object))

            ss = flat("sub_surface")
            os_ = flat("obj_surface")
            if total:
                mat = np.array([re_logits_for_pair(a, b)[:NUM_REL]
                                for a, b in zip(ss, os_)])
                ks = mat.argmax(axis=1)
                kk = np.flatnonzero(ks > 0)
                kpred = ks[kk]
            else:
                kk = kpred = np.empty(0, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[rep][kk],
                    "turn_idx": pd.Series(
                        pdf["turn_idx"].to_numpy()[rep][kk], dtype="int32"),
                    "s1": pd.Series(
                        np.asarray(flat("s1"), dtype=np.int64)[kk], dtype="int32"),
                    "e1": pd.Series(
                        np.asarray(flat("e1"), dtype=np.int64)[kk], dtype="int32"),
                    "s2": pd.Series(
                        np.asarray(flat("s2"), dtype=np.int64)[kk], dtype="int32"),
                    "e2": pd.Series(
                        np.asarray(flat("e2"), dtype=np.int64)[kk], dtype="int32"),
                    "pred": [REL_LABELS[int(k)] for k in kpred],
                    "score": pd.Series(
                        (mat[kk, kpred] if total else kk), dtype="float64"),
                    "m1_ner": [aux_obj_ner(x) for x in ss[kk]],
                    "m2_ner": [aux_obj_ner(x) for x in os_[kk]],
                }
            )

    return packed_lev.mapInPandas(infer, schema=DECODED_SCHEMA)

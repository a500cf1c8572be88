"""Stage 2 — span-pack (NER): conversation window assembly + exhaustive span
enumeration + neighborhood packing.

Reference semantics P4-P7 (run_acener.py:187-231), C1 (run_acener.py:233-249)
and K1/K2 (run_acener.py:266-315); see kernels.py. One grouped-map per
conversation — a conversation is the irreducible unit (context windows read
neighboring turns), so the shuffle key is ``conv_id``. Conversation sizes are
bounded (turns x window ≈ KBs), so per-group memory stays flat even on the
planted heavy-tail conversation; across the cluster AQE coalesces/splits the
shuffle. Spans are emitted as parallel primitive arrays (Arrow-friendly, no
struct boxing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..kernels import (
    ConvIndex,
    context_window,
    pack_groups,
)

PACKED_NER_SCHEMA = (
    "conv_id string, turn_idx int, group_id int, window string, "
    "win_s array<int>, win_e array<int>, word_s array<int>, word_e array<int>, "
    "example_l int, sent_off int, n_words int, word_off int"
)
# Two row forms share this schema:
# - SLIM (exhaustive C1 path): the four coordinate arrays are NULL and
#   (sent_off, n_words, word_off) are set — the group's spans are a pure
#   function of the window string plus these scalars
#   (kernels.reconstruct_spans), so ~70% of the stage table's bytes
#   (measured: the int arrays vs the window string) never hit parquet or
#   the Arrow pipe. infer_ner rebuilds coordinates executor-side.
# - EXPLICIT (C2 candidate-restricted / K2 edge-aware packing): arbitrary
#   span sets can't be reconstructed, so the arrays are materialized and
#   the three scalars are NULL.
PACKED_NER_COLS = ["conv_id", "turn_idx", "group_id", "window",
                   "win_s", "win_e", "word_s", "word_e", "example_l",
                   "sent_off", "n_words", "word_off"]


def _conv_index_from_rows(pdf: pd.DataFrame) -> tuple[pd.DataFrame, ConvIndex]:
    """Rebuild the conversation-level alignment from per-turn rows.

    ``words`` / ``subwords`` columns are optional: the alignment (prefix
    sums, bounds) derives fully from ``sw_counts``, so callers that never
    read word or subword *content* (spanpack reads subwords only; the
    surrogate RE path reads words only) can prune the other column out of
    their shuffle — the two string arrays are the bulk of a turn's bytes."""
    pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
    has_words = "words" in pdf.columns
    words = [w for ws in pdf["words"] for w in ws] if has_words else []
    subwords = ([s for sw in pdf["subwords"] for s in sw]
                if "subwords" in pdf.columns else [])
    if len(pdf):
        counts = np.concatenate(
            [np.asarray(c, dtype=np.int64) for c in pdf["sw_counts"]]
        )
    else:
        counts = np.zeros(0, dtype=np.int64)
    t2s = np.concatenate(([0], np.cumsum(counts)))
    s2t = np.repeat(np.arange(len(counts)), counts)
    wb = np.concatenate(
        ([0], np.cumsum([len(c) for c in pdf["sw_counts"]]))
    ).astype(np.int64)
    sb = t2s[wb]
    idx = ConvIndex(words, subwords, t2s, s2t, wb.tolist(), sb.tolist())
    return pdf, idx


def make_spanpack_fn(cfg: PipelineConfig):
    budget = cfg.budget_ner()

    def spanpack(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import n_spans_exhaustive

        pdf, idx = _conv_index_from_rows(pdf)
        cid = pdf["conv_id"].iloc[0]
        dL = cfg.max_pair_length_ner
        maxlen = cfg.max_mention_ori_length
        turn_ids = pdf["turn_idx"].to_numpy()
        rows = []
        for n in range(len(pdf)):
            tid = int(turn_ids[n])
            win = context_window(idx, n, budget, truncate=False)
            if cfg.group_edge or cfg.shuffle or cfg.group_sort:
                # K2's greedy run-aware chunker and the seeded shuffle/sort
                # knobs reorder spans before grouping, so the slim
                # arithmetic form below doesn't apply; explicit-array form
                from ..kernels import enumerate_spans
                from ..world import stable_hash

                spans = enumerate_spans(idx, n, win, maxlen)
                if not spans:
                    continue
                groups = pack_groups(spans, cfg,
                                     seed=stable_hash(f"{cid}:{tid}"))
                for gid, group in enumerate(groups):
                    rows.append(
                        (cid, tid, gid, " ".join(win.tokens),
                         [s[0] for s in group], [s[1] for s in group],
                         [s[2] for s in group], [s[3] for s in group],
                         len(spans), None, None, None)
                    )
                continue
            # slim form: exhaustive enumeration is a pure function of the
            # window + (sent_off, n_words, word_off); no coordinate arrays
            nw = idx.sent_word_bounds[n + 1] - idx.sent_word_bounds[n]
            total = n_spans_exhaustive(nw, maxlen)
            if total == 0:
                continue
            sent_off = idx.sent_subword_bounds[n] - win.doc_offset + 1
            word_off = idx.sent_word_bounds[n]
            for gid in range(0, (total + dL - 1) // dL):
                rows.append(
                    (cid, tid, gid, " ".join(win.tokens),
                     None, None, None, None,
                     total, sent_off, nw, word_off)
                )
        return pd.DataFrame(rows, columns=PACKED_NER_COLS)

    return spanpack


def spanpack_ner(turns_tok: DataFrame, cfg: PipelineConfig) -> DataFrame:
    # explicit projection: applyInPandas ships every input column to Python,
    # and span-pack reads only the subword stream + per-word counts — the
    # text/role/ts/words columns would otherwise ride the conv_id shuffle
    pruned = turns_tok.select("conv_id", "turn_idx", "subwords", "sw_counts")
    return pruned.groupBy("conv_id").applyInPandas(
        make_spanpack_fn(cfg), schema=PACKED_NER_SCHEMA
    )


def segment_assign(turns_tok: DataFrame, budget: int, seg_turns: int) -> DataFrame:
    """Assign every turn to its center segment and replicate it into any
    neighboring segment whose context budget can reach it (bounded range
    join: O(1 + budget/segment_subwords) copies per turn). Shared by the
    segmented NER and RE packers."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        turns_tok.withColumn("n_sub", F.size("subwords"))
        .withColumn("n_word", F.size("words"))
        .withColumn("cum_end", F.sum("n_sub").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_sub"))
        .withColumn("word_off", F.sum("n_word").over(w) - F.col("n_word"))
        .withColumn("ord", F.row_number().over(w) - 1)
        .withColumn("seg", (F.col("ord") / F.lit(seg_turns)).cast("int"))
        .withColumn("conv_total", F.sum("n_sub").over(W.partitionBy("conv_id")))
    )
    bounds = t.groupBy("conv_id", "seg").agg(
        F.min("cum_start").alias("lo"), F.max("cum_end").alias("hi")
    )
    return t.alias("t").join(
        bounds.alias("b"),
        (F.col("t.conv_id") == F.col("b.conv_id"))
        & (F.col("t.cum_end") > F.col("b.lo") - budget)
        & (F.col("t.cum_start") < F.col("b.hi") + budget),
    ).select(
        "t.conv_id", F.col("b.seg").alias("seg_id"), "t.turn_idx",
        "t.words", "t.subwords", "t.sw_counts", "t.word_off",
        "t.cum_start", "t.cum_end", "t.conv_total",
        (F.col("t.seg") == F.col("b.seg")).alias("is_center"),
    )


def spanpack_ner_segmented(
    turns_tok: DataFrame, cfg: PipelineConfig, seg_turns: int = 64
) -> DataFrame:
    """Segmented span-pack: the unbounded-conversation scale path.

    A conversation is the natural grouping unit (context windows read
    neighboring turns), but a 10^6-turn conversation must not land in one
    task. Each conversation is split into segments of ``seg_turns`` center
    turns; every turn is *replicated* into any neighboring segment whose
    window budget can reach it (its subword range intersects the segment's
    range padded by ``budget`` subwords). The grouped map then packs only
    the segment's center turns against the segment-local index.

    Exactness: the reference's balanced context fill (run_acener.py:212-231)
    only reads ``min(available, …)`` of each side; with a margin ≥ budget
    subwords the min() outcome — hence the window content, the CLS-shifted
    span coords, and the conversation-level word indices — is identical to
    the unsegmented computation (tests/test_segmented.py asserts equality
    on a 400-turn conversation)."""
    budget = cfg.budget_ner()
    assigned = segment_assign(turns_tok, budget, seg_turns)

    def pack_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import n_spans_exhaustive

        pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
        cid = pdf["conv_id"].iloc[0]
        global_word_off = int(pdf["word_off"].iloc[0])
        local = pdf.rename(columns={})
        local_idx_input = local[["conv_id", "turn_idx", "words", "subwords",
                                 "sw_counts"]]
        _, idx = _conv_index_from_rows(local_idx_input)
        dL = cfg.max_pair_length_ner
        maxlen = cfg.max_mention_ori_length
        rows = []
        for n in range(len(pdf)):
            if not bool(pdf["is_center"].iloc[n]):
                continue
            tid = int(pdf["turn_idx"].iloc[n])
            win = context_window(
                idx, n, budget, truncate=False,
                left_total=int(pdf["cum_start"].iloc[n]),
                right_total=int(pdf["conv_total"].iloc[n] - pdf["cum_end"].iloc[n]),
            )
            nw = idx.sent_word_bounds[n + 1] - idx.sent_word_bounds[n]
            total = n_spans_exhaustive(nw, maxlen)
            if total == 0:
                continue
            sent_off = idx.sent_subword_bounds[n] - win.doc_offset + 1
            word_off = idx.sent_word_bounds[n] + global_word_off
            for gid in range(0, (total + dL - 1) // dL):
                rows.append(
                    (cid, tid, gid, " ".join(win.tokens),
                     None, None, None, None,
                     total, sent_off, nw, word_off)
                )
        return pd.DataFrame(rows, columns=PACKED_NER_COLS)

    return assigned.groupBy("conv_id", "seg_id").applyInPandas(
        pack_segment, schema=PACKED_NER_SCHEMA
    )

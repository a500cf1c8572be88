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
    enumerate_spans_np,
    pack_groups,
)

PACKED_NER_SCHEMA = (
    "conv_id string, turn_idx int, group_id int, window array<string>, "
    "win_s array<int>, win_e array<int>, word_s array<int>, word_e array<int>, "
    "example_l int"
)


def _conv_index_from_rows(pdf: pd.DataFrame) -> tuple[pd.DataFrame, ConvIndex]:
    """Rebuild the conversation-level alignment from per-turn rows."""
    pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
    words = [w for ws in pdf["words"] for w in ws]
    subwords = [s for sw in pdf["subwords"] for s in sw]
    if len(pdf):
        counts = np.concatenate(
            [np.asarray(c, dtype=np.int64) for c in pdf["sw_counts"]]
        )
    else:
        counts = np.zeros(0, dtype=np.int64)
    t2s = np.concatenate(([0], np.cumsum(counts)))
    s2t = np.repeat(np.arange(len(counts)), counts)
    wb = np.concatenate(
        ([0], np.cumsum([len(ws) for ws in pdf["words"]]))
    ).astype(np.int64)
    sb = t2s[wb]
    idx = ConvIndex(words, subwords, t2s, s2t, wb.tolist(), sb.tolist())
    return pdf, idx


def make_spanpack_fn(cfg: PipelineConfig):
    budget = cfg.budget_ner()

    def spanpack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, idx = _conv_index_from_rows(pdf)
        cid = pdf["conv_id"].iloc[0]
        t2s = np.asarray(idx.token2subword)
        dL = cfg.max_pair_length_ner
        rows = []
        for n in range(len(pdf)):
            tid = int(pdf["turn_idx"].iloc[n])
            win = context_window(idx, n, budget, truncate=False)
            if cfg.group_edge:
                # K2 needs the greedy run-aware chunker; keep tuple form
                from ..kernels import enumerate_spans

                spans = enumerate_spans(idx, n, win, cfg.max_mention_ori_length)
                if not spans:
                    continue
                for gid, group in enumerate(pack_groups(spans, cfg)):
                    rows.append(
                        (cid, tid, gid, win.tokens,
                         [s[0] for s in group], [s[1] for s in group],
                         [s[2] for s in group], [s[3] for s in group],
                         len(spans))
                    )
                continue
            win_s, win_e, word_s, word_e = enumerate_spans_np(
                t2s, idx.sent_word_bounds[n], idx.sent_word_bounds[n + 1],
                win.doc_offset, cfg.max_mention_ori_length,
            )
            total = len(win_s)
            if total == 0:
                continue
            for gid, i in enumerate(range(0, total, dL)):
                rows.append(
                    (cid, tid, gid, win.tokens,
                     win_s[i : i + dL].tolist(), win_e[i : i + dL].tolist(),
                     word_s[i : i + dL].tolist(), word_e[i : i + dL].tolist(),
                     total)
                )
        return pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "group_id", "window",
                     "win_s", "win_e", "word_s", "word_e", "example_l"],
        )

    return spanpack


def spanpack_ner(turns_tok: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return turns_tok.groupBy("conv_id").applyInPandas(
        make_spanpack_fn(cfg), schema=PACKED_NER_SCHEMA
    )

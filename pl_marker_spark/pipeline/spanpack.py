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

import pandas as pd
from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..kernels import ConvIndex, context_window, enumerate_spans, pack_groups

PACKED_NER_SCHEMA = (
    "conv_id string, turn_idx int, group_id int, window array<string>, "
    "win_s array<int>, win_e array<int>, word_s array<int>, word_e array<int>, "
    "example_l int"
)


def _conv_index_from_rows(pdf: pd.DataFrame) -> tuple[pd.DataFrame, ConvIndex]:
    """Rebuild the conversation-level alignment from per-turn rows."""
    pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
    words, subwords, s2t = [], [], []
    t2s = [0]
    wb, sb = [0], [0]
    wi = 0
    for ws_list, sw_list, cnts in zip(pdf["words"], pdf["subwords"], pdf["sw_counts"]):
        for c in cnts:
            t2s.append(t2s[-1] + int(c))
            s2t.extend([wi] * int(c))
            wi += 1
        words.extend(ws_list)
        subwords.extend(sw_list)
        wb.append(wb[-1] + len(ws_list))
        sb.append(sb[-1] + len(sw_list))
    idx = ConvIndex(list(words), list(subwords), t2s, s2t, wb, sb)
    return pdf, idx


def make_spanpack_fn(cfg: PipelineConfig):
    budget = cfg.budget_ner()

    def spanpack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, idx = _conv_index_from_rows(pdf)
        cid = pdf["conv_id"].iloc[0]
        rows = []
        for n in range(len(pdf)):
            tid = int(pdf["turn_idx"].iloc[n])
            win = context_window(idx, n, budget, truncate=False)
            spans = enumerate_spans(idx, n, win, cfg.max_mention_ori_length)
            if not spans:
                continue
            for gid, group in enumerate(pack_groups(spans, cfg)):
                rows.append(
                    (
                        cid, tid, gid, win.tokens,
                        [s[0] for s in group], [s[1] for s in group],
                        [s[2] for s in group], [s[3] for s in group],
                        len(spans),
                    )
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

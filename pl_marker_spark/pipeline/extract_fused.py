"""Single-pass extraction: mentions AND triples from ONE pass over the
conversation — the terminal fusion of the production profile.

``ner_decode="fused"`` removed the packed_ner table; ``re_decode="grouped"``
removed the scored-pair table; this stage removes the remaining hop: the
mentions a conversation produces are consumed by that same conversation's
RE decode *in-process*, so the extraction writes exactly one table (a
``kind``-discriminated union of mention and triple rows) and the corpus is
read exactly once. At 10^12 turns that is the difference between two full
passes over the token arrays and one.

Semantics are byte-identical to the staged chain by construction: the NER
half is ``ner.spanpack_decode_ner``'s kernel (conversation-level word scan
+ gazetteer pass + per-turn O3) and the RE half is
``repack.repack_decode_re``'s kernel (`_decode_turn`) fed the same sorted
per-turn mention lists the parquet roundtrip would deliver —
equality-tested against both staged paths in test_variants.

Eligibility mirrors the two component profiles (runner enforces):
surrogate head, unsegmented, no packing-reorder knobs, grouped RE decode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..config import PipelineConfig

EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, kind string, "
    "start int, end int, label string, score double, "
    "s1 int, e1 int, s2 int, e2 int, pred string, m1_ner string, m2_ner string"
)

MENTION_COLS = ["conv_id", "turn_idx", "start", "end", "label", "score"]
TRIPLE_COLS = ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred",
               "score", "m1_ner", "m2_ner"]


def extract_single_pass(turns_tok: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """turns_tok -> kind-discriminated union of mention ('m') and triple
    ('t') rows, one grouped map per conversation."""
    from ..world import NER_LABELS, REL_LABELS
    from .rel import _score_transform

    maxlen = cfg.max_mention_ori_length
    family = cfg.tokenizer_family
    overlap_any = cfg.overlap_any
    budget_re = cfg.budget_re()
    use_ner = cfg.use_ner_results
    transform = _score_transform(cfg)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..kernels import context_window
        from .ner import iter_fused_ner_conv
        from .repack import _decode_turn
        from .spanpack import _conv_index_from_rows

        def frame(ment_rows, trip_rows, cid=None):
            """Column-array emit (rel.py flat-emit discipline, round-3
            VERDICT item #9): the mention block then the triple block,
            each column built once — no per-row dict appends."""
            nm, nt = len(ment_rows), len(trip_rows)
            mt = list(zip(*ment_rows)) if nm else [[]] * 5
            tt = list(zip(*trip_rows)) if nt else [[]] * 9
            i32 = lambda m_vals, t_vals: pd.array(
                list(m_vals) + list(t_vals), dtype="Int32")
            nulls_m = [None] * nm
            nulls_t = [None] * nt
            return pd.DataFrame({
                "conv_id": pd.Series([cid] * (nm + nt), dtype="object"),
                "turn_idx": pd.Series(
                    np.fromiter(mt[0], dtype=np.int32, count=nm).tolist()
                    + list(tt[0]), dtype="int32"),
                "kind": pd.Series(["m"] * nm + ["t"] * nt, dtype="object"),
                "start": i32(mt[1], nulls_t),
                "end": i32(mt[2], nulls_t),
                "label": pd.Series(list(mt[3]) + nulls_t, dtype="object"),
                "score": pd.array(list(mt[4]) + list(tt[6]), dtype="Float64"),
                "s1": i32(nulls_m, tt[1]),
                "e1": i32(nulls_m, tt[2]),
                "s2": i32(nulls_m, tt[3]),
                "e2": i32(nulls_m, tt[4]),
                "pred": pd.Series(nulls_m + list(tt[5]), dtype="object"),
                "m1_ner": pd.Series(nulls_m + list(tt[7]), dtype="object"),
                "m2_ner": pd.Series(nulls_m + list(tt[8]), dtype="object"),
            })

        if pdf.empty:
            return frame([], [])
        pdf, idx = _conv_index_from_rows(pdf)
        cid = pdf["conv_id"].iloc[0]
        turn_ids = pdf["turn_idx"].to_numpy()

        # ---- NER half: the SHARED fused kernel (ner.iter_fused_ner_conv),
        # the same generator spanpack_decode_ner drains — the two routes
        # cannot diverge (round-3 ADVICE item #1) -----------------------
        ment_rows: list[tuple] = []          # (tid, si, ei, lab, prob)
        by_turn: dict[int, list[tuple[int, int, str]]] = {}
        for _n, tid, si, ei, li, prob in iter_fused_ner_conv(
                idx, turn_ids, family, maxlen, overlap_any):
            lab = NER_LABELS[li]
            ment_rows.append((tid, si, ei, lab, prob))
            by_turn.setdefault(tid, []).append((si, ei, lab))

        # ---- RE half (== repack.repack_decode_re) -----------------------
        trip_rows: list[tuple] = []  # (tid, s1, e1, s2, e2, pred, score, n1, n2)
        tid_to_ord = {int(t): n for n, t in enumerate(turn_ids)}
        for tid, ments in sorted(by_turn.items()):
            ments.sort()
            n = tid_to_ord[tid]
            win = context_window(idx, n, budget_re, truncate=True,
                                 materialize=False)
            trip_rows.extend(
                (tid, s1, e1, s2, e2, REL_LABELS[pred], float(score), n1, n2)
                for s1, e1, s2, e2, pred, score, n1, n2 in _decode_turn(
                    idx, n, win, ments, cfg, transform, False, use_ner))
        return frame(ment_rows, trip_rows, cid)

    pruned = turns_tok.select(
        "conv_id", "turn_idx", "words", "subwords", "sw_counts")
    return pruned.groupBy("conv_id").applyInPandas(run, schema=EXTRACT_SCHEMA)


def split_extract(ext: DataFrame):
    """union table -> (mentions, triples_raw) views; the ``kind`` predicate
    pushes down to the parquet scan."""
    from pyspark.sql import functions as F

    mentions = ext.filter(F.col("kind") == "m").select(*MENTION_COLS)
    triples_raw = ext.filter(F.col("kind") == "t").select(
        "conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred",
        "score", "m1_ner", "m2_ner")
    return mentions, triples_raw

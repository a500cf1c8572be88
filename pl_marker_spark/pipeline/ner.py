"""Stage 3 — NER inference + decode + suppression.

- I1/I6: the packed-head forward + softmax/argmax decode
  (reference modeling_bert.py:3213-3281, run_acener.py:661-692) as a
  shuffle-free ``mapInPandas`` over packed groups; the surrogate model reads
  the span surfaces out of each group's context window exactly where the
  reference head reads marker/endpoint hidden states.
- O1: NIL filtering happens at emit time (run_acener.py:691).
- O3: greedy non-overlap suppression per (conv_id, turn_idx) as a grouped
  map (run_acener.py:699-731) — inherently sequential but sentence-local;
  score-desc order with (start, end) tiebreak is order-equivalent to the
  reference's stable sort because surrogate scores are tie-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..kernels import assemble_ner_tensors
from ..surrogate import ner_fast_scores
from ..world import NER_LABELS

SPAN_SCORES_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, label string, score double"
)
MENTIONS_SCHEMA = SPAN_SCORES_SCHEMA


def make_infer_fn(cfg: PipelineConfig):
    tensor_head = cfg.model == "packed_linear"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_conv, out_turn = [], []
            out_s, out_e, out_lab, out_score = [], [], [], []
            for row in pdf.itertuples(index=False):
                window = row.window.split(" ")
                los, his = row.win_s, row.win_e
                if tensor_head:
                    # I1/I5/K5 end-to-end: the packed tensors (interleaved
                    # levitated markers, copied position ids, 2D mask) feed
                    # the registered head; one numpy batch per packed group.
                    from ..models import ner_head_logits
                    from ..surrogate import ner_decode

                    spans = list(zip((int(x) for x in los), (int(x) for x in his)))
                    ii, pi, att = assemble_ner_tensors(
                        window, spans, cfg.max_seq_length_ner,
                        cfg.max_pair_length_ner)
                    probs, preds = ner_decode(
                        ner_head_logits(ii, pi, att, spans,
                                        cfg.max_seq_length_ner,
                                        cfg.ner_feature))
                    kept = np.flatnonzero(preds != 0)  # O1 NIL filter at emit
                    probs, preds = probs[kept], preds[kept]
                else:
                    if cfg.assemble_tensors:
                        # K5 parity path: build the packed marker tensors the
                        # real encoder would consume (shape/positions/2D mask).
                        assemble_ner_tensors(window, list(zip(los, his)),
                                             cfg.max_seq_length_ner,
                                             cfg.max_pair_length_ner)
                    # fast exact scorer: one gazetteer scan per window instead
                    # of O(spans) surface joins (see surrogate.ner_fast_scores
                    # for the bit-identity argument)
                    kept, probs, preds = ner_fast_scores(
                        window, los, his, cfg.tokenizer_family)
                k = len(kept)
                if k == 0:
                    continue
                out_conv.extend([row.conv_id] * k)
                out_turn.extend([row.turn_idx] * k)
                ws = np.asarray(row.word_s)[kept]
                we = np.asarray(row.word_e)[kept]
                out_s.extend(ws.tolist())
                out_e.extend(we.tolist())
                out_lab.extend(NER_LABELS[p] for p in preds)
                out_score.extend(probs.tolist())
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(out_conv, dtype="object"),
                    "turn_idx": pd.Series(out_turn, dtype="int32"),
                    "start": pd.Series(out_s, dtype="int32"),
                    "end": pd.Series(out_e, dtype="int32"),
                    "label": pd.Series(out_lab, dtype="object"),
                    "score": pd.Series(out_score, dtype="float64"),
                }
            )

    return infer


def infer_ner(packed_ner: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """packed groups -> raw NIL-filtered span scores (pre-suppression)."""
    return packed_ner.mapInPandas(make_infer_fn(cfg), schema=SPAN_SCORES_SCHEMA)


def _overlap_mat(s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Pairwise span-overlap matrix (is_overlap, run_acener.py:708-713)."""
    return (s[:, None] <= e[None, :]) & (s[None, :] <= e[:, None])


def make_suppress_fn(cfg: PipelineConfig):
    overlap_any = cfg.overlap_any

    def suppress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score", "start", "end"], ascending=[False, True, True]
        ).reset_index(drop=True)
        s = pdf["start"].to_numpy()
        e = pdf["end"].to_numpy()
        lab = pdf["label"].to_numpy()
        ov = _overlap_mat(s, e)
        keep_idx: list[int] = []
        for i in range(len(pdf)):
            clash = False
            for j in keep_idx:
                if ov[i, j] and (overlap_any or lab[i] == lab[j]):
                    clash = True
                    break
            if not clash:
                keep_idx.append(i)
        return pdf.iloc[keep_idx]

    return suppress


def suppress_mentions(span_scores: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """O3 greedy suppression -> mentions table.

    Runs as a sorted-partition grouped map (grouped.sorted_grouped_map):
    one shuffle keyed by turn, one pandas call per Arrow batch — the
    per-(conv,turn) group count is huge and groups are tiny, so per-group
    applyInPandas overhead would dominate (measured 77s -> ~5s at sf0.1)."""
    from ..grouped import sorted_grouped_map

    return sorted_grouped_map(
        span_scores, ["conv_id", "turn_idx"], make_suppress_fn(cfg),
        MENTIONS_SCHEMA,
    )

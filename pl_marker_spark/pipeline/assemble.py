"""Stage 1 — assemble: normalize + tokenize each turn.

Reference semantics P1 (PTB unescape, run_acener.py:135-146,181-183) and
P3 (word→subword tokenization, run_acener.py:155-162,195). Runs as a single
``mapInPandas`` pass — no shuffle; tokenization is batched per Arrow chunk
with a per-batch memo over unique words (the 100 TB story: pure map stage,
scales linearly with input splits).

Output ``turns_tok`` carries ``(conv_id, turn_idx, role, text, tool, ts)``
through unchanged — the per-turn text-equality invariant every later stage
must preserve (BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..tokenizer import split_words, tokenize_word

TURNS_TOK_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, words array<string>, subwords array<string>, sw_counts array<int>"
)


def _make_tokenize_batch(family: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def pieces(w: str) -> list[str]:
            v = memo.get(w)
            if v is None:
                v = tokenize_word(w, family)
                memo[w] = v
            return v

        for pdf in batches:
            words_col = [split_words(t) for t in pdf["text"]]
            piece_col = [[pieces(w) for w in ws] for ws in words_col]
            out = pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()
            out["words"] = words_col
            out["subwords"] = [[p for pl in pls for p in pl] for pls in piece_col]
            out["sw_counts"] = [[len(pl) for pl in pls] for pls in piece_col]
            yield out

    return run


def assemble(transcripts: DataFrame, family: str = "bert") -> DataFrame:
    """transcripts -> turns_tok (adds words + per-word subword counts)."""
    return transcripts.mapInPandas(_make_tokenize_batch(family),
                                   schema=TURNS_TOK_SCHEMA)

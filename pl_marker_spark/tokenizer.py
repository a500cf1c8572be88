"""Deterministic subword tokenizer.

Stands in for the HF wordpiece tokenizer on the reference's BERT path
(/root/reference/run_acener.py:155-162; we replicate the BERT branch — the
Roberta prefix-space branch is model-zoo breadth the engine does not need,
see SURVEY.md §4 "non-standard semantics"). Words longer than PIECE chars
split into a head piece plus ``##``-prefixed continuations, which exercises
the token↔subword alignment machinery (P5) exactly like real wordpiece.

Pure functions only — shared by the Spark UDFs and the single-process
oracle so both sides see identical subword streams.
"""

from __future__ import annotations

from .world import PTB_UNESCAPE

PIECE = 4
CLS = "[CLS]"
SEP = "[SEP]"
# solid subject markers, reference run_re.py:298-299
SUB_L = "[unused0]"
SUB_R = "[unused1]"


def unescape(word: str) -> str:
    """PTB escape normalization (P1; reference run_acener.py:135-146)."""
    return PTB_UNESCAPE.get(word, word)


def split_words(text: str) -> list[str]:
    """Whitespace word split with PTB unescape. Word index == the
    reference's document-level token index (README.md:60-66)."""
    return [unescape(w) for w in text.split()]


def tokenize_word(word: str) -> list[str]:
    """word -> subword pieces (deterministic wordpiece stand-in, P3)."""
    if len(word) <= PIECE:
        return [word]
    return [word[:PIECE]] + ["##" + word[i : i + PIECE] for i in range(PIECE, len(word), PIECE)]


def tokenize_words(words: list[str]) -> tuple[list[str], list[int]]:
    """words -> (flat subwords, per-word piece counts)."""
    subwords: list[str] = []
    counts: list[int] = []
    for w in words:
        pieces = tokenize_word(w)
        subwords.extend(pieces)
        counts.append(len(pieces))
    return subwords, counts


def detokenize(subwords: list[str]) -> list[str]:
    """subword pieces -> words (inverse of tokenize_words; lossless because
    input words never start with '##')."""
    words: list[str] = []
    for p in subwords:
        if p.startswith("##") and words:
            words[-1] += p[2:]
        else:
            words.append(p)
    return words


def surface_of_span(subwords: list[str], lo: int, hi: int) -> str:
    """Word-level surface of an inclusive subword span [lo, hi] — what the
    surrogate model 'reads' from the context window."""
    return " ".join(detokenize(subwords[lo : hi + 1]))

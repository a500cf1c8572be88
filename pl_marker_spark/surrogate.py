"""Deterministic surrogate model.

Stands in for the packed-marker BERT heads so correctness and benchmarks
need no GPU/weights (SURVEY.md §7 design stance). Same interface contract
as the reference heads:

- NER head: span -> logits over NER_LABELS
  (reference BertForACEBothOneDropoutSub / modeling_bert.py:3213-3281:
  features from marker+text endpoints -> linear -> per-span logits).
- RE head: (subject, object) -> logits over ``REL_LOGIT_DIM`` =
  forward labels + inverse copies of the asymmetric block
  (reference modeling_bert.py:2223-2297 two-tower broadcast-add), plus an
  auxiliary object-NER label (run_re.py:756-769).

The surrogate is a pure function of the *span surfaces the model would
read from its context window*, so the Spark UDFs and the single-process
oracle provably compute identical scores. Deterministic jitter removes all
score ties, making the reference's stable `-score` sorts order-equivalent
to an explicit (score desc, span asc) sort (SURVEY.md §4 tiebreak note).
"""

from __future__ import annotations

import numpy as np

from .world import (
    GAZETTEER,
    NER_INDEX,
    NER_LABELS,
    NUM_NER,
    NUM_REL,
    NUM_SYM,
    REL_INDEX,
    REL_LOGIT_DIM,
    REL_TABLE,
    jitter,
)

_NIL_BASE = 2.0
_HIT = 5.0


def ner_logits_for_surfaces(surfaces: list[str]) -> np.ndarray:
    """(n_spans,) surfaces -> (n_spans, NUM_NER) logits."""
    out = np.zeros((len(surfaces), NUM_NER), dtype=np.float64)
    out[:, 0] = _NIL_BASE
    for i, s in enumerate(surfaces):
        label = GAZETTEER.get(s)
        if label is not None:
            out[i, NER_INDEX[label]] = _HIT + jitter("ner|" + s)
    return out


def ner_decode(logits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """softmax -> (max prob, argmax label index); reference I6
    (run_acener.py:681-683)."""
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    probs = e / e.sum(axis=1, keepdims=True)
    pred = probs.argmax(axis=1)
    return probs[np.arange(len(pred)), pred], pred


def ner_label_name(idx: int) -> str:
    return NER_LABELS[idx]


_PHRASE_BY_FIRST: dict[str, list[tuple[tuple[str, ...], str]]] = {}
for _surf, _label in GAZETTEER.items():
    _ws = tuple(_surf.split())
    _PHRASE_BY_FIRST.setdefault(_ws[0], []).append((_ws, _label))


def window_word_bounds(window: list[str], family: str = "bert"):
    """One scan of a window's subword tokens -> (words, first_sub, last_sub):
    the rebuilt word strings and each word's first/last window-token index
    (CLS counts as word 0). The shared primitive of the surrogate NER path
    and the slim packed_ner reconstruction (kernels.reconstruct_spans)."""
    from .tokenizer import G, _starts_word

    words: list[str] = []
    first_sub: list[int] = []
    last_sub: list[int] = []
    for i, p in enumerate(window):
        if _starts_word(p, family, not words):
            words.append(p[1:] if family == "roberta" and p.startswith(G) else p)
            first_sub.append(i)
            last_sub.append(i)
        else:
            words[-1] += p[2:] if p.startswith("##") else p
            last_sub[-1] = i
    return words, first_sub, last_sub


def conv_word_index(subwords: list[str], family: str = "bert"):
    """Conversation-level word rebuild over the raw subword stream (no
    CLS/SEP): (words, first_sub, last_sub np arrays in conversation subword
    coordinates). The window-free twin of window_word_bounds — any NER
    window's word segmentation is a contiguous slice of this one because
    window boundaries are sentence-aligned (word heads are recognized
    context-freely: '##' continuations / Ġ heads)."""
    from .tokenizer import G, _starts_word

    words: list[str] = []
    first_sub: list[int] = []
    last_sub: list[int] = []
    for i, p in enumerate(subwords):
        if _starts_word(p, family, not words):
            words.append(p[1:] if family == "roberta" and p.startswith(G) else p)
            first_sub.append(i)
            last_sub.append(i)
        else:
            words[-1] += p[2:] if p.startswith("##") else p
            last_sub[-1] = i
    return (words, np.asarray(first_sub, dtype=np.int64),
            np.asarray(last_sub, dtype=np.int64))


def conv_gazetteer_matches(words, first_sub, last_sub):
    """All gazetteer phrase occurrences over a conversation's words →
    {(first_subword, last_subword): surface} in conversation coordinates.

    Exactly the per-window match set for lookups of enumerated spans: a
    window match is a conversation match (window words are a contiguous
    subsequence), and a conversation match whose endpoints lie inside a
    window lies wholly inside it (contiguity) — so scanning once per
    conversation instead of once per overlapping window (~9× less work at
    the default budget) changes nothing the lookups can see."""
    matches: dict[tuple[int, int], str] = {}
    for i, w in enumerate(words):
        for ws_tuple, _label in _PHRASE_BY_FIRST.get(w, ()):
            k = len(ws_tuple)
            if i + k <= len(words) and tuple(words[i : i + k]) == ws_tuple:
                matches[(int(first_sub[i]), int(last_sub[i + k - 1]))] = (
                    " ".join(ws_tuple))
    return matches


def ner_fast_scores(window: list[str], win_s, win_e, family: str = "bert",
                    bounds=None):
    """Exact fast path for the surrogate NER head over one packed group.

    Instead of materializing every candidate span's surface (O(spans) string
    joins), scan the window once for ALL gazetteer phrase occurrences
    (including nested/overlapping ones) and look enumerated spans up by
    their subword coordinates. Bit-identical to scoring every span with
    ner_logits_for_surfaces + ner_decode and dropping NIL rows, because
    non-matching spans decode to NIL and are filtered (O1) anyway.

    ``family`` selects the word-rebuild convention (## continuations vs
    Ġ-prefixed heads) — must match the tokenizer that built the window.
    ``bounds`` optionally passes a precomputed window_word_bounds result so
    callers that already scanned the window don't scan twice.

    Returns (kept_positions, probs, label_indices) as numpy arrays."""
    words, first_sub, last_sub = (
        bounds if bounds is not None else window_word_bounds(window, family)
    )
    matches: dict[tuple[int, int], str] = {}
    for i, w in enumerate(words):
        for ws_tuple, _label in _PHRASE_BY_FIRST.get(w, ()):
            k = len(ws_tuple)
            if i + k <= len(words) and tuple(words[i : i + k]) == ws_tuple:
                matches[(first_sub[i], last_sub[i + k - 1])] = " ".join(ws_tuple)
    if not matches:
        empty = np.empty(0, dtype=np.int64)
        return empty, np.empty(0, dtype=np.float64), empty
    kept, surfaces = [], []
    for j, (lo, hi) in enumerate(zip(win_s, win_e)):
        s = matches.get((int(lo), int(hi)))
        if s is not None:
            kept.append(j)
            surfaces.append(s)
    if not kept:
        empty = np.empty(0, dtype=np.int64)
        return empty, np.empty(0, dtype=np.float64), empty
    probs, preds = ner_decode(ner_logits_for_surfaces(surfaces))
    return np.asarray(kept, dtype=np.int64), probs, preds


def re_logits_for_pair(sub_surface: str, obj_surface: str) -> list[float]:
    """One (subject, object) pair -> REL_LOGIT_DIM logits.

    Forward hit lights the forward label; a reverse table hit lights the
    symmetric label directly (symmetric relations hold both ways) or the
    inverse-block copy of the asymmetric label — exactly the label algebra
    the reference's bidirectional fusion (run_re.py:783-823) expects."""
    v = [0.0] * REL_LOGIT_DIM
    v[0] = _NIL_BASE
    fwd = REL_TABLE.get((sub_surface, obj_surface))
    if fwd is not None:
        v[REL_INDEX[fwd]] = _HIT + jitter(f"re|{sub_surface}|{obj_surface}|{fwd}")
    rev = REL_TABLE.get((obj_surface, sub_surface))
    if rev is not None:
        j = jitter(f"re|{obj_surface}|{sub_surface}|{rev}")
        idx = REL_INDEX[rev]
        if idx < NUM_SYM:
            v[idx] = _HIT + j
        else:
            v[NUM_REL + idx - NUM_SYM] = _HIT + j
    return v


def aux_obj_ner(obj_surface: str) -> str:
    """Aux object-NER head (reference joint head, run_re.py:759)."""
    return GAZETTEER.get(obj_surface, "NIL")


def permute_reverse_logits(v: list[float]) -> list[float]:
    """The fusion permutation: swap forward/inverse asymmetric blocks, keep
    the symmetric block (reference run_re.py:804)."""
    return list(v[:NUM_SYM]) + list(v[NUM_REL:]) + list(v[NUM_SYM:NUM_REL])

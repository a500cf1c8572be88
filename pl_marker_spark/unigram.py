"""Distributed unigram-LM tokenizer training (SentencePiece-style).

Companion to bpe.py: the OTHER published subword-vocabulary algorithm
(Kudo 2018, "Subword Regularization" — the model behind SentencePiece's
default trainer, used by T5/ALBERT/XLNet vocabularies). The reference
consumes pre-trained vocabularies (run_ner.py:556 loads an HF tokenizer);
a 100-TB corpus pipeline also needs to LEARN them.

This is the hard-EM (Viterbi) variant: the E-step assigns each word its
single best segmentation under the current piece probabilities instead of
forward-backward expected counts. The plumbing (seed → EM over the word
table → prune → encode) is SentencePiece's; swapping argmax for
forward–backward sums would change only the per-word kernel.

Scale shape
-----------
- ONE corpus-scale shuffle total: ``groupBy(word)`` collapses the corpus
  to the word-frequency table (the same collapse bpe.py performs — and
  the same place SentencePiece itself runs its EM: on word frequencies,
  never on raw text).
- seeding is a JVM flatten-of-transforms substring explode over the
  vocab-sized word table + one map-side-combined sum (generators can't
  nest in Spark, so the two substring loops build nested arrays that
  flatten into ONE explode).
- each EM round is an Arrow-batched ``mapInPandas`` Viterbi over the
  vocab-sized word table (bounded python — the corpus never enters a
  python worker) + one map-side-combined count aggregation. The piece
  table itself is vocabulary-bounded and driver-resident by necessity
  (it parameterizes the next round's closure), exactly like bpe.py's
  merge table.
- encoding a corpus is a dictionary join: distinct words → one Viterbi
  pass → broadcast the (word → pieces) dictionary back onto word
  positions. The corpus-scale side is scan + posexplode, ZERO python.

Determinism: segmentations are scored with exact Fractions
(prob = Π count_i/T), totally ordered by (probability desc, piece count
asc, piece tuple lexicographic asc). The order is DP-composable (prob
multiplicative, count additive, lex comparable at equal count), so the
distributed trainer and the independent pure-python reference agree
exactly — no float enters any comparison; the only floats emitted are
driver-computed 6dp logprobs.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UNI_MAX_PIECE = 4     # max seed piece length (chars)
UNI_SEED_MAX = 64     # seed vocabulary cap (top by count, piece tie-break)
UNI_EM_ROUNDS = 2     # hard-EM refinement rounds


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, wcount): the one corpus-scale shuffle."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def seed_piece_counts(words: DataFrame) -> DataFrame:
    """(piece, cnt): every substring of length 1..UNI_MAX_PIECE of every
    word, weighted by word frequency (all positions, overlapping — the
    standard frequent-substring seeding). Nested transforms + flatten
    keep it a single JVM explode over the vocab-sized table."""
    subs = F.flatten(
        F.expr(
            f"transform(sequence(1, length(word)), i -> "
            f"transform(sequence(i, least(i + {UNI_MAX_PIECE - 1}, "
            f"length(word))), j -> substring(word, i, j - i + 1)))"
        )
    )
    return (
        words.select("wcount", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("cnt"))
    )


def _select_seeds(rows: list[tuple[str, int]]) -> dict[str, int]:
    """Top UNI_SEED_MAX pieces by (count desc, piece asc), plus ALL single
    characters (coverage guarantee — every word stays segmentable)."""
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    seeds = dict(ranked[:UNI_SEED_MAX])
    for piece, cnt in rows:
        if len(piece) == 1:
            seeds.setdefault(piece, cnt)
    return seeds


def _better(a, b):
    """Total order on (prob, count, pieces): prob desc, count asc,
    pieces lex asc. Returns True when a beats b."""
    if a[0] != b[0]:
        return a[0] > b[0]
    if a[1] != b[1]:
        return a[1] < b[1]
    return a[2] < b[2]


def _viterbi_dp(word: str, probs: dict[str, Fraction]):
    """Iterative left-to-right DP (the Spark-side kernel): best[i] is the
    winning (prob, count, pieces) triple over word[:i]. Exact-Fraction
    scores; the order above is DP-composable, so the triple at len(word)
    is the global optimum."""
    best = [None] * (len(word) + 1)
    best[0] = (Fraction(1), 0, ())
    for i in range(1, len(word) + 1):
        for j in range(max(0, i - UNI_MAX_PIECE), i):
            piece = word[j:i]
            if best[j] is None or piece not in probs:
                continue
            cand = (best[j][0] * probs[piece], best[j][1] + 1,
                    best[j][2] + (piece,))
            if best[i] is None or _better(cand, best[i]):
                best[i] = cand
    return best[len(word)]


def _em_counts(
    words: DataFrame, probs: dict[str, Fraction]
) -> DataFrame:
    """E-step: Viterbi-segment every distinct word (Arrow-batched python
    over the VOCAB-sized table) and emit wcount-weighted piece counts.
    The probs dict travels by closure — it is vocabulary-bounded, the
    same driver-residency argument as bpe.py's merge table."""
    def seg(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: Counter = Counter()
            for word, wc in zip(pdf["word"], pdf["wcount"]):
                tri = _viterbi_dp(word, probs)
                if tri is None:
                    continue  # unreachable: single chars are always seeded
                for piece in tri[2]:
                    out[piece] += int(wc)
            yield pd.DataFrame(
                {"piece": list(out.keys()), "c": list(out.values())}
            )

    return (
        words.mapInPandas(seg, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("cnt"))
    )


def _reestimate(
    counts: dict[str, int], vocab: dict[str, int]
) -> dict[str, int]:
    """M-step bookkeeping: keep pieces the Viterbi used; single chars
    survive unconditionally with a +1 Laplace floor (coverage — the same
    role as SentencePiece's character-coverage guarantee)."""
    new = {}
    for piece in vocab:
        c = counts.get(piece, 0)
        if c > 0:
            new[piece] = c
        elif len(piece) == 1:
            new[piece] = 1
    return new


def _probs_of(counts: dict[str, int]) -> dict[str, Fraction]:
    t = sum(counts.values())
    return {p: Fraction(c, t) for p, c in counts.items()}


def unigram_train_pieces(
    docs: DataFrame,
    em_rounds: int = UNI_EM_ROUNDS,
    text_col: str = "text",
) -> list[tuple[int, str, int]]:
    """Learn the unigram piece table: [(rank, piece, cnt), ...] ordered by
    (cnt desc, piece asc). cnt is the final round's Viterbi count (the
    quantity whose normalization is the piece probability)."""
    words = word_freq_table(docs, text_col).localCheckpoint()
    seed_rows = [(r["piece"], int(r["cnt"]))
                 for r in seed_piece_counts(words).collect()]
    counts = _select_seeds(seed_rows)
    for _ in range(em_rounds):
        probs = _probs_of(counts)
        e = {r["piece"]: int(r["cnt"])
             for r in _em_counts(words, probs).collect()}
        counts = _reestimate(e, counts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, p, c) for i, (p, c) in enumerate(ranked)]


def unigram_train_df(
    spark: SparkSession,
    docs: DataFrame,
    em_rounds: int = UNI_EM_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """DataFrame wrapper: (rank, piece, cnt, logprob) rows; logprob is the
    driver-computed 6dp ln(cnt/T) (python math.log on both twin sides —
    bit-identical by construction)."""
    import math

    pieces = unigram_train_pieces(docs, em_rounds, text_col)
    t = sum(c for _, _, c in pieces)
    rows = [(r, p, c, round(math.log(c / t), 6)) for r, p, c in pieces]
    return spark.createDataFrame(
        rows, "rank int, piece string, cnt bigint, logprob double"
    )


def unigram_encode_df(
    docs: DataFrame,
    pieces: list[tuple[int, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a learned piece table -> (id, word_pos,
    tok_pos, piece) rows. Dictionary-join shape: distinct words get ONE
    Viterbi pass (vocab-sized python), then the (word → pieces) dictionary
    broadcast-joins back onto word positions — the corpus-scale side is
    scan + posexplode with zero python, the form that matters at 100 TB."""
    probs = _probs_of({p: c for _, p, c in pieces})

    def seg(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks = [list(_viterbi_dp(w, probs)[2]) for w in pdf["word"]]
            yield pd.DataFrame({"word": pdf["word"], "pieces": toks})

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    w = docs.select(id_col, F.posexplode(words).alias("word_pos", "word"))
    dic = (
        w.select("word").distinct()
        .mapInPandas(seg, "word string, pieces array<string>")
    )
    return (
        w.join(F.broadcast(dic), "word")
        .select(
            id_col,
            F.col("word_pos").cast("int").alias("word_pos"),
            F.posexplode("pieces").alias("tok_pos", "piece"),
        )
        .select(id_col, "word_pos",
                F.col("tok_pos").cast("int").alias("tok_pos"), "piece")
    )


# ---------------------------------------------------------------------------
# Independent pure-python reference (the oracle side of the driver twin):
# Counter seeding + MEMOIZED-RECURSION Viterbi — a different code shape
# from the iterative DP above, agreeing through the exact-Fraction order.
# ---------------------------------------------------------------------------


def _viterbi_ref(word: str, probs: dict[str, Fraction], memo, pos: int = 0):
    """Best (prob, count, pieces) of word[pos:] by recursion with memo —
    suffix-form DP (the iterative kernel is prefix-form). For the suffix
    decomposition the same total order composes: prob multiplies, count
    adds, and at equal (prob, count) the earlier-differing piece decides,
    so prepending a piece preserves the suffix comparison."""
    if pos == len(word):
        return (Fraction(1), 0, ())
    if pos in memo:
        return memo[pos]
    best = None
    for end in range(pos + 1, min(pos + UNI_MAX_PIECE, len(word)) + 1):
        piece = word[pos:end]
        if piece not in probs:
            continue
        rest = _viterbi_ref(word, probs, memo, end)
        if rest is None:
            continue
        cand = (probs[piece] * rest[0], rest[1] + 1, (piece,) + rest[2])
        if best is None or _better(cand, best):
            best = cand
    memo[pos] = best
    return best


def unigram_train_reference(
    texts: list[str], em_rounds: int = UNI_EM_ROUNDS
) -> list[tuple[int, str, int]]:
    wf: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            wf[w] += 1
    seeds: Counter = Counter()
    for w, c in wf.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + UNI_MAX_PIECE, len(w)) + 1):
                seeds[w[i:j]] += c
    counts = _select_seeds(list(seeds.items()))
    for _ in range(em_rounds):
        probs = _probs_of(counts)
        e: Counter = Counter()
        for w, c in wf.items():
            for piece in _viterbi_ref(w, probs, {})[2]:
                e[piece] += c
        counts = _reestimate(e, counts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, p, c) for i, (p, c) in enumerate(ranked)]


def unigram_encode_reference(
    texts: list[tuple[int, str]], pieces: list[tuple[int, str, int]]
) -> list[tuple[int, int, int, str]]:
    probs = _probs_of({p: c for _, p, c in pieces})
    rows: list[tuple[int, int, int, str]] = []
    for doc_id, t in texts:
        for wp, w in enumerate(t.lower().split()):
            for tp, piece in enumerate(_viterbi_ref(w, probs, {})[2]):
                rows.append((doc_id, wp, tp, piece))
    return rows

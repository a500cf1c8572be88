"""Distributed WordPiece tokenizer training + greedy encode.

The third published subword-vocabulary algorithm beside bpe.py
(Sennrich 2016) and unigram.py (Kudo 2018): WordPiece (Schuster &
Nakajima 2012; Wu et al. 2016 §4.1) is the vocabulary behind BERT — and
therefore the tokenizer the reference itself runs (run_ner.py:556 loads
a BertTokenizer, whose `tokenize` is exactly the greedy
longest-match-first scan implemented here). The engine's P3 kernel
(tokenizer.py:58) is a deterministic fixed-width stand-in for that
tokenizer's OUTPUT CONTRACT; this module supplies the real vocab-driven
algorithm, trained from the corpus.

Training is BPE with a different argmax: the winning pair maximizes the
likelihood gain score count(ab) / (count(a) * count(b)) instead of the
raw pair count (the HF `WordPieceTrainer` formulation). Symbols use the
BERT surface form — word-initial characters plain, continuations
prefixed "##" — so merging (a, b) fuses to a + b[2:] and the learned
symbols ARE the final vocabulary entries, no EOW sentinel.

Scale shape (same as bpe.py, by construction):
- ONE corpus-scale shuffle: ``groupBy(word)`` collapses the corpus to
  the word-frequency table; training runs over that vocab-sized table.
- per merge: one map-side-combined pair-count agg, one symbol-count agg
  (both vocab-sized), a top-1 fetched to the driver (the merge decision
  parameterizes the next round's expressions), and a JVM fold applying
  the merge — no Python in any per-row path.
- encode is the dictionary-join shape (unigram_encode_df's): distinct
  words get one greedy scan each in a bounded Arrow batch, the
  (word → pieces) dictionary broadcasts onto word positions, and the
  corpus-scale side is scan + posexplode with ZERO python.

Determinism: the score is a ratio of exact integer counts evaluated in
IEEE doubles — identical integers in, identical double out — compared
with (score desc, left asc, right asc); the distributed trainer and the
pure-python reference therefore agree exactly. (Exact rational compare
via cross-multiplication would need cnt·ca'·cb' products that overflow
BIGINT at petabyte token counts; the double ratio is the form that
survives, and the lexicographic tie-break absorbs equal doubles.)
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import _apply_merge, _pair_counts

WP_UNK = "[UNK]"          # emitted for words the vocabulary cannot cover
WP_MAX_WORD_CHARS = 100   # BERT's max_input_chars_per_word guard


def word_wp_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, wcount, syms) with BERT symbol surfaces: first
    character plain, every continuation character '##'-prefixed."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )
    chars = F.split(F.col("word"), "")
    syms = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
    )
    return words.select("word", "wcount", syms.alias("syms"))


def _symbol_counts(words: DataFrame) -> DataFrame:
    """(symbol, scount): corpus frequency of every live symbol — the
    denominator side of the WordPiece likelihood score. Vocab-sized."""
    return (
        words.select("wcount", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("wcount").alias("scount"))
    )


def _fuse(a: str, b: str) -> str:
    """BERT-form fusion: the continuation prefix of b disappears into a."""
    return a + (b[2:] if b.startswith("##") else b)


def wordpiece_train_merges(
    docs: DataFrame,
    num_merges: int = 12,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``num_merges`` WordPiece merges; returns
    [(rank, left, right, merged, pair_count), ...]. Each round joins the
    pair-count table with the symbol-count table twice (both vocab-sized;
    the symbol side is broadcastable at any corpus scale) and takes the
    top-1 by (pair_cnt/(cnt_a*cnt_b) desc, left, right)."""
    words = word_wp_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        syms = _symbol_counts(words)
        ca = syms.select(F.col("sym").alias("a"), F.col("scount").alias("ca"))
        cb = syms.select(F.col("sym").alias("b"), F.col("scount").alias("cb"))
        top = (
            _pair_counts(words)
            .join(F.broadcast(ca), "a")
            .join(F.broadcast(cb), "b")
            .select("a", "b", "cnt",
                    (F.col("cnt") / (F.col("ca") * F.col("cb")))
                    .alias("score"))
            .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merged = _fuse(a, b)
        merges.append((rank, a, b, merged, cnt))
        words = words.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b, merged))
        if rank % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def wordpiece_vocab(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> list[str]:
    """The encode-side artifact: every character symbol observed in the
    corpus (word-initial and '##' continuation forms) plus the merged
    symbols, sorted. One vocab-sized distinct over the symbol table."""
    base = (
        word_wp_symbol_table(docs, text_col)
        .select(F.explode("syms").alias("sym"))
        .distinct()
        .collect()
    )
    return sorted({r["sym"] for r in base} | {m[3] for m in merges})


def _greedy_pieces(word: str, vocab: set[str]) -> list[str]:
    """BERT WordPiece `tokenize`: longest-match-first left scan; any
    uncoverable word (or one longer than WP_MAX_WORD_CHARS) is [UNK]."""
    if len(word) > WP_MAX_WORD_CHARS:
        return [WP_UNK]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [WP_UNK]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_encode_df(
    docs: DataFrame,
    vocab: Iterable[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a learned vocabulary -> (id, word_pos,
    tok_pos, piece) rows. Dictionary-join shape: distinct words get one
    greedy scan each (vocab-sized python, Arrow-batched; the corpus never
    enters a python worker), then the (word → pieces) dictionary
    broadcast-joins back onto word positions — the corpus side is scan +
    posexplode, zero python."""
    vset = set(vocab)

    def seg(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks = [_greedy_pieces(w, vset) for w in pdf["word"]]
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
# Independent pure-python reference (the oracle side of the driver twins):
# Counter-over-symbol-tuples training + a separate greedy scan — different
# code shape, agreeing through the (IEEE score, left, right) total order.
# ---------------------------------------------------------------------------


def wordpiece_train_reference(
    texts: list[str], num_merges: int = 12
) -> list[tuple[int, str, str, str, int]]:
    vocab: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            syms = [w[0]] + ["##" + c for c in w[1:]]
            vocab[tuple(syms)] += 1
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, c in vocab.items():
            for s in syms:
                sc[s] += c
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(),
            key=lambda kv: (-(kv[1] / (sc[kv[0][0]] * sc[kv[0][1]])), kv[0]),
        )
        merged = _fuse(a, b)
        merges.append((rank, a, b, merged, cnt))
        nv: Counter = Counter()
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            nv[tuple(out)] += c
        vocab = nv
    return merges


def wordpiece_vocab_reference(
    texts: list[str], merges: list[tuple[int, str, str, str, int]]
) -> list[str]:
    base: set[str] = set()
    for t in texts:
        for w in t.lower().split():
            base.add(w[0])
            base.update("##" + c for c in w[1:])
    return sorted(base | {m[3] for m in merges})


def wordpiece_encode_reference(
    corpus: list[tuple[int, str]], vocab: Iterable[str]
) -> list[tuple[int, int, int, str]]:
    vset = set(vocab)
    rows: list[tuple[int, int, int, str]] = []
    for doc_id, t in corpus:
        for wp, w in enumerate(x for x in t.lower().split() if x):
            for tp, piece in enumerate(_greedy_pieces(w, vset)):
                rows.append((doc_id, wp, tp, piece))
    return rows

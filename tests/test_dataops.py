"""Unit tests for the round-4 training-data operators that the driver gate
can't fully exercise: the O8 guard/label branches on crafted gold (the
synthetic corpus never collides a reversed pair with a forward gold pair),
plus spot-invariants of the samplers and filters. The DuckDB twin equality
for all of these lives in test_queries_oracle.py."""

from pyspark.sql import functions as F

from pl_marker_spark.queries_catalog import inverse_gold_augment
from pl_marker_spark.synth import GOLD_RELATION_SCHEMA
from pl_marker_spark.world import NUM_REL, NUM_SYM, REL_LABELS


def test_o8_guard_and_label_branches(spark):
    """run_re.py:265-281 on crafted gold: an asymmetric pair whose reverse
    IS gold (guard drops both inverses), and a symmetric pair (inverse
    keeps the same id — the reference's `# bug` branch)."""
    art, phys = REL_LABELS.index("ART"), REL_LABELS.index("PHYS")
    soc = REL_LABELS.index("PER-SOC")
    g = spark.createDataFrame(
        [
            ("c0", 0, 1, 2, 3, 4, "ART"),
            ("c0", 0, 3, 4, 1, 2, "PHYS"),   # reverse of row 1 is gold
            ("c0", 1, 5, 6, 7, 8, "PER-SOC"),
        ],
        schema=GOLD_RELATION_SCHEMA,
    )
    rows = {
        (r.conv_id, r.turn_idx, r.s1, r.e1, r.s2, r.e2, r.lab_id, r.src)
        for r in inverse_gold_augment(g).collect()
    }
    assert rows == {
        ("c0", 0, 1, 2, 3, 4, art, "fwd"),
        ("c0", 0, 3, 4, 1, 2, phys, "fwd"),
        ("c0", 1, 5, 6, 7, 8, soc, "fwd"),
        # symmetric inverse keeps the same label id; the two asymmetric
        # inverses are suppressed by the pos2label guard
        ("c0", 1, 7, 8, 5, 6, soc, "inv"),
    }


def test_o8_asymmetric_inverse_offset(spark):
    """An asymmetric inverse with no forward collision gets
    lab_id + NUM_REL - NUM_SYM (run_re.py:281)."""
    org = REL_LABELS.index("ORG-AFF")
    g = spark.createDataFrame(
        [("c1", 2, 10, 11, 20, 21, "ORG-AFF")], schema=GOLD_RELATION_SCHEMA
    )
    out = {(r.s1, r.s2, r.lab_id, r.src)
           for r in inverse_gold_augment(g).collect()}
    assert out == {
        (10, 20, org, "fwd"),
        (20, 10, org + NUM_REL - NUM_SYM, "inv"),
    }


def test_stratified_sample_rates(spark):
    """The md5-threshold sampler hits its per-stratum target rates within
    binomial noise and is reproducible (no RNG state)."""
    from pl_marker_spark.queries_dataops import q_stratified_sample

    sf = "/root/testdata/sf0.001"
    out = q_stratified_sample(spark, sf)
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in q_stratified_sample(spark, sf).collect()}
    assert a == b and len(a) > 0
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    n_other = docs.count() - n_en
    k_en = sum(1 for r in a if r[1] == "en")
    k_other = len(a) - k_en
    # 3-sigma binomial bounds around 1/16 (en) and 1/4 (other)
    for k, n, p in ((k_en, n_en, 1 / 16), (k_other, n_other, 1 / 4)):
        sd = (n * p * (1 - p)) ** 0.5
        assert abs(k - n * p) <= 3 * sd + 1, (k, n, p)


def test_c4_line_dedup_first_occurrence_survives(spark):
    """Global counts: every duplicated line is removed everywhere except
    its (doc_id, line_idx)-first occurrence, so total removals equal
    total lines minus distinct lines."""
    from pl_marker_spark.queries_dataops import (
        _DEDUP_LINE_WORDS,
        q_c4_line_dedup,
    )

    sf = "/root/testdata/sf0.001"
    out = q_c4_line_dedup(spark, sf)
    tot = out.agg(F.sum("n_lines"), F.sum("n_removed")).collect()[0]
    lw = _DEDUP_LINE_WORDS
    lines = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.expr(
            f"transform(sequence(0, cast(ceil(size(split(text,' '))/{lw}.0) as int)-1),"
            f" i -> array_join(slice(split(text,' '), i*{lw}+1, {lw}), ' '))"
        )).alias("line"))
    )
    n_all, n_distinct = lines.count(), lines.distinct().count()
    assert tot[0] == n_all and tot[1] == n_all - n_distinct and tot[1] > 0


def test_doc_chunk_geometry_and_coverage(spark):
    """Chunk geometry invariants at sf0.001: every word of every document is
    covered by some chunk, interior chunks are exactly L words with the
    L-stride overlap against their successor, and the final chunk ends at
    the document boundary."""
    from pl_marker_spark.queries_dataops import (
        _CHUNK_LEN,
        _CHUNK_STRIDE,
        q_doc_chunk,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_doc_chunk(spark, sf).collect()
    nw = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(nw)
    multi = 0
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = nw[doc_id]
        covered = set()
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.start_word == i * _CHUNK_STRIDE
            assert 1 <= c.n_words <= _CHUNK_LEN
            if i < len(chunks) - 1:
                assert c.n_words == _CHUNK_LEN  # interior chunks are full
            covered.update(range(c.start_word, c.start_word + c.n_words))
        assert covered == set(range(n)), doc_id
        # last chunk reaches the end of the document
        last = chunks[-1]
        assert last.start_word + last.n_words == n
        multi += len(chunks) > 1
    assert multi > 0  # the corpus actually exercises the sliding window


def test_seq_pack_offsets_contiguous(spark):
    """Within each shard the packed layout is gapless: offsets are the
    running sum of the preceding documents' lengths (concat-and-split
    semantics), and the bin span matches the integer arithmetic."""
    from pl_marker_spark.queries_dataops import _PACK_BIN, q_seq_pack

    rows = q_seq_pack(spark, "/root/testdata/sf0.001").collect()
    shards: dict = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r)
    spanning = 0
    for shard, docs in shards.items():
        docs.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in docs:
            assert r.tok_offset == expect, (shard, r.doc_id)
            assert r.bin_first == r.tok_offset // _PACK_BIN
            assert r.bin_last == (r.tok_offset + r.dl - 1) // _PACK_BIN
            assert r.n_bins == r.bin_last - r.bin_first + 1
            expect += r.dl
            spanning += r.n_bins > 1
    assert spanning > 0  # some documents straddle a bin boundary


def test_lm_xent_terciles_ordered_and_balanced(spark):
    """Per language: bucket sizes differ by at most one (exact terciles by
    rank arithmetic) and the buckets are ordered by score — the head
    bucket's max cross-entropy never exceeds the tail bucket's min."""
    from pl_marker_spark.queries_dataops import q_lm_xent_bucket

    rows = q_lm_xent_bucket(spark, "/root/testdata/sf0.001").collect()
    langs: dict = {}
    for r in rows:
        langs.setdefault(r.lang, []).append(r)
    assert len(langs) == 5
    for lang, docs in langs.items():
        sizes = [sum(1 for d in docs if d.bucket == b) for b in (0, 1, 2)]
        assert sum(sizes) == len(docs)
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for b in (0, 1):
            hi = max(d.xent for d in docs if d.bucket == b)
            lo = min(d.xent for d in docs if d.bucket == b + 1)
            assert hi <= lo, (lang, b)


def test_mixture_weights_normalized_and_flattening(spark):
    """Rates sum to 1 (expected docs to the budget), and α=0.5 flattens the
    mixture: every source's rate/share ratio moves toward 1 relative to
    natural sampling — ratios decrease monotonically with source size."""
    from pl_marker_spark.queries_dataops import _MIX_BUDGET, q_mixture_weights

    rows = q_mixture_weights(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5  # language strata (en dominant, ~40%)
    assert abs(sum(r.rate for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.expected_docs for r in rows) - _MIX_BUDGET) < 0.1
    by_size = sorted(rows, key=lambda r: r.n_docs)
    ratios = [r.rate / r.share for r in by_size]
    assert all(a >= b - 1e-9 for a, b in zip(ratios, ratios[1:]))
    # small sources upweighted; the largest at/below natural share
    # (<= because the 6dp-rounded columns can make the ratio exactly 1.0)
    assert ratios[0] > 1.0 >= ratios[-1] - 1e-9


def test_vocab_build_and_oov_nondegenerate(spark):
    """The top-V cut is real on this corpus (31 distinct terms, V=16):
    exactly V contiguous ids ranked by count, and the OOV accounting has
    genuine mass — some tokens fall outside the vocabulary, but never all
    of a document's (the top-16 covers the corpus head)."""
    from pl_marker_spark.queries_dataops import (
        _VOCAB_V,
        q_oov_rate,
        q_vocab_build,
    )

    sf = "/root/testdata/sf0.001"
    vocab = q_vocab_build(spark, sf).collect()
    assert len(vocab) == _VOCAB_V
    assert sorted(r.term_id for r in vocab) == list(range(1, _VOCAB_V + 1))
    occ = [r.n_occ for r in sorted(vocab, key=lambda r: r.term_id)]
    assert occ == sorted(occ, reverse=True)  # ids follow frequency rank

    rates = q_oov_rate(spark, sf).collect()
    assert all(0 <= r.oov_rate < 1 for r in rates)
    assert any(r.n_oov > 0 for r in rates)   # real OOV mass
    assert any(r.n_oov == 0 for r in rates) or \
        sum(r.n_oov for r in rates) < 0.5 * sum(r.n_tokens for r in rates)


def test_epoch_shuffle_permutes_and_shards(spark):
    """Epoch-shuffle invariants: every epoch covers every document exactly
    once; shard positions are contiguous 1..n within each (epoch, worker);
    the two epochs give genuinely different orders (most documents change
    (worker, pos)); shards are roughly balanced (md5 is uniform)."""
    from pl_marker_spark.queries_dataops import (
        _SHUF_EPOCHS,
        _SHUF_WORKERS,
        q_epoch_shuffle,
    )

    rows = q_epoch_shuffle(spark, "/root/testdata/sf0.001").collect()
    by_epoch: dict = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == set(range(_SHUF_EPOCHS))
    docs0 = sorted(r.doc_id for r in by_epoch[0])
    for e, ers in by_epoch.items():
        assert sorted(r.doc_id for r in ers) == docs0  # full cover, no dups
        shards: dict = {}
        for r in ers:
            shards.setdefault(r.worker, []).append(r.pos_in_shard)
        assert set(shards) == set(range(_SHUF_WORKERS))
        for w, poss in shards.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), (e, w)
        sizes = [len(v) for v in shards.values()]
        assert max(sizes) < 2 * min(sizes), sizes  # md5 uniformity
    place = {e: {r.doc_id: (r.worker, r.pos_in_shard) for r in ers}
             for e, ers in by_epoch.items()}
    moved = sum(place[0][d] != place[1][d] for d in docs0)
    assert moved / len(docs0) > 0.8  # epochs really reshuffle


# ---------- BPE merge training (bpe.py) -------------------------------------


def _bpe_rows(df):
    return [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


def test_bpe_matches_reference_on_real_documents(spark):
    """The distributed trainer and the Counter-over-tuples reference learn
    the identical merge table from the real sf0.001 documents corpus."""
    import os

    import pandas as pd

    from pl_marker_spark.bpe import bpe_merges_reference, bpe_train_df

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _bpe_rows(bpe_train_df(spark, docs, num_merges=8))
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    want = bpe_merges_reference(texts["text"].tolist(), 8)
    assert got == want and len(got) == 8


def test_bpe_greedy_scan_tiebreak_and_early_stop(spark):
    """Hand-computed merges pin the fold semantics: (a) left-to-right
    non-overlapping replacement when left==right ('bbbb' -> bb bb, never
    re-chaining into the fused token), (b) the (count desc, pair asc)
    tie-break, (c) early stop when no adjacent pairs remain."""
    from pl_marker_spark.bpe import bpe_merges_reference, bpe_train_df

    run_docs = spark.createDataFrame(
        [(0, "bbbb bbbb bbbb")], "doc_id int, text string"
    )
    want_runs = [
        (1, "b", "b", 6),          # 2 non-overlapping (b,b) per word
        (2, "b", "b</w>", 3),      # ties (bb,b) at 3; 'b' < 'bb' wins
        (3, "bb", "bb</w>", 3),
    ]
    assert _bpe_rows(bpe_train_df(spark, run_docs, 5)) == want_runs
    assert bpe_merges_reference(["bbbb bbbb bbbb"], 5) == want_runs

    stop_docs = spark.createDataFrame(
        [(0, "aaa aaa"), (1, "aa")], "doc_id int, text string"
    )
    want_stop = [(1, "a", "a</w>", 3), (2, "a", "aa</w>", 2)]
    assert _bpe_rows(bpe_train_df(spark, stop_docs, 5)) == want_stop
    assert bpe_merges_reference(["aaa aaa", "aa"], 5) == want_stop


def test_bpe_encode_real_documents_roundtrip_and_reference(spark):
    """Spark train∘encode on the real sf0.001 documents equals the pure-
    python reference composition row-for-row, and every word round-trips:
    concatenating its tokens (EOW stripped) reconstructs the word."""
    import os

    from pl_marker_spark.bpe import (EOW, bpe_encode_df, bpe_encode_reference,
                                     bpe_merges_reference, bpe_train_merges)

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs = docs.select("doc_id", "text").localCheckpoint()
    merges = bpe_train_merges(docs, num_merges=8)
    got = [
        (r.doc_id, r.word_pos, r.tok_pos, r.token)
        for r in bpe_encode_df(docs, merges).collect()
    ]
    texts = [(r.doc_id, r.text) for r in docs.collect()]
    ref_merges = bpe_merges_reference([t for _, t in texts], 8)
    assert merges == ref_merges
    assert sorted(got) == sorted(bpe_encode_reference(texts, ref_merges))

    words = {}
    for doc_id, wp, tp, tok in got:
        words.setdefault((doc_id, wp), []).append((tp, tok))
    originals = {
        (doc_id, wp): w
        for doc_id, t in texts
        for wp, w in enumerate(t.lower().split())
    }
    assert set(words) == set(originals)
    for key, toks in words.items():
        joined = "".join(t for _, t in sorted(toks))
        assert joined == originals[key] + EOW


def test_weighted_sample_matches_python_aes(spark):
    """The selected sample equals a pure-python Efraimidis–Spirakis draw
    over the same corpus (same md5 uniforms, same ln(u)/w keys), and the
    draw is genuinely weight-biased: the winners' mean weight exceeds the
    corpus mean (heavier docs are likelier under A-ES)."""
    import hashlib
    import math

    from pl_marker_spark.queries_dataops import _WSAMPLE_K, q_weighted_sample

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text").collect()
    keys = {}
    weights = {}
    for r in docs:
        w = len(r.text.split(" "))
        h = int(hashlib.md5(f"ws:{r.doc_id}".encode()).hexdigest()[:15], 16)
        keys[r.doc_id] = math.log((h + 1) / 2.0 ** 60) / w
        weights[r.doc_id] = w
    expect = sorted(keys, key=lambda d: (-keys[d], d))[:_WSAMPLE_K]
    got = q_weighted_sample(spark, sf).collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: (-r.sample_key,
                                                         r.doc_id))] == expect
    for r in got:
        assert r.weight == weights[r.doc_id]
        assert abs(r.sample_key - round(keys[r.doc_id], 6)) < 1e-9
    # Bias property of the key formula, on planted weights (the real
    # corpus is near-uniform in length, so one 32-draw cannot separate):
    # docs with w=50 must crowd out w=1 docs under the same md5 uniforms.
    pk = {}
    for i in range(200):
        w = 50 if i % 2 else 1
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:15], 16)
        pk[i] = math.log((h + 1) / 2.0 ** 60) / w
    top = sorted(pk, key=lambda d: (-pk[d], d))[:32]
    assert sum(1 for d in top if d % 2) >= 28


# ---------- unigram-LM tokenizer training (unigram.py) ----------------------


def test_unigram_matches_reference_on_real_documents(spark):
    """The distributed hard-EM trainer and the memoized-recursion
    reference learn the identical piece table from the real sf0.001
    documents corpus — exact-Fraction scoring makes the agreement exact,
    never approximate."""
    import os

    import pandas as pd

    from pl_marker_spark.unigram import (
        unigram_train_pieces, unigram_train_reference)

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = unigram_train_pieces(docs)
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    want = unigram_train_reference(texts["text"].tolist())
    assert got == want and len(got) > 10


def test_unigram_viterbi_preference_and_roundtrip(spark):
    """Hand-computed segmentation pins the Viterbi order: on 'ab ab' the
    seeds a/b/ab all count 2 (prob 1/3 each), so segmenting 'ab' as the
    single piece (prob 1/3, count 1) beats ('a','b') (prob 1/9) — fewer
    pieces never decides here, probability does. Also: every single
    character survives training (coverage), and concatenating a word's
    pieces reproduces the word."""
    from pl_marker_spark.unigram import (
        unigram_encode_df, unigram_encode_reference,
        unigram_train_pieces, unigram_train_reference)

    docs = spark.createDataFrame([(0, "ab ab")], "doc_id int, text string")
    pieces = unigram_train_pieces(docs)
    assert pieces == unigram_train_reference(["ab ab"])
    by_piece = {p: c for _, p, c in pieces}
    assert set(by_piece) >= {"a", "b", "ab"}     # chars never pruned
    assert by_piece["ab"] == 2                   # viterbi picked 'ab' twice
    assert by_piece["a"] == 1 and by_piece["b"] == 1  # Laplace char floor

    enc = sorted(tuple(r) for r in
                 unigram_encode_df(docs, pieces).collect())
    assert enc == sorted(unigram_encode_reference([(0, "ab ab")], pieces))
    assert enc == [(0, 0, 0, "ab"), (0, 1, 0, "ab")]

    # roundtrip on a mixed corpus: pieces concatenate back to each word
    corpus = [(0, "tokenization needs subword units"),
              (1, "units need tokenization")]
    docs2 = spark.createDataFrame(corpus, "doc_id int, text string")
    p2 = unigram_train_pieces(docs2)
    rows = unigram_encode_reference(corpus, p2)
    from collections import defaultdict
    acc = defaultdict(list)
    for d, wp, tp, piece in rows:
        acc[(d, wp)].append((tp, piece))
    for (d, wp), v in acc.items():
        word = corpus[d][1].lower().split()[wp]
        assert "".join(p for _, p in sorted(v)) == word


def test_wordpiece_matches_reference_on_real_documents(spark):
    """The distributed likelihood-argmax trainer and the Counter-based
    reference learn the identical merge table from the real sf0.001
    documents corpus (the IEEE-score + lexicographic order is engine-
    independent)."""
    import os

    import pandas as pd

    from pl_marker_spark.wordpiece import (wordpiece_train_merges,
                                           wordpiece_train_reference)

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = wordpiece_train_merges(docs, num_merges=8)
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    want = wordpiece_train_reference(texts["text"].tolist(), 8)
    assert got == want and len(got) == 8


def test_wordpiece_likelihood_argmax_and_greedy_encode(spark):
    """Hand-computed corpus pins the WordPiece specifics: (a) the
    likelihood score prefers the RARE-symbol pair (##a,##b) over the
    higher-raw-count-competitive (a,##a) that plain BPE would tie on —
    2/(4*3) == 2/(3*4) broken lexicographically toward '##a'; (b) greedy
    longest-match-first encode uses the FINAL vocab, not merge order;
    (c) any uncoverable word becomes [UNK] whole."""
    from pl_marker_spark.wordpiece import (WP_UNK, _greedy_pieces,
                                           wordpiece_encode_df,
                                           wordpiece_train_merges,
                                           wordpiece_train_reference,
                                           wordpiece_vocab)

    docs = spark.createDataFrame(
        [(0, "aaab aaab ab")], "doc_id int, text string")
    merges = wordpiece_train_merges(docs, num_merges=1)
    assert merges == [(1, "##a", "##b", "##ab", 2)]
    assert wordpiece_train_reference(["aaab aaab ab"], 1) == merges

    vocab = wordpiece_vocab(docs, merges)
    assert vocab == ["##a", "##ab", "##b", "a"]
    # longest match first: 'aaab' -> a ##a ##ab (not a ##a ##a ##b)
    rows = sorted(
        tuple(r) for r in wordpiece_encode_df(docs, vocab).collect())
    assert rows == [(0, 0, 0, "a"), (0, 0, 1, "##a"), (0, 0, 2, "##ab"),
                    (0, 1, 0, "a"), (0, 1, 1, "##a"), (0, 1, 2, "##ab"),
                    (0, 2, 0, "a"), (0, 2, 1, "##b")]
    # uncoverable word -> [UNK]; over-long word -> [UNK]
    assert _greedy_pieces("axb", set(vocab)) == [WP_UNK]
    assert _greedy_pieces("a" * 101, set(vocab)) == [WP_UNK]


def test_wordpiece_encode_real_documents_roundtrip_and_reference(spark):
    """Spark train∘encode on real sf0.001 documents equals the reference
    composition row-for-row, and every non-UNK word round-trips (pieces
    concatenate, '##' stripped, to the word)."""
    import os

    import pandas as pd

    from pl_marker_spark.wordpiece import (WP_UNK, wordpiece_encode_df,
                                           wordpiece_encode_reference,
                                           wordpiece_train_merges,
                                           wordpiece_train_reference,
                                           wordpiece_vocab,
                                           wordpiece_vocab_reference)

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs = docs.select("doc_id", "text").localCheckpoint()
    merges = wordpiece_train_merges(docs, num_merges=8)
    vocab = wordpiece_vocab(docs, merges)
    got = sorted(tuple(r)
                 for r in wordpiece_encode_df(docs, vocab).collect())

    pdf = docs.toPandas()
    corpus = list(zip(pdf["doc_id"].tolist(), pdf["text"].tolist()))
    ref_merges = wordpiece_train_reference(pdf["text"].tolist(), 8)
    assert merges == ref_merges
    want = sorted(wordpiece_encode_reference(
        corpus, wordpiece_vocab_reference(pdf["text"].tolist(), ref_merges)))
    assert got == want

    # roundtrip: group pieces by (doc, word) and reassemble
    by_word: dict = {}
    for doc_id, wp, tp, piece in got:
        by_word.setdefault((doc_id, wp), []).append((tp, piece))
    texts = dict(corpus)
    n_checked = 0
    for (doc_id, wp), pieces in by_word.items():
        word = texts[doc_id].lower().split()[wp]
        ps = [p for _, p in sorted(pieces)]
        if ps == [WP_UNK]:
            continue
        assert "".join(p[2:] if p.startswith("##") else p
                       for p in ps) == word
        n_checked += 1
    assert n_checked > 0
